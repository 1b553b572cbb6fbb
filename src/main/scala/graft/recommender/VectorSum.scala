package graft.recommender

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.reflect.runtime.universe.TypeTag

/** Elementwise vector-sum UDAF (SURVEY §4.3): the one aggregation the
  * engine needs that `org.apache.spark.sql.functions` lacks. Used for
  * gradient accumulation Σᵢ eᵤᵢ·Qᵢ per user id (reference
  * `models/funk_svd.py:166-167` `error @ i_factors` — a matmul whose
  * relational form is join + groupBy + vector-sum).
  *
  * A typed `Aggregator` registered via `functions.udaf` participates in
  * hash aggregation with map-side partial combine, so the shuffle moves
  * one k-vector per (partition, id) — not one per rating.
  */
class VectorSum extends Aggregator[Array[Double], Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], a: Array[Double]): Array[Double] =
    if (a == null) buf
    else if (buf.isEmpty) a.clone()
    else {
      var i = 0
      while (i < buf.length) { buf(i) += a(i); i += 1 }
      buf
    }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    reduce(a, b)

  override def finish(r: Array[Double]): Array[Double] = r

  private def enc[T: TypeTag]: Encoder[T] = ExpressionEncoder[T]()
  override def bufferEncoder: Encoder[Array[Double]] = enc[Array[Double]]
  override def outputEncoder: Encoder[Array[Double]] = enc[Array[Double]]
}

object VectorSum {
  private lazy val fn = udaf(new VectorSum, ExpressionEncoder[Array[Double]]())

  /** `vec_sum(arrayCol)` — elementwise sum of double arrays. */
  def vecSum(c: Column): Column = fn(c)
}
