package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE/data-quality surface a lake pipeline
  * runs on every ingested partition: per-column row/null/distinct
  * counts and numeric ranges, computed for ALL columns in ONE
  * aggregation pass (one scan, one reduce — never a job per column).
  * The per-column results unpivot to rows driver-side from a single
  * collected aggregate row, so output size is |columns|, independent
  * of data size — safe at any scale.
  */
object Profiling {

  /** One row per profiled numeric column: (column, n, n_null,
    * n_distinct, min_v, max_v, mean_v). Exact counts — at 100 TB the
    * exact distinct is the expensive stat (one partial+final agg per
    * column inside the same pass); swap to approx_count_distinct when
    * 2% error is acceptable — kept exact here so the result is
    * oracle-checkable. The mean accumulates in FIXED POINT
    * (micro-units, floor before summing) so it is shuffle-order- and
    * engine-independent — a double `avg` of 2-decimal values is
    * neither (house float-aggregation rule).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"),
        sum(floor(col(c).cast("double") * 1e6).cast("long")).as(s"${c}__s"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val b = i * 6
      val n = row.getLong(b)
      (c, n, row.getLong(b + 1), row.getLong(b + 2),
        row.getDouble(b + 3), row.getDouble(b + 4),
        if (n == 0) 0.0 else row.getLong(b + 5).toDouble / n / 1e6)
    }.toDF("column", "n", "n_null", "n_distinct", "min_v", "max_v", "mean_v")
  }
}
