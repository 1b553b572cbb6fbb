package graft.similarity

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(n: Int, d: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Array.fill(d)((rnd.nextGaussian() / math.sqrt(d)).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("signMatrix is ±1, deterministic, and roughly balanced") {
    val m = Projection.signMatrix(spark, 64, 16)
    val m2 = Projection.signMatrix(spark, 64, 16)
    assert(m.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    val flat = m.flatten
    assert(flat.forall(s => s == 1L || s == -1L))
    val plus = flat.count(_ == 1L).toDouble / flat.length
    assert(plus > 0.4 && plus < 0.6, s"sign balance $plus off")
    // a different tag gives a different matrix
    val other = Projection.signMatrix(spark, 64, 16, seedTag = "rp2")
    assert(other.map(_.toSeq).toSeq !== m.map(_.toSeq).toSeq)
  }

  test("JL property: projected cosine tracks original cosine (dOut=32)") {
    val d = 64
    val vecs = randomVecs(40, d, seed = 7L)
    val proj = Projection.project(vecs, "vec_id", "embedding", d, 32)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getLong(2).toDouble) }
    val orig = vecs.as[(Long, Seq[Float])].collect().toMap
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val ids = orig.keys.toSeq.sorted
    val errs = for {
      i <- ids; jj <- ids if jj > i
    } yield math.abs(cos(orig(i), orig(jj)) - cos(proj(i), proj(jj)))
    val meanErr = errs.sum / errs.length
    assert(meanErr < 0.15, s"mean cosine distortion $meanErr too high")
    // max over ~780 pairs at std ≈ 1/√32 lands near 3σ ≈ 0.55; bound the tail
    assert(errs.max < 0.7, s"max cosine distortion ${errs.max} too high")
  }

  test("project is map-only: zero shuffle exchanges in the plan") {
    val vecs = randomVecs(10, 64, seed = 3L)
    val plan = Projection.project(vecs, "vec_id", "embedding", 64, 16)
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.isEmpty, s"unexpected shuffles: $exchanges")
  }

  test("project: shorter vectors fold their present elements; nulls drop") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f)),          // shorter than dIn
      (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val got = Projection.project(df, "vec_id", "embedding", 4, 2)
      .as[(Long, Int, Long)].collect()
    assert(got.map(_._1).distinct.toSeq === Seq(1L))
    val m = Projection.signMatrix(spark, 4, 2)
    val expect = (0 until 2).map(k =>
      m(0)(k) * 1000000L + m(1)(k) * math.floor(-2.0 * 1e6).toLong)
    assert(got.sortBy(_._2).map(_._3).toSeq === expect)
  }
}
