package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExamplesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 60L)
    .map(i => (i, s"alpha beta gamma delta epsilon zeta token$i theta iota kappa"))
    .toDF("doc_id", "text")

  test("mlmMask: decisions are pure functions of (doc_id, pos) — " +
    "partitioning-independent and stable across runs") {
    val a = Examples.mlmMask(corpus, "doc_id", "text")
      .as[(Long, Long, String, String, String)].collect().sorted.toSeq
    val b = Examples.mlmMask(corpus.repartition(7, col("doc_id")),
        "doc_id", "text")
      .as[(Long, Long, String, String, String)].collect().sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("mlmMask: action semantics and the 15% / 80-10-10 shape") {
    val toks = corpus.select(posexplode(split(col("text"), " "))).count()
    val rows = Examples.mlmMask(corpus, "doc_id", "text")
      .as[(Long, Long, String, String, String)].collect()
    val vocab = corpus.select(explode(split(col("text"), " "))).distinct()
      .as[String].collect().toSet
    rows.foreach { case (_, _, orig, input, action) =>
      action match {
        case "mask"   => assert(input === "[MASK]")
        case "keep"   => assert(input === orig)
        case "random" => assert(vocab.contains(input))
        case other    => fail(s"unknown action $other")
      }
      assert(vocab.contains(orig))
    }
    // 600 tokens at 15% → ~90 selected; loose 3σ-ish band
    val rate = rows.length.toDouble / toks
    assert(rate > 0.10 && rate < 0.21, s"selection rate $rate out of band")
    val masked = rows.count(_._5 == "mask").toDouble / rows.length
    assert(masked > 0.65 && masked < 0.92, s"mask share $masked out of band")
  }

  test("mlmMask: maskRateFp=0 selects nothing; bad rate rejected") {
    assert(Examples.mlmMask(corpus, "doc_id", "text", maskRateFp = 0L)
      .count() === 0L)
    intercept[IllegalArgumentException] {
      Examples.mlmMask(corpus, "doc_id", "text", maskRateFp = 2000000L)
    }
  }

  test("mlmMask: null and empty texts contribute no positions") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "   "),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val ids = Examples.mlmMask(df, "doc_id", "text")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(!ids.contains(1L) && !ids.contains(2L))
  }
}
