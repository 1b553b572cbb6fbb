package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Curation.weightedSample]] — A-ES semantics: deterministic,
  * partition-independent, weight-biased, exclusion of non-positive
  * weights, and the TakeOrderedAndProject plan shape (a global sort
  * exchange would be the wrong plan at scale).
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 400L)
    .map(i => (i, if (i <= 40L) 1000L else 1L))
    .toDF("id", "wt")

  test("deterministic and partition-independent") {
    val a = Curation.weightedSample(corpus, "id", "wt", 50)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = Curation.weightedSample(corpus.repartition(7, col("id")),
        "id", "wt", 50)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a === b)
    assert(a.size === 50)
  }

  test("inclusion is biased toward heavy weights") {
    // 40 docs at weight 1000 vs 360 at weight 1: a 50-draw A-ES sample
    // should include (nearly) every heavy doc; uniform sampling would
    // include ~5 of them
    val ids = Curation.weightedSample(corpus, "id", "wt", 50)
      .select("id").as[Long].collect().toSet
    val heavy = ids.count(_ <= 40L)
    assert(heavy >= 30, s"only $heavy of 40 heavy docs sampled")
  }

  test("k beyond the population returns every positive-weight row") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -2L), (4L, 7L))
      .toDF("id", "wt")
    val out = Curation.weightedSample(df, "id", "wt", 10)
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L, 4L))
  }

  test("a different seed tag draws a different sample") {
    val a = Curation.weightedSample(corpus, "id", "wt", 50)
      .select("id").as[Long].collect().toSet
    val b = Curation.weightedSample(corpus, "id", "wt", 50, "other")
      .select("id").as[Long].collect().toSet
    assert(a !== b)
  }

  test("rejects a non-positive k") {
    intercept[IllegalArgumentException] {
      Curation.weightedSample(corpus, "id", "wt", 0)
    }
  }

  test("per-group variant: exactly k per group, ranked, deterministic") {
    val grouped = (1L to 300L)
      .map(i => (i, s"src${i % 3}", 1L + i % 5))
      .toDF("id", "src", "wt")
    val out = Curation.weightedSamplePerGroup(grouped, "id", "wt",
      "src", 7)
    val rows = out.as[(String, Long, Long, Long, Int)].collect()
    assert(rows.length === 21)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._5).sorted === (1 to 7))
    }
    val again = Curation.weightedSamplePerGroup(
      grouped.repartition(5, col("id")), "id", "wt", "src", 7)
      .as[(String, Long, Long, Long, Int)].collect()
    assert(rows.sorted.toSeq === again.sorted.toSeq)
  }

  test("per-group variant plans as WindowGroupLimit") {
    val grouped = (1L to 300L)
      .map(i => (i, s"src${i % 3}", 1L + i % 5))
      .toDF("id", "src", "wt")
    val plan = Curation.weightedSamplePerGroup(grouped, "id", "wt",
      "src", 7).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit:\n$plan")
  }

  test("plans as a partial top-k, not a global sort exchange") {
    val plan = Curation.weightedSample(corpus, "id", "wt", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
  }
}
