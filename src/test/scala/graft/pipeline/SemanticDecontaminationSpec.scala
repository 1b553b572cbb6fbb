package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Curation.semanticContaminationPairs]] /
  * [[Curation.semanticDecontaminate]] — the embedding-space member of
  * the decontamination family (q176): exact flag semantics, the
  * multi-probe boundary-recall contract, null handling on both sides,
  * and the corpus-never-shuffles plan shape.
  */
class SemanticDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val centroids: Seq[Seq[Double]] = Seq(
    Seq(10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    Seq(0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private def corpusDf(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("id", "v")

  private def benchDf(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("bid", "bv")

  test("exact benchmark copy flags its corpus doc; opposite-direction item flags nothing") {
    val a = vec(9.0, 1.0, 0, 0, 0, 0, 0, 0)
    val corpus = corpusDf(Seq(1L -> a, 2L -> vec(1.0, 9.0, 0, 0, 0, 0, 0, 0)))
    // bench 100 = exact copy of doc 1; bench 200 points the opposite
    // way from doc 2 (cosine −1, shares doc 2's cluster)
    val bench = benchDf(Seq(100L -> a,
      200L -> vec(-1.0, -9.0, 0, 0, 0, 0, 0, 0)))
    val got = Curation.semanticContaminationPairs(corpus, "id", "v",
      bench, "bid", "bv", centroids, thresholdFp = 900000000000L)
      .as[(Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 100L)))
    // identical fixed-point unit vectors: sim within floor-rounding of 1e12
    assert(got.head._3 >= 999900000000L && got.head._3 <= 1000000000000L)
  }

  test("multi-probe recovers a contaminated pair that straddles a centroid boundary") {
    // corpus doc (6,5) assigns to c0 (d² 41 vs 61); its benchmark
    // near-copy (5,6) is NEAREST c1 (41 vs 61) — cosine 60/61 ≈ 0.984.
    // 1-NN bucketing misses the pair; the second probe reaches c0.
    val corpus = corpusDf(Seq(1L -> vec(6.0, 5.0, 0, 0, 0, 0, 0, 0)))
    val bench = benchDf(Seq(100L -> vec(5.0, 6.0, 0, 0, 0, 0, 0, 0)))
    def flags(nProbe: Int): Set[(Long, Long)] =
      Curation.semanticContaminationPairs(corpus, "id", "v", bench,
        "bid", "bv", centroids, thresholdFp = 900000000000L,
        nProbe = nProbe)
        .select("id", "bench_id").as[(Long, Long)].collect().toSet
    assert(flags(1) === Set.empty)
    assert(flags(2) === Set((1L, 100L)))
  }

  test("null vectors: corpus nulls are unauditable (never flagged), bench nulls flag nothing") {
    val a = vec(9.0, 1.0, 0, 0, 0, 0, 0, 0)
    val corpus = Seq(1L -> Option(a), 3L -> Option.empty[Seq[Float]])
      .toDF("id", "v")
    val bench = Seq(100L -> Option(a), 300L -> Option.empty[Seq[Float]])
      .toDF("bid", "bv")
    val got = Curation.semanticContaminationPairs(corpus, "id", "v",
      bench, "bid", "bv", centroids, thresholdFp = 900000000000L)
      .select("id", "bench_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 100L)))
  }

  test("semanticDecontaminate drops exactly the flagged docs, keeps schema") {
    val a = vec(9.0, 1.0, 0, 0, 0, 0, 0, 0)
    val corpus = corpusDf(Seq(1L -> a,
      2L -> vec(1.0, 9.0, 0, 0, 0, 0, 0, 0)))
    val bench = benchDf(Seq(100L -> a))
    val out = Curation.semanticDecontaminate(corpus, "id", "v", bench,
      "bid", "bv", centroids, thresholdFp = 900000000000L)
    assert(out.columns.toSeq === corpus.columns.toSeq)
    assert(out.select("id").as[Long].collect().toSet === Set(2L))
  }

  test("semanticDecontaminateManaged: release drops the flagged cache, same verdicts") {
    // distinct fixture ids from the plain-overload test above: the
    // CacheManager dedupes persists by logical plan, so an identical
    // plan would reuse (and hide) that test's still-cached flagged set
    val a = vec(8.0, 2.0, 0, 0, 0, 0, 0, 0)
    val corpus = corpusDf(Seq(11L -> a,
      12L -> vec(2.0, 8.0, 0, 0, 0, 0, 0, 0)))
    val bench = benchDf(Seq(1100L -> a))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = Curation.semanticDecontaminateManaged(corpus,
      "id", "v", bench, "bid", "bv", centroids,
      thresholdFp = 900000000000L)
    val ids = out.select("id").as[Long].collect().toSet
    assert(ids === Set(12L))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "the flagged-id cache should be live before release")
    release()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "release() must unpersist the flagged-id cache")
  }

  test("nProbe outside [1, |centroids|] fails loudly") {
    val corpus = corpusDf(Seq(1L -> vec(9, 1, 0, 0, 0, 0, 0, 0)))
    val bench = benchDf(Seq(100L -> vec(9, 1, 0, 0, 0, 0, 0, 0)))
    intercept[IllegalArgumentException] {
      Curation.semanticContaminationPairs(corpus, "id", "v", bench,
        "bid", "bv", centroids, thresholdFp = 1L, nProbe = 0)
    }
    intercept[IllegalArgumentException] {
      Curation.semanticContaminationPairs(corpus, "id", "v", bench,
        "bid", "bv", centroids, thresholdFp = 1L, nProbe = 3)
    }
  }

  test("streaming: the stateless audit over a multi-batch stream equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val a = vec(9.0, 1.0, 0, 0, 0, 0, 0, 0)
    val b = vec(1.0, 9.0, 0, 0, 0, 0, 0, 0)
    val bench = benchDf(Seq(100L -> a, 200L -> b))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Curation.semanticContaminationPairs(
      mem.toDF().toDF("id", "v"), "id", "v", bench, "bid", "bv",
      centroids, thresholdFp = 900000000000L)
      .writeStream.format("memory").queryName("semdecon_stream")
      .outputMode("append").start()
    try {
      mem.addData(1L -> a, 2L -> b)
      q.processAllAvailable()
      mem.addData(3L -> a)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("semdecon_stream")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Curation.semanticContaminationPairs(
      corpusDf(Seq(1L -> a, 2L -> b, 3L -> a)), "id", "v", bench,
      "bid", "bv", centroids, thresholdFp = 900000000000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === batch)
    assert(got.map(p => (p._1, p._2)) ===
      Set((1L, 100L), (2L, 200L), (3L, 100L)))
  }

  test("plan shape: the corpus is never shuffled — one broadcast join, zero exchanges") {
    val corpus = corpusDf((0L until 200L).map(i =>
      i -> vec(9.0, 0.001 * i, 0, 0, 0, 0, 0, 0)))
    val bench = benchDf(Seq(100L -> vec(9.0, 0.05, 0, 0, 0, 0, 0, 0)))
    val pairs = Curation.semanticContaminationPairs(corpus, "id", "v",
      bench, "bid", "bv", centroids, thresholdFp = 990000000000L)
    pairs.collect() // execute so AQE finalizes the plan
    val shuffles = pairs.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty,
      s"expected a shuffle-free audit, found ${shuffles.size} exchanges")
    val txt = pairs.queryExecution.executedPlan.toString
    assert(!txt.contains("Exchange hashpartitioning"),
      s"corpus-side shuffle in plan:\n$txt")
  }
}
