package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[WinnowIndex]] lifecycle: fresh-build probe equivalence with the
  * one-shot operator, refresh visibility under the frozen frequency
  * model, parameter freezing via the meta table, and clean drop.
  */
class WinnowIndexSpec extends SparkSpec {
  import spark.implicits._

  private val embedded =
    "the quick brown fox jumps over the lazy dog tonight"

  private def corpus = Seq(
    (1L, s"alpha beta gamma delta $embedded epsilon zeta eta theta"),
    (2L, "completely unrelated words appear in this document here " +
      "nothing shared at all with anything")).toDF("doc_id", "text")

  private def freshName(): String =
    "graft_widx_spec_" +
      java.util.UUID.randomUUID().toString.replace("-", "")

  test("fresh build + probe == the one-shot winnowMatches") {
    val bench = Seq((900L, embedded)).toDF("bench_id", "text")
    val name = freshName()
    try {
      WinnowIndex.build(bench, "bench_id", "text", name, k = 5, w = 4)
      val probed = WinnowIndex.probe(spark, name, corpus,
          "doc_id", "text", minSharedFps = 2, maxBenchFpFreq = 64L)
        .collect().toSet
      val oneShot = Dedup.winnowMatches(corpus, "doc_id", "text",
          bench, "bench_id", "text", k = 5, w = 4,
          minSharedFps = 2, maxBenchFpFreq = 64L)
        .collect().toSet
      assert(probed === oneShot && probed.nonEmpty)
    } finally WinnowIndex.drop(spark, name)
  }

  test("refresh folds new benchmark items in; freq model stays frozen") {
    val bench0 = Seq(
      (900L, "some other benchmark sentence entirely here today."))
      .toDF("bench_id", "text")
    val name = freshName()
    try {
      WinnowIndex.build(bench0, "bench_id", "text", name, k = 5, w = 4)
      // before refresh: doc 1 matches nothing
      assert(WinnowIndex.probe(spark, name, corpus, "doc_id", "text",
        minSharedFps = 2).collect().isEmpty)
      // refresh with the embedded sentence — its fps have NO freq row
      // (frozen model), so they count as rare and the match surfaces
      WinnowIndex.refresh(
        Seq((901L, embedded)).toDF("bench_id", "text"),
        "bench_id", "text", name)
      val after = WinnowIndex.probe(spark, name, corpus,
        "doc_id", "text", minSharedFps = 2).collect()
      assert(after.length === 1)
      assert(after(0).getAs[Long]("doc_id") === 1L &&
        after(0).getAs[Long]("bench_id") === 901L)
    } finally WinnowIndex.drop(spark, name)
  }

  test("probe derives corpus fps under the FROZEN (k, w) from meta") {
    val bench = Seq((900L, embedded)).toDF("bench_id", "text")
    val name = freshName()
    try {
      WinnowIndex.build(bench, "bench_id", "text", name, k = 7, w = 3)
      val m = spark.table(name + "_meta").head()
      assert(m.getInt(0) === 7 && m.getInt(1) === 3 && m.getLong(2) === 1L)
      // the probe must agree with a one-shot run at the BUILD geometry
      val probed = WinnowIndex.probe(spark, name, corpus,
        "doc_id", "text", minSharedFps = 2).collect().toSet
      val oneShot = Dedup.winnowMatches(corpus, "doc_id", "text",
        bench, "bench_id", "text", k = 7, w = 3,
        minSharedFps = 2).collect().toSet
      assert(probed === oneShot)
    } finally WinnowIndex.drop(spark, name)
  }

  test("fractional cap probes against frozen doc frequencies") {
    // both bench docs carry the sentence → doc-freq 2/2 under the
    // frozen freq table → frac 0.5 suppresses everything
    val bench = Seq((900L, embedded), (901L, embedded))
      .toDF("bench_id", "text")
    val name = freshName()
    try {
      WinnowIndex.build(bench, "bench_id", "text", name, k = 5, w = 4)
      assert(WinnowIndex.probe(spark, name, corpus, "doc_id", "text",
        minSharedFps = 2, maxBenchFpDocFrac = Some(0.5))
        .collect().isEmpty)
      assert(WinnowIndex.probe(spark, name, corpus, "doc_id", "text",
        minSharedFps = 2, maxBenchFpDocFrac = Some(1.0))
        .collect().nonEmpty)
    } finally WinnowIndex.drop(spark, name)
  }
}
