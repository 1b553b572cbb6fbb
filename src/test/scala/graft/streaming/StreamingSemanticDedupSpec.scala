package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Curation

/** [[StreamingSemanticDedup]] — continuous SemDeDup vs the batch
  * operator: id-ordered cross-batch equivalence (including the
  * dropped-doc-still-owns chain that forces the full fingerprint
  * index), replay idempotence under the batch_id guard, and the
  * null-vector / reserved-cluster contract.
  */
class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** One centroid at the origin: everything lands in cluster 0, so
    * the tests exercise the cosine policy, not the assignment.
    */
  private val oneCentroid: Seq[Seq[Double]] =
    Seq(Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  /** Unit vector at `deg` degrees in the (0,1) plane. */
  private def ang(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    vec(math.cos(r), math.sin(r), 0, 0, 0, 0, 0, 0)
  }

  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("id", "v")

  private def freshTable(): String =
    s"ssd_spec_${java.util.UUID.randomUUID().toString.replace("-", "")}"

  private def drop(tbl: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $tbl")

  // cos(30°)=.866 ≥ .85, cos(60°)=.5 < .85: A~B, B~C, A!~C — the
  // non-transitive chain. Batch policy drops B (via A) and C (via B,
  // even though B itself was dropped); a survivor-only index would
  // wrongly keep C.
  private val tFp = 850000000000L
  private val chain = Seq(1L -> ang(0), 2L -> ang(30), 3L -> ang(60))

  test("ordered two-batch fold equals the batch operator — dropped docs still own") {
    val tbl = freshTable()
    try {
      val v0 = StreamingSemanticDedup.foldBatch(spark,
        df(chain.take(2)), "id", "v", oneCentroid, tFp, tbl, 4, 0L)
        .as[(Long, Long, Option[Long])].collect().toSet
      val v1 = StreamingSemanticDedup.foldBatch(spark,
        df(chain.drop(2)), "id", "v", oneCentroid, tFp, tbl, 4, 1L)
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(v0 === Set((1L, 0L, None), (2L, 0L, Some(1L))))
      // C matches the DROPPED doc B — the full-index design under test
      assert(v1 === Set((3L, 0L, Some(2L))))
      val streamSurvivors = (v0 ++ v1).filter(_._3.isEmpty).map(_._1)
      val batchSurvivors = Curation.semanticDedupFixed(df(chain), "id",
        "v", oneCentroid, tFp, dim = dim)
        .select("id").as[Long].collect().toSet
      assert(streamSurvivors === batchSurvivors)
    } finally drop(tbl)
  }

  test("replay of a batch reproduces its verdicts and appends nothing") {
    val tbl = freshTable()
    try {
      StreamingSemanticDedup.foldBatch(spark, df(chain.take(2)), "id",
        "v", oneCentroid, tFp, tbl, 4, 0L).collect()
      val first = StreamingSemanticDedup.foldBatch(spark,
        df(chain.drop(2)), "id", "v", oneCentroid, tFp, tbl, 4, 1L)
        .as[(Long, Long, Option[Long])].collect().toSet
      val before = spark.table(tbl).count()
      // the failure-replay shape: same rows, same batchId, index
      // already holds the batch's own rows
      val replay = StreamingSemanticDedup.foldBatch(spark,
        df(chain.drop(2)), "id", "v", oneCentroid, tFp, tbl, 4, 1L)
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(replay === first)
      assert(spark.table(tbl).count() === before)
    } finally drop(tbl)
  }

  test("null vectors land in cluster -1, survive, and are never indexed") {
    val tbl = freshTable()
    try {
      val rows = Seq(1L -> Option(ang(0)), 2L -> Option(ang(10)),
        3L -> Option.empty[Seq[Float]]).toDF("id", "v")
      val v = StreamingSemanticDedup.foldBatch(spark, rows, "id", "v",
        oneCentroid, tFp, tbl, 4, 0L)
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(v === Set((1L, 0L, None), (2L, 0L, Some(1L)), (3L, -1L, None)))
      assert(spark.table(tbl).filter(col("cluster") === -1).count() === 0L)
      assert(spark.table(tbl).count() === 2L)
    } finally drop(tbl)
  }

  test("end-to-end stream over a rate-limited source matches the batch operator") {
    val tbl = freshTable()
    val dir = java.nio.file.Files.createTempDirectory("ssd_e2e").toString
    try {
      val corpus = df(Seq(1L -> ang(0), 2L -> ang(30), 3L -> ang(60),
        10L -> ang(5), 11L -> ang(90), 12L -> ang(92)))
      corpus.filter(col("id") < 10).coalesce(1).write.parquet(s"$dir/in/b0")
      val stream = spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/b0")
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Option[Long])]
      val run = StreamingSemanticDedup.start(stream, "id", "v",
        oneCentroid, tFp, tbl, indexBuckets = 4) { (v, _) =>
        buf ++= v.as[(Long, Long, Option[Long])].collect()
      }
      try {
        run.query.processAllAvailable()
        // late arrivals (all ids larger): fold directly — same surface
        StreamingSemanticDedup.foldBatch(spark,
          corpus.filter(col("id") >= 10), "id", "v", oneCentroid, tFp,
          tbl, 4, 1000L).as[(Long, Long, Option[Long])]
          .collect().foreach(buf += _)
      } finally run.query.stop()
      val streamSurvivors = buf.filter(_._3.isEmpty).map(_._1).toSet
      val batchSurvivors = Curation.semanticDedupFixed(corpus, "id", "v",
        oneCentroid, tFp, dim = dim).select("id").as[Long].collect().toSet
      assert(streamSurvivors === batchSurvivors)
    } finally {
      drop(tbl)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
