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

  test("startOrdered: interleaved out-of-order arrival still equals the batch operator") {
    // ids 1..3 are the non-transitive chain (1~2, 2~3); 4..12 sit on
    // their own (± signed) axes, pairwise below threshold. Arrival is
    // DELIBERATELY disordered within each trigger — id 2 lands a
    // trigger before id 1, the order under which plain start's
    // keep-first verdicts would diverge (2 would survive). With
    // delay=5s and this schedule the watermark advances enough to
    // release PROGRESSIVELY (several fold batches — the cross-batch
    // index path, not just batch-mates) while no arrival ever falls
    // behind the watermark (nothing is late-dropped).
    val tbl = freshTable()
    val dir = java.nio.file.Files.createTempDirectory("ssd_ooo").toString
    try {
      def axis(i: Int, sign: Double): Seq[Float] = {
        val a = Array.fill(8)(0.0)
        a(i) = sign
        vec(a.toIndexedSeq: _*)
      }
      val corpus = df(Seq(
        1L -> ang(0), 2L -> ang(30), 3L -> ang(60),
        4L -> axis(2, 1), 5L -> axis(3, 1), 6L -> axis(4, 1),
        7L -> axis(5, 1), 8L -> axis(6, 1), 9L -> axis(7, 1),
        10L -> axis(2, -1), 11L -> axis(3, -1), 12L -> axis(4, -1)))
      val batches = Seq(Seq(2L, 1L, 4L), Seq(3L, 6L, 5L),
        Seq(8L, 7L, 9L), Seq(11L, 10L, 12L))
      batches.zipWithIndex.foreach { case (ids, i) =>
        corpus.filter(col("id").isin(ids: _*))
          .coalesce(1).write.parquet(s"$dir/in/b$i.parquet")
      }
      val sentinelId = 1000L
      df(Seq(sentinelId -> Seq.empty[Float]))
        .coalesce(1).write.parquet(s"$dir/in/z_sentinel.parquet")
      val base = System.currentTimeMillis()
      (0 to 4).foreach { i =>
        val name = if (i < 4) s"b$i.parquet" else "z_sentinel.parquet"
        val dd = new java.io.File(s"$dir/in/$name")
        (dd.listFiles() :+ dd).foreach(_.setLastModified(base + i * 2000L))
      }
      val stream = spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
      val folds = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, Long, Option[Long])]]
      val run = StreamingSemanticDedup.startOrdered(stream, "id", "v",
        oneCentroid, tFp, tbl, indexBuckets = 4,
        delay = "5 seconds", shards = 2) { (v, _) =>
        val rows = v.as[(Long, Long, Option[Long])].collect().toSeq
        if (rows.nonEmpty) folds += rows
      }
      try run.query.processAllAvailable()
      finally run.query.stop()
      val all = folds.flatten.filterNot(_._1 == sentinelId)
      // released ids STRICTLY increase across fold batches — the
      // ordered-ingest contract the operator now enforces
      val ranges = folds.map(f => (f.map(_._1).min, f.map(_._1).max)).toSeq
      ranges.zip(ranges.drop(1)).foreach { case ((_, prevMax), (curMin, _)) =>
        assert(curMin > prevMax, s"fold ranges overlap: $ranges")
      }
      assert(folds.size >= 2, s"expected progressive release, got $ranges")
      // verdicts equal the batch operator's on the delivered corpus
      val streamSurvivors = all.filter(_._3.isEmpty).map(_._1).toSet
      val batchSurvivors = Curation.semanticDedupFixed(corpus, "id", "v",
        oneCentroid, tFp, dim = dim).select("id").as[Long].collect().toSet
      assert(all.map(_._1).toSet === (1L to 12L).toSet)
      assert(streamSurvivors === batchSurvivors)
    } finally {
      drop(tbl)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
