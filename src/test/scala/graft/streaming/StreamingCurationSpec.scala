package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Cross-batch semantics of the composed streaming curation: the
  * fingerprint index drops cross-batch exact duplicates, and the pack
  * state carries per-shard token totals so (seq_id, seq_offset)
  * continue across micro-batches exactly as the batch packer would
  * assign them.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  // 100 tokens, half stopwords → quality 1.0, top-word ratio 0.5 (≤ .5)
  private def text(tag: String): String =
    (1 to 50).map(i => s"the ${tag}_$i").mkString(" ")

  test("replayed batch probes pre-batch state only (at-least-once safety)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // simulate a failed attempt of batch 0 that already committed its
    // side effects: the doc's fingerprint (batch_id = 0) in the fp
    // index AND the shard's running total (batch_id = 0) in the pack
    // state. The replay must neither self-match the fingerprint (the
    // doc survives, as originally reported) nor read its own pack
    // total (offsets restart from the pre-batch base of 0).
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val fpTbl = s"graft_scr_fp_$sfx"; val stTbl = s"graft_scr_pack_$sfx"
    val a = text("a")
    spark.sql(
      s"SELECT md5(trim(regexp_replace(lower('${a}'), '\\\\s+', ' '))) AS h, " +
        "CAST(0 AS BIGINT) AS batch_id")
      .write.bucketBy(32, "h").sortBy("h")
      .format("parquet").saveAsTable(fpTbl)
    Seq(("s", 100L, 0L)).toDF("shard", "cum", "batch_id")
      .write.format("parquet").saveAsTable(stTbl)
    val mem = MemoryStream[(Long, String, String, String)](spark)
    val got = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val q = StreamingCuration.start(
      mem.toDF().toDF("doc_id", "text", "lang", "source"), "doc_id",
      Seq.empty[String].toDF("text").localCheckpoint(),
      StreamingCuration.FrozenConfig(seqLen = 64),
      mixtureRates = None, fpIndexTable = fpTbl, packStateTable = stTbl) {
      (batch, _) =>
        got ++= batch.select("doc_id", "seq_id", "seq_offset")
          .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
    }
    try {
      mem.addData((1L, a, "en", "s")) // the replayed batch 0
      q.processAllAvailable()
      mem.addData((2L, text("b"), "en", "s")) // batch 1 continues after it
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $fpTbl")
      spark.sql(s"DROP TABLE IF EXISTS $stTbl")
    }
    // replay: survives (no self-match), packs from base 0 (no
    // double-count of its own failed attempt's total)
    assert(got(1L) === ((0L, 0L)),
      "replayed batch 0 read its own failed attempt's state")
    // batch 1: base = the 100 tokens batch 0 committed → 100/64 = 1 r36
    assert(got(2L) === ((1L, 36L)))
  }

  test("crash mid-batch + checkpoint resume replays to the identical survivor set") {
    // the at-least-once window under a REAL crash (not a simulated
    // re-fire): batch 1's side effects (fp index + pack state appends,
    // both tagged batch_id = 1) commit, then the sink throws before the
    // batch commits to the checkpoint. The restarted query re-runs
    // batch id 1; the batch_id < current probe guard must hide the
    // failed attempt's own appends (identical verdicts/offsets), and
    // the duplicate re-appends must be absorbed by the distinct-probe /
    // max(cum) folds for every later batch.
    val tmp = java.nio.file.Files.createTempDirectory("graft_sc_crash").toString
    val in = new java.io.File(s"$tmp/in"); in.mkdirs()
    val now = System.currentTimeMillis()
    def addBatch(i: Int, rows: Seq[(Long, String, String, String)]): Unit = {
      val dir = s"$tmp/stage_$i"
      rows.toDF("doc_id", "text", "lang", "source")
        .coalesce(1).write.parquet(dir)
      val part = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(in, f"batch_$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(now - (5 - i) * 60000L)
    }
    addBatch(0, Seq((1L, text("a"), "en", "s"), (2L, text("b"), "en", "s")))
    addBatch(1, Seq((3L, text("a"), "en", "s"), (4L, text("c"), "en", "s")))
    def stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val emptyBench = Seq.empty[String].toDF("text").localCheckpoint()
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val fpTbl = s"graft_scc_fp_$sfx"; val stTbl = s"graft_scc_pack_$sfx"
    val ckpt = s"$tmp/ckpt"
    val firstAttempt = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q1 = StreamingCuration.start(stream, "doc_id", emptyBench,
      StreamingCuration.FrozenConfig(seqLen = 64),
      mixtureRates = None, fpIndexTable = fpTbl, packStateTable = stTbl,
      checkpointLocation = Some(ckpt)) { (batch, batchId) =>
      if (batchId == 1L) {
        firstAttempt ++= batch.select("doc_id", "seq_id", "seq_offset")
          .as[(Long, Long, Long)].collect()
        throw new RuntimeException("injected crash after state commit")
      }
    }
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // the failed attempt DID commit its batch-1 state before dying
    assert(spark.table(fpTbl).filter($"batch_id" === 1L).count() === 1)
    assert(spark.table(stTbl).filter($"batch_id" === 1L).count() === 1)
    // resume from the checkpoint; also feed a batch 2 that repeats
    // batch 1's survivor to prove the doubled index rows still dedup
    addBatch(2, Seq((5L, text("c"), "en", "s"), (6L, text("d"), "en", "s")))
    val replays = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Long)]]
    val q2 = StreamingCuration.start(stream, "doc_id", emptyBench,
      StreamingCuration.FrozenConfig(seqLen = 64),
      mixtureRates = None, fpIndexTable = fpTbl, packStateTable = stTbl,
      checkpointLocation = Some(ckpt)) { (batch, batchId) =>
      replays(batchId) = batch.select("doc_id", "seq_id", "seq_offset")
        .as[(Long, Long, Long)].collect().toSet
    }
    val dupFpRows =
      try {
        q2.processAllAvailable()
        // appends ran through the stream clone; refresh the OUTER
        // session's relation cache before counting
        spark.catalog.refreshTable(fpTbl)
        spark.table(fpTbl).filter($"batch_id" === 1L).count()
      } finally {
        q2.stop()
        spark.sql(s"DROP TABLE IF EXISTS $fpTbl")
        spark.sql(s"DROP TABLE IF EXISTS $stTbl")
      }
    // the replay ran as the SAME batch id and reproduced the failed
    // attempt's verdicts and offsets exactly: doc 3 (cross-batch dup of
    // doc 1) dropped, doc 4 packs after batch 0's 200 tokens
    assert(replays.keySet === Set(1L, 2L))
    assert(replays(1L) === firstAttempt.toSet)
    assert(replays(1L) === Set((4L, 3L, 8L)))
    // the double-appended batch-1 state is absorbed downstream: doc 5
    // dups doc 4's text via the index, doc 6 continues from 300 tokens
    assert(replays(2L) === Set((6L, 4L, 44L)))
    // and the table really did hold the duplicate appends the folds
    // absorbed (the crash left them, by design)
    assert(dupFpRows === 2)
  }

  test("cross-batch dedup drops the recurrence; pack offsets continue") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sc_spec").toString
    Seq((1L, text("a"), "en", "s"), (2L, text("b"), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$tmp/b1")
    Seq((3L, text("a"), "en", "s"), (4L, text("c"), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$tmp/b2")
    val in = new java.io.File(s"$tmp/in"); in.mkdirs()
    val now = System.currentTimeMillis()
    Seq("b1", "b2").zipWithIndex.foreach { case (b, i) =>
      val part = new java.io.File(s"$tmp/$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(in, f"batch_$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(now - (1 - i) * 60000L)
    }
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val emptyBench = Seq.empty[String].toDF("text").localCheckpoint()
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = StreamingCuration.start(stream, "doc_id", emptyBench,
      StreamingCuration.FrozenConfig(seqLen = 64),
      mixtureRates = None,
      fpIndexTable = s"graft_scs_fp_$sfx",
      packStateTable = s"graft_scs_pack_$sfx") { (batch, _) =>
      got ++= batch.select("doc_id", "n_tokens", "seq_id", "seq_offset")
        .as[(Long, Long, Long, Long)].collect()
    }
    try q.processAllAvailable()
    finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS graft_scs_fp_$sfx")
      spark.sql(s"DROP TABLE IF EXISTS graft_scs_pack_$sfx")
    }
    // doc 3 repeats doc 1's text → dropped by the cross-batch index;
    // doc 4 packs AFTER the 200 tokens of batch 1 (state carried):
    // starts 200 → seq 200/64 = 3, offset 200 % 64 = 8
    assert(got.toSet === Set(
      (1L, 100L, 0L, 0L),
      (2L, 100L, 1L, 36L),
      (4L, 100L, 3L, 8L)))
  }

  test("domainCapStream: lifetime quota per domain, md5-deterministic " +
    "within a batch, state carries across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = StreamingCuration.domainCapStream(
        mem.toDF().toDF("doc_id", "url"), "doc_id", "url", cap = 3)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        admitted ++= b.as[(String, Long)].collect(); ()
      }.start()
    def urlOf(i: Long, host: String) = s"http://$host/p/$i"
    try {
      // batch 1: 5 docs on one domain → exactly 3 admitted, and they
      // are the md5-min 3 (the batch cap's selection, not arrival luck)
      mem.addData((1L to 5L).map(i => (i, urlOf(i, "a.com"))): _*)
      q.processAllAvailable()
      val batch1 = admitted.toSet
      assert(batch1.size === 3 && batch1.forall(_._1 == "a.com"))
      val expect3 = (1L to 5L)
        .sortBy(i => org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"42|$i"))
        .take(3).toSet
      assert(batch1.map(_._2) === expect3)
      // batch 2: same domain is EXHAUSTED (0 admitted); a fresh domain
      // and a www./port/case variant of it share one quota group
      mem.addData((6L, urlOf(6, "a.com")),
        (7L, "http://www.B.com:80/x"), (8L, "https://b.com/y"),
        (9L, "http://b.com/z"), (10L, "http://b.com/w"))
      q.processAllAvailable()
      val batch2 = admitted.toSet -- batch1
      assert(batch2.forall(_._1 == "b.com"), s"unexpected: $batch2")
      assert(batch2.size === 3)
    } finally q.stop()
  }

  test("domainCapStream: one hot domain flooding a trigger still " +
    "selects the exact md5-min quota (bounded-heap path)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = StreamingCuration.domainCapStream(
        mem.toDF().toDF("doc_id", "url"), "doc_id", "url", cap = 7)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        admitted ++= b.as[(String, Long)].collect(); ()
      }.start()
    try {
      // 5000 docs on ONE domain in one trigger — the batch slice the
      // heap keeps O(quota) of. Selection must equal the brute-force
      // sortBy((md5, id)).take(quota) the full sort produced.
      mem.addData((1L to 5000L).map(i =>
        (i, s"http://hot.example/p/$i")): _*)
      q.processAllAvailable()
      val expect = (1L to 5000L)
        .sortBy(i => (org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"42|$i"), i))
        .take(7).toSet
      assert(admitted.map(_._2).toSet === expect)
    } finally q.stop()
  }
}
