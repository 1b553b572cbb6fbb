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
}
