package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingPrepSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch groupBy") {
    val streamed = StreamingPrep.runToMemory(
      StreamingPrep.windowedAgg(
        StreamingPrep.streamEvents(spark, dir), "10 minutes", "1 hour"),
      outputMode = "complete")
    val batch = graft.io.Tables.events(spark, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * lit(1e6))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / lit(1e6)).as("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming dedupByKey yields exactly the distinct key set") {
    val s = StreamingPrep.streamEvents(spark, dir)
      .select(col("ts"), col("user_id"), col("event_type"))
    val out = StreamingPrep.runToMemory(
      StreamingPrep.dedupByKey(s, "10 minutes", Seq("user_id", "event_type")))
    val expected = graft.io.Tables.events(spark, dir)
      .select("user_id", "event_type").distinct().count()
    assert(out.count() === expected)
    assert(out.select("user_id", "event_type").distinct().count() === expected)
  }

  test("sessionize closes sessions at the inactivity gap") {
    val gapUs = 30L * 60 * 1000 * 1000 // 30 min
    val sessions = StreamingPrep.runToMemory(
      StreamingPrep.sessionize(
        StreamingPrep.streamEvents(spark, dir), gapUs))
    // closed sessions exist, are well-formed, and non-overlapping per user
    assert(sessions.count() > 0)
    val bad = sessions.filter(col("session_end") < col("session_start") ||
      col("n_events") < 1).count()
    assert(bad === 0)
    val rows = sessions.select("user_id", "session_start", "session_end")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    rows.values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + gapUs < b._2,
          s"sessions not separated by gap: $a $b")
        case _ =>
      }
    }
  }

  test("streaming packSequences carries the running token count across batches") {
    // two files -> two micro-batches; batch 2's offsets must continue
    // where batch 1's cumulative count left off (state = one long/shard)
    val tmp = java.nio.file.Files.createTempDirectory("graft_spack").toString
    Seq((1L, "en", 600L), (2L, "en", 500L))
      .toDF("doc_id", "lang", "n_tokens")
      .coalesce(1).write.parquet(s"$tmp/f1.parquet")
    Seq((3L, "en", 100L), (4L, "en", 900L))
      .toDF("doc_id", "lang", "n_tokens")
      .coalesce(1).write.parquet(s"$tmp/f2.parquet")
    val stream = spark.readStream
      .schema(Seq((0L, "x", 0L)).toDF("doc_id", "lang", "n_tokens").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val got = StreamingPrep.runToMemory(
      StreamingPrep.packSequences(stream, seqLen = 1000))
      .select("doc_id", "seq_id", "seq_offset")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L, 0L), (2L, 0L, 600L), (3L, 1L, 100L), (4L, 1L, 200L)))
  }

  test("packSequencesOrdered matches the batch packer under shuffled multi-batch arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.Curation
    // 12 docs over two shards; event time = doc_id seconds
    val all = (0L until 12L).map(i =>
      (i, if (i % 3 == 0) "de" else "en", 100L + (i * 137) % 900))
    val mem = MemoryStream[(Long, String, Long)](spark)
    val stream = StreamingPrep.packSequencesOrdered(
      mem.toDF().toDF("doc_id", "lang", "n_tokens"),
      seqLen = 1000, delay = "1000 seconds")
    val q = stream.writeStream.format("memory")
      .queryName("graft_opack").outputMode("append").start()
    try {
      // arrivals shuffled ACROSS batches — the order packSequences (batch
      // twin per micro-batch) would get wrong
      Seq(
        Seq(all(7), all(2), all(11), all(0)),
        Seq(all(5), all(9), all(1), all(4)),
        Seq(all(10), all(3), all(8), all(6)),
        // sentinels push the watermark past every real doc; the second
        // forces one more micro-batch so all timeouts demonstrably fire
        Seq((1000000L, "zz", 0L)),
        Seq((1000001L, "zz", 0L))
      ).foreach { batch => mem.addData(batch); q.processAllAvailable() }
      val got = spark.table("graft_opack")
        .filter($"lang" =!= "zz")
        .select("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")
        .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val expected = Curation.packSequences(
        all.toDF("doc_id", "lang", "n_tokens"), "lang", "doc_id",
        col("n_tokens"), seqLen = 1000)
        .select("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")
        .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got === expected)
    } finally q.stop()
  }

  test("streaming decontamination filters across micro-batch boundaries") {
    import graft.pipeline.Curation
    // two files -> two micro-batches; contaminated docs appear in BOTH
    // batches, so the anti-join must hold per batch, not just overall
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdoc").toString
    def doc(id: Long, text: String) = (id, text, "en", "src", text.length.toLong)
    Seq(doc(1, "clean one"), doc(2, "held out A"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/f1.parquet")
    Seq(doc(3, "Held   OUT a"), doc(4, "clean two"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/f2.parquet")

    val benchmark = Seq("held out a").toDF("text")
    val stream = spark.readStream
      .schema(Seq(doc(0, "x")).toDF("doc_id", "text", "lang", "source", "n_chars").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val survivors = StreamingPrep.runToMemory(
      Curation.decontaminate(stream, benchmark, "text").select("doc_id"))
      .as[Long].collect().sorted.toSeq
    assert(survivors === Seq(1L, 4L))
  }

  test("streaming mixture sampling admits the batch sample across micro-batches") {
    import graft.pipeline.Curation
    // snapshot-trained rates applied to the same docs arriving as a
    // 3-file stream: every micro-batch interleave must admit exactly
    // the batch-computed sample (the inclusion decision is a pure row
    // hash — no per-batch state to drift)
    val docs = (1 to 90).map(i =>
      (i.toLong, if (i % 9 == 0) "zh" else "en")).toDF("doc_id", "lang")
    val rates = Curation.mixtureRates(docs, "lang", budget = 30)
      .persist()
    val expected = Curation.applyMixtureRates(docs, "lang", col("doc_id"), rates)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(expected.nonEmpty && expected.size < 90)

    val tmp = java.nio.file.Files.createTempDirectory("graft_smix").toString
    docs.filter($"doc_id" <= 30).coalesce(1).write.parquet(s"$tmp/f1.parquet")
    docs.filter($"doc_id" > 30 && $"doc_id" <= 60).coalesce(1).write.parquet(s"$tmp/f2.parquet")
    docs.filter($"doc_id" > 60).coalesce(1).write.parquet(s"$tmp/f3.parquet")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val got = StreamingPrep.runToMemory(
      Curation.applyMixtureRates(stream, "lang", col("doc_id"), rates)
        .select("doc_id"))
      .as[Long].collect().sorted.toSeq
    assert(got === expected)
    rates.unpersist()
  }
}
