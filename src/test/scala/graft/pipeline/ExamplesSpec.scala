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

  test("spanCorrupt: splicing targets into the input reconstructs the text") {
    val rows = Examples.spanCorrupt(corpus, "doc_id", "text",
        startRateFp = 120000L) // high rate so merges occur
      .as[(Long, Long, String, String)].collect()
    assert(rows.exists(_._2 >= 2L)) // sentinel numbering is exercised
    rows.foreach { case (id, nSpans, input, target) =>
      // parse target into sentinel -> span tokens
      val spans = "<extra_id_(\\d+)>".r.findAllMatchIn(target).toSeq
      assert(spans.map(_.group(1).toInt) === (0 until nSpans.toInt))
      val pieces = target.split("<extra_id_\\d+> ").filter(_.nonEmpty)
        .map(_.trim)
      val rebuilt = (0 until nSpans.toInt).foldLeft(input) { (acc, k) =>
        acc.replace(s"<extra_id_$k>", pieces(k))
      }
      val orig = corpus.filter(col("doc_id") === id)
        .select(lower(col("text"))).as[String].head()
      assert(rebuilt === orig.trim.replaceAll("\\s+", " "),
        s"doc $id failed round-trip")
    }
  }

  test("spanCorrupt: deterministic under repartitioning; spans merge") {
    val a = Examples.spanCorrupt(corpus, "doc_id", "text")
      .as[(Long, Long, String, String)].collect().sorted.toSeq
    val b = Examples.spanCorrupt(corpus.repartition(5), "doc_id", "text")
      .as[(Long, Long, String, String)].collect().sorted.toSeq
    assert(a === b)
    // adjacent-but-distinct sentinels never appear (merged spans)
    a.foreach { case (_, _, input, _) =>
      assert(!input.matches(".*<extra_id_\\d+> <extra_id_\\d+>.*"))
    }
  }

  test("spanCorrupt: zero rate and degenerate docs pass through") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "  "),
      (3L, "just a few plain tokens here")).toDF("doc_id", "text")
    val got = Examples.spanCorrupt(df, "doc_id", "text", startRateFp = 0L)
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(0L, 0L, 0L))
    assert(got(0)._3 === "" && got(1)._3 === "")
    assert(got(2)._3 === "just a few plain tokens here")
    assert(got.forall(_._4 === ""))
  }

  test("shardAssign: dense per-shard order, partition-independent") {
    val a = Examples.shardAssign(corpus, "doc_id", "text", nShards = 4)
      .as[(Long, Long, Long, Long)].collect()
    val b = Examples.shardAssign(corpus.repartition(9), "doc_id", "text",
        nShards = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(a.sorted.toSeq === b.sorted.toSeq)
    assert(a.length === 60)
    // ord is a dense 0..k-1 sequence inside every shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    }
    // every doc has 10 tokens in this corpus
    assert(a.forall(_._4 === 10L))
    intercept[IllegalArgumentException] {
      Examples.shardAssign(corpus, "doc_id", "text", nShards = 0)
    }
  }

  test("shardManifest agrees with shardAssign; checksum detects content drift") {
    val m = Examples.shardManifest(corpus, "doc_id", "text", nShards = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val byShard = Examples.shardAssign(corpus, "doc_id", "text", nShards = 4)
      .groupBy("shard").agg(count(lit(1)).as("n"), sum("n_tokens").as("t"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(m.keySet === byShard.keySet)
    m.foreach { case (s, (_, nDocs, nToks, _)) =>
      assert((nDocs, nToks) === ((byShard(s)._2, byShard(s)._3)))
    }
    // same docs, one text changed -> that shard's checksum moves, others don't
    val mutated = corpus.withColumn("text",
      when(col("doc_id") === 7L, lit("a completely different body")) // doc 7
        .otherwise(col("text")))
    val m2 = Examples.shardManifest(mutated, "doc_id", "text", nShards = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val shard7 = Examples.shardAssign(corpus, "doc_id", "text", nShards = 4)
      .filter(col("doc_id") === 7L).select("shard").as[Long].head()
    m.keySet.foreach { s =>
      if (s == shard7) assert(m2(s)._4 !== m(s)._4)
      else assert(m2(s)._4 === m(s)._4)
    }
  }

  test("shardManifest streaming fold: three micro-batches == batch manifest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = corpus.as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)](spark)
    val name = "graft_manifest_spec"
    val q = Examples.shardManifest(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", nShards = 4)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      // deliberately uneven micro-batches exercise the merge path
      mem.addData(rows.take(7)); q.processAllAvailable()
      mem.addData(rows.slice(7, 40)); q.processAllAvailable()
      mem.addData(rows.drop(40)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val batch = Examples.shardManifest(corpus, "doc_id", "text", nShards = 4)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(streamed === batch)
  }

  test("manifestDiff: all four statuses; swap-preserving-counts still flags") {
    val mk = (rows: Seq[(Long, Long, Long, Long)]) =>
      rows.toDF("shard", "n_docs", "n_tokens", "checksum")
    val base = mk(Seq((0L, 5L, 50L, 111L), (1L, 3L, 30L, 222L),
      (2L, 2L, 20L, 333L), (3L, 1L, 10L, 444L)))
    // shard 0 unchanged; shard 1 counts equal but checksum moved
    // (content swap); shard 2 counts moved; shard 3 removed; 4 added
    val cur = mk(Seq((0L, 5L, 50L, 111L), (1L, 3L, 30L, 999L),
      (2L, 4L, 44L, 555L), (4L, 7L, 70L, 666L)))
    val got = Examples.manifestDiff(base, cur)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0L, "unchanged", 0L, 0L),
      (1L, "changed", 0L, 0L),        // the checksum catches the swap
      (2L, "changed", 2L, 24L),
      (3L, "removed", -1L, -10L),
      (4L, "added", 7L, 70L)))
  }

  test("nspPairs: deterministic, ~50/50 coin, true-next rows carry the " +
    "real next segment, negatives come from the segment universe") {
    val docs = (1L to 40L)
      .map(i => (i, (1 to 30).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Examples.nspPairs(docs, "doc_id", "text", segTokens = 6)
      .as[(Long, Long, String, String, Boolean)].collect().sorted.toSeq
    val b = Examples.nspPairs(docs.repartition(7, col("doc_id")),
        "doc_id", "text", segTokens = 6)
      .as[(Long, Long, String, String, Boolean)].collect().sorted.toSeq
    assert(a === b)
    // 30 words / 6-token segments → 5 segments → 4 adjacent pairs/doc
    assert(a.size === 160)
    val nextShare = a.count(_._5).toDouble / a.size
    assert(nextShare > 0.35 && nextShare < 0.65, s"coin share $nextShare")
    // the segment universe, keyed for verification
    val segs = Examples.chunkDocuments(docs, "doc_id", "text", 6, 6)
      .as[(Long, Long, Long, Long, String)].collect()
    val byKey = segs.map(s => (s._1, s._2) -> s._5).toMap
    val universe = segs.map(_._5).toSet
    a.foreach { case (doc, pos, segA, segB, isNext) =>
      assert(segA === byKey((doc, pos)))
      if (isNext) assert(segB === byKey((doc, pos + 1)))
      else assert(universe.contains(segB))
    }
  }

  test("chunkDocuments: overlapping grid, short tail kept, empty docs " +
    "emit nothing, config validated") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 words
      (2L, "x y"),                 // shorter than one chunk
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Examples.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, stride = 3)
      .as[(Long, Long, Long, Long, String)].collect().sorted.toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 4L, "a b c d"),
      (1L, 1L, 3L, 4L, "d e f g"),
      (1L, 2L, 6L, 4L, "g h i j"),
      (1L, 3L, 9L, 1L, "j"),
      (2L, 0L, 0L, 2L, "x y")))
    // stride == chunkTokens → non-overlapping partition of the tokens
    val flat = Examples.chunkDocuments(docs.filter(col("doc_id") === 1),
        "doc_id", "text", chunkTokens = 4, stride = 4)
      .as[(Long, Long, Long, Long, String)].collect().sorted.toSeq
    assert(flat.map(_._5).mkString(" ") === "a b c d e f g h i j")
    intercept[IllegalArgumentException] {
      Examples.chunkDocuments(docs, "doc_id", "text", 4, 5)
    }
    intercept[IllegalArgumentException] {
      Examples.chunkDocuments(docs, "doc_id", "text", 0, 1)
    }
  }

  test("mlmMaskWithVocab: a vocabSize that disagrees with the artifact " +
    "fails loudly instead of emitting NULL input_token") {
    val vocab = Examples.mlmVocab(corpus, "doc_id", "text")
    val n = vocab.count()
    // consistent size: clean run
    assert(Examples.mlmMaskWithVocab(corpus, "doc_id", "text", vocab, n)
      .count() > 0L)
    // inflated modulus: most random-replacement indexes miss the
    // artifact — the raise_error fires at execution time
    val ex = intercept[Exception] {
      Examples.mlmMaskWithVocab(corpus, "doc_id", "text", vocab,
        n * 1000L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("vocab artifact")),
      s"unexpected error chain: ${messages(ex).mkString(" | ")}")
  }

  test("mlmMask: null and empty texts contribute no positions") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "   "),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val ids = Examples.mlmMask(df, "doc_id", "text")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(!ids.contains(1L) && !ids.contains(2L))
  }

  test("epochShuffle: every epoch holds the full corpus, densely " +
    "ordered per shard, independent across epochs") {
    val out = Examples.epochShuffle(corpus, "doc_id",
      nEpochs = 3, nShards = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // full multiset per epoch
    (0L to 2L).foreach { e =>
      assert(out.filter(_._1 == e).map(_._2).sorted === (1L to 60L))
    }
    // ord is dense 0..n-1 within every (epoch, shard)
    out.groupBy(r => (r._1, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted === rows.indices.map(_.toLong))
    }
    // epochs are shuffled INDEPENDENTLY: the (shard, ord) assignment
    // of at least one doc moves between epochs
    val byEpoch = (0L to 2L).map(e =>
      out.filter(_._1 == e).map(r => r._2 -> ((r._3, r._4))).toMap)
    assert(byEpoch(0) !== byEpoch(1))
    assert(byEpoch(1) !== byEpoch(2))
  }

  test("epochShuffle: partitioning-independent and deterministic") {
    val a = Examples.epochShuffle(corpus, "doc_id", 2, 4)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val b = Examples.epochShuffle(corpus.repartition(7, col("doc_id")),
        "doc_id", 2, 4)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      Examples.epochShuffle(corpus, "doc_id", 0, 4)
    }
    intercept[IllegalArgumentException] {
      Examples.epochShuffle(corpus, "doc_id", 2, 0)
    }
  }
}
