package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al.'s worked example shape: low×5 lower×2 newest×6
  // widest×3 — merge sequence hand-computed (count desc, lhs asc,
  // rhs asc tie-break)
  private def corpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    .toDF("doc_id", "text")

  test("train reproduces the hand-computed merge sequence") {
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 6)
    try {
      assert(merges.map(m => (m.mergeNo, m.lhs, m.rhs, m.pairFreq)) === Seq(
        (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L),
        (4, "lo", "w", 7L), (5, "e", "w", 6L), (6, "ew", "est", 6L)))
      val reps = vocab.select("word", "syms").as[(String, Seq[String])]
        .collect().toMap
      assert(reps("low") === Seq("low"))
      assert(reps("lower") === Seq("low", "e", "r"))
      assert(reps("newest") === Seq("n", "ewest"))
      assert(reps("widest") === Seq("w", "i", "d", "est"))
    } finally vocab.unpersist()
  }

  test("applyMerge is greedy left-to-right, non-overlapping") {
    val df = Seq(Tuple1(Seq("a", "a", "a")), Tuple1(Seq("a", "a", "a", "a")),
      Tuple1(Seq("b", "a", "a")), Tuple1(Seq("a", "b", "a")))
      .toDF("syms")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(
      Seq("aa", "a"), Seq("aa", "aa"), Seq("b", "aa"), Seq("a", "b", "a")))
  }

  test("train stops early when no pairs remain") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(tiny, "text", rounds = 10)
    try assert(merges.map(m => (m.lhs, m.rhs)) === Seq(("a", "b")))
    finally vocab.unpersist()
  }

  test("tokenCount sums trained symbol counts, OOV at char count, empty doc 0") {
    val (_, vocab) = Bpe.train(corpus, "text", rounds = 6)
    try {
      val docs = Seq(
        (10L, "low lower"),       // 1 + 3 trained symbols
        (11L, "unseen low"),      // 6 (OOV chars) + 1
        (12L, "")).toDF("doc_id", "text")
      val got = Bpe.tokenCount(docs, "doc_id", "text", vocab)
        .as[(Long, Long)].collect().toMap
      assert(got === Map(10L -> 4L, 11L -> 7L, 12L -> 0L))
    } finally vocab.unpersist()
  }

  test("vocab cap keeps the most frequent words with deterministic ties") {
    val docs = Seq((1L, "x x x y y z")).toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(docs, "text", maxVocab = 2)
      .as[(String, Long)].collect().toSeq
    assert(wf === Seq(("x", 3L), ("y", 2L)))
  }

  test("tokenCountWithMerges replays merges on unseen words exactly") {
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 6)
    try {
      // "slowest": unseen word. Replaying the trained merges
      // (e,s → es,t → l,o → lo,w → e,w → ew,est) on its characters:
      // s l o w e s t → es→[s,l,o,w,es,t]? No — left-to-right per
      // merge: hand-compute via the reference rules below.
      def replay(word: String): Int = {
        var s = word.map(_.toString).toVector
        for (m <- merges.sortBy(_.mergeNo)) {
          val b = Vector.newBuilder[String]
          var pend: String = null
          for (x <- s) {
            if (pend == null) pend = x
            else if (pend == m.lhs && x == m.rhs) { b += (m.lhs + m.rhs); pend = null }
            else { b += pend; pend = x }
          }
          if (pend != null) b += pend
          s = b.result()
        }
        s.size
      }
      val docs = Seq((1L, "slowest low"), (2L, "newestest")).toDF("doc_id", "text")
      val got = Bpe.tokenCountWithMerges(docs, "doc_id", "text", vocab, merges)
        .as[(Long, Long)].collect().toMap
      assert(got(1L) === replay("slowest") + 1L) // "low" in-vocab → 1 symbol
      assert(got(2L) === replay("newestest").toLong)
      // and the replay count is never worse than the char-count fallback
      assert(got(2L) < "newestest".length.toLong)
    } finally vocab.unpersist()
  }

  test("replaySymbols (codegen kernel) == applyMerges reference fold") {
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 6)
    try {
      val words = Seq("slowest", "newestest", "a", "low", "wwww",
        "estestest", "lowestlow", "zzz")
      val got = words.toDF("word").select(
        Bpe.replaySymbols(col("word"), merges).as("kernel"),
        Bpe.applyMerges(split(col("word"), ""), merges).as("fold"))
        .as[(Seq[String], Seq[String])].collect()
      got.foreach { case (k, f) => assert(k === f) }
    } finally vocab.unpersist()
  }

  test("property: kernel replay == reference fold on random merges and words") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val symGen = Gen.oneOf("a", "b", "c", "ab", "bc")
    val mergesGen = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.zip(symGen, symGen)))
    val wordGen = Gen.chooseNum(1, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    (0 until 8).foreach { i =>
      val params = Gen.Parameters.default
      val ms = mergesGen(params, Seed(9000L + i)).get
        .zipWithIndex.map { case ((l, r), k) => Bpe.Merge(k + 1, l, r, 1L) }
      val words = Gen.listOfN(12, wordGen)(params, Seed(9100L + i)).get
      val got = words.toDF("word").select(
        Bpe.replaySymbols(col("word"), ms).as("kernel"),
        Bpe.applyMerges(split(col("word"), ""), ms).as("fold"))
        .as[(Seq[String], Seq[String])].collect()
      got.foreach { case (k, f) => assert(k === f, s"merges: $ms words: $words") }
    }
  }

  test("kernel replay handles merge lists far past the fold's analysis depth") {
    // 600 no-op merges + one live (a,a) merge LAST: the chained-fold
    // form builds a 601-deep expression tree (Catalyst analysis
    // stalls); the kernel is a flat loop over plan metadata.
    val ms = (1 to 600).map(k => Bpe.Merge(k, s"x$k", s"y$k", 1L)) :+
      Bpe.Merge(601, "a", "a", 1L)
    val got = Seq("aaaa", "aaa", "b").toDF("word")
      .select(Bpe.replaySymbols(col("word"), ms).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(Seq("aa", "aa"), Seq("aa", "a"), Seq("b")))
  }

  test("skip-jump replay: 32k-merge table, duplicate-pair lists, tokenizer-scale cost") {
    // 32k filler merges (never applicable) around a few live ones: the
    // skip-jump must (a) produce the sequential result and (b) finish
    // in time proportional to APPLIED merges, not table size — the
    // naive per-pass loop at 32k merges is ~32k array passes per word
    val live = Seq(("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"))
    val filler = (1 to 32000).map(k => (s"zz$k", s"qq$k"))
    val ms = (live ++ filler).zipWithIndex
      .map { case ((l, r), k) => Bpe.Merge(k + 1, l, r, 1L) }
    val t0 = System.nanoTime()
    val got = Seq("the", "and", "than", "xyz").toDF("word")
      .select(Bpe.replaySymbols(col("word"), ms).as("s"))
      .as[Seq[String]].collect().toSeq
    val sec = (System.nanoTime() - t0) / 1e9
    assert(got === Seq(Seq("the"), Seq("and"), Seq("th", "an"), Seq("x", "y", "z")))
    assert(sec < 30.0, s"32k-merge replay took $sec s — skip-jump regressed")

    // duplicate pair entries: the SECOND (a,b) entry must fire when
    // later merges re-create adjacency the first pass could not see
    val dup = Seq(
      Bpe.Merge(1, "a", "b", 1L),   // no (a,b) adjacency yet in "acb"...
      Bpe.Merge(2, "x", "y", 1L),
      Bpe.Merge(3, "a", "b", 1L))
    val r = Seq("ab").toDF("word")
      .select(Bpe.replaySymbols(col("word"), dup).as("k"),
        Bpe.applyMerges(split(col("word"), ""), dup).as("f"))
      .as[(Seq[String], Seq[String])].collect().head
    assert(r._1 === r._2)
  }

  test("A/B: dict-encoded default == per-occurrence variant") {
    val docs = Seq(
      (1L, "the the cat cat cat sat"),
      (2L, "unique words only here now"),
      (3L, ""),
      (4L, "repeat repeat repeat repeat")).toDF("doc_id", "text")
    val ms = Seq(Bpe.Merge(1, "t", "h", 1L), Bpe.Merge(2, "th", "e", 1L),
      Bpe.Merge(3, "c", "a", 1L), Bpe.Merge(4, "ca", "t", 1L))
    val vocab = Seq(("sat", Seq("s", "at"))).toDF("word", "syms")
    val a = Bpe.tokenCountWithMergesPerOcc(docs, "doc_id", "text", vocab, ms)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val b = Bpe.tokenCountWithMergesDict(docs, "doc_id", "text", vocab, ms)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(a === b)
    // the promoted default IS the dict path
    val c = Bpe.tokenCountWithMerges(docs, "doc_id", "text", vocab, ms)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(c === b)
    // "the"→1 sym ×2 occ; "cat"→1 sym ×3; "sat" in-vocab 2 syms ×1
    assert(a.head === ((1L, 2L + 3L + 2L)))
  }

  test("saveMerges/loadMerges round-trips the artifact in training order") {
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 6)
    try {
      val dir = java.nio.file.Files.createTempDirectory("bpe_merges").toString
      Bpe.saveMerges(spark, merges, dir)
      assert(Bpe.loadMerges(spark, dir) === merges)
    } finally vocab.unpersist()
  }

  test("property: train matches a sequential reference on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small alphabet → dense pair collisions, the regime where greedy
    // overlap rules and tie-breaks actually bite
    val wordGen = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val corpusGen = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, wordGen))

    def reference(words: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
      val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var reps: Map[String, Vector[String]] =
        freq.keys.map(w => w -> w.map(_.toString).toVector).toMap
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var done = false
      for (k <- 1 to rounds if !done) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((w, f) <- freq; s = reps(w); i <- 0 until s.size - 1)
          pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + f
        if (pc.isEmpty) done = true
        else {
          val ((l, r), c) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((k, l, r, c))
          reps = reps.map { case (w, s) =>
            val b = Vector.newBuilder[String]
            var pend: String = null
            for (x <- s) {
              if (pend == null) pend = x
              else if (pend == l && x == r) { b += (l + r); pend = null }
              else { b += pend; pend = x }
            }
            if (pend != null) b += pend
            w -> b.result()
          }
        }
      }
      out.toSeq
    }

    (0 until 6).foreach { i =>
      corpusGen(Gen.Parameters.default, Seed(1234L + i)).foreach { words =>
        val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
        val (merges, vocab) = Bpe.train(docs, "text", rounds = 5)
        try assert(
          merges.map(m => (m.mergeNo, m.lhs, m.rhs, m.pairFreq)) ===
            reference(words, 5), s"corpus: ${words.mkString(" ")}")
        finally vocab.unpersist()
      }
    }
  }
}
