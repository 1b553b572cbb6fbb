package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount splits on whitespace runs") {
    val df = Seq("one two  three\tfour", "single").toDF("text")
    assert(df.select(TextAnalysis.tokenCount($"text")).as[Int]
      .collect().toSeq === Seq(4, 1))
  }

  test("bpeTokenCount counts letter runs, digits and punctuation separately") {
    val df = Seq("hello, world 42").toDF("text")
    // pieces: hello , world 4 2
    assert(df.select(TextAnalysis.bpeTokenCount($"text")).as[Int].head() === 5)
  }

  test("fingerprint is invariant to case and whitespace, sensitive to content") {
    val df = Seq(
      ("a", "Hello   World"),
      ("b", "hello world"),
      ("c", "hello worlds")).toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(String, String)].collect().toMap
    assert(fps("a") === fps("b"))
    assert(fps("a") !== fps("c"))
  }

  test("rollingHash is order-sensitive") {
    val df = Seq(("x", "alpha beta"), ("y", "beta alpha")).toDF("id", "text")
    val hs = df.select($"id", TextAnalysis.rollingHash($"text").as("h"))
      .as[(String, Long)].collect().toMap
    assert(hs("x") !== hs("y"))
  }

  test("langId picks the profile with most marker hits; en wins ties") {
    val df = Seq(
      "the cat and the dog is here", // en markers
      "der hund und die katze ist nicht da", // de markers
      "xyzzy qwerty" // no markers anywhere → tie at 0 → en
    ).toDF("text")
    assert(df.select(TextAnalysis.langId($"text")).as[String]
      .collect().toSeq === Seq("en", "de", "en"))
  }

  test("quality score is in (0,1] and penalizes punctuation soup") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away to the hills",
      "!!! ??? ;;; ::: ...").toDF("text")
    val q = df.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(q(0) > 0 && q(0) <= 1.0)
    assert(q(1) < q(0))
  }

  test("chunkTokens windows overlap correctly and cover every token") {
    // 10 tokens, chunkLen 5, overlap 2 → stride 3 → starts 0,3,6 (9 not
    // taken: it would add < stride new tokens past the prior window)
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(df, "doc_id", "text", chunkLen = 5, overlap = 2)
      .as[(Long, Int, Int, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, 0, 0, 5, "t0 t1 t2 t3 t4"),
      (1L, 1, 3, 5, "t3 t4 t5 t6 t7"),
      (1L, 2, 6, 4, "t6 t7 t8 t9"),
      (2L, 0, 0, 2, "a b"))) // short doc → single (short) chunk
    // consecutive chunks share exactly `overlap` tokens
    val w1 = got(0)._5.split(" ").toSeq
    val w2 = got(1)._5.split(" ").toSeq
    assert(w1.takeRight(2) === w2.take(2))
  }

  test("bigramFluency scores repeated patterns above unseen ones, reproducibly") {
    // corpus: "a b" dominates, so docs made of (a,b) bigrams score higher
    // than docs of rare bigrams. V = 4 distinct tokens {a,b,c,d}.
    val df = Seq(
      (1L, "a b a b a b"), // bigrams ab,ba,ab,ba,ab
      (2L, "c d"),         // one rare bigram
      (3L, "a")            // no bigrams → absent from output
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramFluency(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq(1L, 2L))
    val byId = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L)._1 === 5) // 5 bigrams
    // hand-check: c(ab)=3, c(ba)=2, c(a·)=3, c(b·)=2, c(cd)=1, c(c·)=1, V=4
    // P(b|a)=(3+1)/(3+4)=4/7; P(a|b)=(2+1)/(2+4)=1/2; P(d|c)=(1+1)/(1+4)=2/5
    val exp1 = 3L * math.floor(1e9 * (4.0 / 7.0)).toLong +
      2L * math.floor(1e9 * 0.5).toLong
    assert(byId(1L)._2 === exp1)
    assert(byId(2L) === ((1L, math.floor(1e9 * 0.4).toLong)))
    // per-bigram average: doc 1 is more "typical" than doc 2
    assert(byId(1L)._2.toDouble / 5 > byId(2L)._2.toDouble)
    // deterministic across invocations
    val again = TextAnalysis.bigramFluency(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again === got)
  }

  test("fluencyBuckets ranks fluent docs into head, rare into tail") {
    // reuse the bigramFluency fixture: doc 1 (typical bigrams) must
    // out-rank doc 2 (rare bigram); doc 3 has no bigrams → excluded
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "c d"),
      (3L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.fluencyBuckets(df, "doc_id", "text", nBuckets = 2)
    try {
      val byId = got.as[(Long, Long, Int)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(byId.keySet === Set(1L, 2L))
      assert(byId(1L)._2 === 1 && byId(2L)._2 === 2)
      // score is the integer-floored per-bigram average
      val exp1 = (3L * math.floor(1e9 * (4.0 / 7.0)).toLong +
        2L * math.floor(1e9 * 0.5).toLong) / 5
      assert(byId(1L)._1 === exp1)
    } finally got.unpersist()
  }

  test("q107 (at-scale) agrees ≥90% with q100's oracle-green exact buckets") {
    assume(new java.io.File("/root/testdata/sf0.01/documents.parquet").exists())
    // through the registry, so this asserts about the exact frames the
    // driver records: q100's hash-gated ntile vs q107's production path
    val exact = graft.SparkEntry.queries("q100_fluency_buckets")(
      spark, "/root/testdata/sf0.01")
    val approx = graft.SparkEntry.queries("q107_fluency_buckets_scale")(
      spark, "/root/testdata/sf0.01")
    try {
      val joined = exact.select($"doc_id", $"bucket".as("b_exact"))
        .join(approx.select($"doc_id", $"bucket".as("b_approx")), "doc_id")
      val n = joined.count()
      val agree = joined.filter($"b_exact" === $"b_approx").count()
      assert(n === 500L)
      assert(agree.toDouble / n >= 0.9, s"agreement ${agree.toDouble / n}")
      // all three tiers populated in both forms
      assert(approx.select("bucket").distinct().count() === 3)
    } finally { exact.unpersist(); approx.unpersist() }
  }

  test("q107b (portable) agrees ≥90% with the exact buckets and tiers are full") {
    assume(new java.io.File("/root/testdata/sf0.01/documents.parquet").exists())
    val exact = graft.SparkEntry.queries("q100_fluency_buckets")(
      spark, "/root/testdata/sf0.01")
    val portable = graft.SparkEntry.queries("q107b_fluency_buckets_portable")(
      spark, "/root/testdata/sf0.01")
    try {
      val joined = exact.select($"doc_id", $"bucket".as("b_exact"),
          $"score_fp".as("s_exact"))
        .join(portable.select($"doc_id", $"bucket".as("b_port"),
          $"score_fp".as("s_port")), "doc_id")
      val n = joined.count()
      assert(n === 500L)
      // identical integer scores — only thresholds may differ
      assert(joined.filter($"s_exact" =!= $"s_port").count() === 0L)
      val agree = joined.filter($"b_exact" === $"b_port").count()
      assert(agree.toDouble / n >= 0.9, s"agreement ${agree.toDouble / n}")
      assert(portable.select("bucket").distinct().count() === 3)
      // deterministic: a re-run reproduces the exact assignment
      val again = graft.SparkEntry.queries("q107b_fluency_buckets_portable")(
        spark, "/root/testdata/sf0.01")
      try assert(again.orderBy("doc_id").collect().toSeq ===
        portable.orderBy("doc_id").collect().toSeq)
      finally again.unpersist()
    } finally { exact.unpersist(); portable.unpersist() }
  }

  test("repetitionProfile: hand-checked counters and ratios") {
    val df = Seq(
      (1L, "a a b"),          // 3 words, 2 distinct, top word a=2; bigrams: "a a","a b" → top 1
      (2L, "x y x y x y"),    // 6 words, 2 distinct, top 3; bigrams: xy,yx,xy,yx,xy → top 3 of 5
      (3L, "solo"),           // 1 word: no bigrams, ratio 0 by definition
      (4L, "")                // empty → dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionProfile(df, "doc_id", "text")
      .as[(Long, Int, Int, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L))
    assert(got(0) === ((1L, 3, 2, 2.0 / 3, 1.0 / 3, 1.0 / 2)))
    assert(got(1) === ((2L, 6, 2, 0.5, 4.0 / 6, 3.0 / 5)))
    assert(got(2) === ((3L, 1, 1, 1.0, 0.0, 0.0)))
  }

  test("repetitionProfile flags a repetitious doc over a diverse one") {
    val rep = (1 to 50).map(_ => "spam spam").mkString(" ")
    val div = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, rep), (2L, div)).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionProfile(df, "doc_id", "text")
      .as[(Long, Int, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m(1L)._4 === 1.0)      // every word is "spam"
    assert(m(1L)._6 === 1.0)      // every bigram is "spam spam"
    assert(m(2L)._4 === 1.0 / 100)
    assert(m(2L)._5 === 0.0)      // all distinct
  }

  test("redactPii scrubs planted emails, IPs and phones with exact counts") {
    val df = Seq(
      (1L, "mail bob.smith+x@ex-ample.org and 10.0.255.3 then 415-555-1234 ok"),
      (2L, "no pii here, just text 12345"),
      (3L, "two mails a@b.co c@d.io and 1.2.3.4 5.6.7.8")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "doc_id", "text")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    assert(got(0)._2 === "mail <EMAIL> and <IP> then <PHONE> ok")
    assert((got(0)._3, got(0)._4, got(0)._5) === ((1, 1, 1)))
    assert(got(1)._2 === "no pii here, just text 12345")
    assert((got(1)._3, got(1)._4, got(1)._5) === ((0, 0, 0)))
    assert(got(2)._2 === "two mails <EMAIL> <EMAIL> and <IP> <IP>")
    assert((got(2)._3, got(2)._4, got(2)._5) === ((2, 2, 0)))
  }

  test("htmlToText: strips script/style/comments/tags, keeps block structure") {
    val html = "<html><head><title>My Title</title>" +
      "<style>p { color: red }</style>" +
      "<script>if (a < b && c > d) { alert(\"x\"); }</script></head>" +
      "<body><h1>Head</h1><!-- secret --><p>first para</p>" +
      "<P>second   para</P><div>a<br>b<br/>c<br />d</div></body></html>"
    val df = Seq((1L, html)).toDF("doc_id", "text")
    val got = df.select(TextAnalysis.htmlToText(col("text")))
      .as[String].head()
    assert(got === "My Title\nHead\nfirst para\nsecond para\na\nb\nc\nd")
  }

  test("htmlToText: entities decode one level, &amp; last") {
    val df = Seq(
      (1L, "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"),
      (2L, "<p>double &amp;lt;escaped&amp;gt;</p>"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.htmlToText(col("text")).as("t"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some("A & B <tag> \"q\" 's' end"))
    assert(got(2L) === Some("double &lt;escaped&gt;")) // NOT "<escaped>"
    assert(got(3L) === None) // NULL in, NULL out
  }

  test("htmlToText: tag-free text passes through with whitespace collapsed") {
    val df = Seq((1L, "  plain\t text,  no  markup \r\n here  "))
      .toDF("doc_id", "text")
    val got = df.select(TextAnalysis.htmlToText(col("text")))
      .as[String].head()
    assert(got === "plain text, no markup\nhere")
  }

  test("charEntropyFp: closed-form anchors (uniform=ln k, constant=0)") {
    val df = Seq(
      (1L, "abcd"),        // uniform over 4 chars -> ln 4
      (2L, "aaaa"),        // single char -> 0
      (3L, "AB  ab"),      // normalizes to "ab ab": {a:2,b:2,' ':1}, n=5
      (4L, ""),            // empty -> NULL
      (5L, null.asInstanceOf[String])) // NULL -> NULL
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.charEntropyFp(col("text")).as("e"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(math.floor(math.log(4.0) * 1e6).toLong))
    assert(got(2L) === Some(0L))
    val h5 = (2.0 * -math.log(2.0 / 5) * 2 + 1.0 * -math.log(1.0 / 5)) / 5
    assert(got(3L) === Some(math.floor(h5 * 1e6).toLong))
    assert(got(4L) === None)
    assert(got(5L) === None)
  }

  test("entropyGate: repetitive low, gibberish high, natural in band") {
    val boiler = ("na" * 200) + " batman"               // low entropy
    val natural = "the quick brown fox jumps over the lazy dog and then " +
      "runs back home across the wide green field before sunset tonight"
    val mash = ('!' to '~').map(_.toString).mkString    // 94 distinct chars
    val df = Seq((1L, boiler), (2L, natural), (3L, mash), (4L, ""))
      .toDF("doc_id", "text")
    val rows = TextAnalysis
      .entropyGate(df, "doc_id", "text", loFp = 2500000L, hiFp = 3500000L)
      .as[(Long, Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._3.get < 2500000L && !rows(1L)._4)
    assert(rows(2L)._3.get >= 2500000L && rows(2L)._3.get <= 3500000L
      && rows(2L)._4)
    assert(rows(3L)._3.get > 3500000L && !rows(3L)._4)
    assert(rows(4L)._3 === None && !rows(4L)._4)        // NULL fails gate
    assert(rows(4L)._2 === 0L)
    val iae = intercept[IllegalArgumentException] {
      TextAnalysis.entropyGate(df, "doc_id", "text", 10L, 5L)
    }
    assert(iae.getMessage.contains("band is empty"))
  }

  test("winnowFingerprints: window coverage, the shared-substring " +
    "guarantee, short-doc edges, determinism") {
    val k = 5; val w = 4
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different words appear in this one here"),
      // shares a >= k+w-1 char substring with doc 1
      (3L, "prefix junk quick brown fox jumps suffix junk"),
      (4L, "abc"),        // shorter than k: nothing
      (5L, "abcdef"))     // k <= len < k+w-1: one clamped window
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect()
    val byDoc = got.groupBy(_._1)
    // the winnowing guarantee: every w-window of gram positions holds
    // at least one selected position
    val n1 = docs.filter($"doc_id" === 1)
      .select(length(TextAnalysis.normalizeText($"text")) - (k - 1))
      .as[Int].head()
    val pos1 = byDoc(1L).map(_._2).toSet
    (1 to (n1 - w + 1)).foreach { s =>
      assert((s until s + w).exists(j => pos1.contains(j.toLong)),
        s"window starting at $s has no fingerprint")
    }
    // shared >= k+w-1 substring => at least one shared fingerprint HASH
    val shared = byDoc(1L).map(_._3).toSet & byDoc(3L).map(_._3).toSet
    assert(shared.nonEmpty)
    // unrelated docs share nothing
    assert((byDoc(1L).map(_._3).toSet & byDoc(2L).map(_._3).toSet).isEmpty)
    assert(!byDoc.contains(4L))
    assert(byDoc(5L).length === 1) // single clamped window, one pick
    // deterministic under repartition
    val again = TextAnalysis.winnowFingerprints(
        docs.repartition(7), "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect()
    assert(again.sorted.toSeq === got.sorted.toSeq)
  }

  test("winnowMatches localizes the shared region and suppresses noise") {
    val corpus = Seq(
      // doc 1 embeds the benchmark sentence verbatim mid-text
      (1L, "alpha beta gamma delta the quick brown fox jumps over the " +
        "lazy dog tonight epsilon zeta eta theta"),
      (2L, "completely unrelated words appear in this document here " +
        "nothing shared at all with anything")).toDF("doc_id", "text")
    val bench = Seq(
      (900L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("bench_id", "text")
    val k = 5; val w = 4
    val got = graft.dedup.Dedup.winnowMatches(
        corpus, "doc_id", "text", bench, "bench_id", "text",
        k = k, w = w, minSharedFps = 2, maxBenchFpFreq = 64L)
      .collect()
    assert(got.length === 1, s"expected one localized pair, got " +
      got.mkString(", "))
    val r = got(0)
    assert(r.getAs[Long]("doc_id") === 1L &&
      r.getAs[Long]("bench_id") === 900L)
    // the doc-side span must sit INSIDE the embedded region: the
    // benchmark text starts at normalized position 25 ("alpha beta
    // gamma delta " = 24 chars + 1) and runs 51 chars
    val lo = r.getAs[Long]("doc_lo"); val hi = r.getAs[Long]("doc_hi")
    assert(lo >= 25 && hi <= 25 + 51 - 1, s"span [$lo,$hi] outside region")
    // the bench-side span covers most of the benchmark text
    assert(r.getAs[Long]("bench_lo") >= 1 &&
      r.getAs[Long]("bench_hi") <= 51)
    assert(r.getAs[Long]("n_shared_fps") >= 2)
  }

  test("winnowMatches fractional cap drops fps common across the benchmark") {
    // two bench docs with IDENTICAL text (a duplicated benchmark
    // item): every fingerprint carries doc-frequency 2/2 = 1.0 > 0.5
    // → dropped under the fractional cap, so doc 1 reports no pair.
    // (Differently-framed copies would keep their boundary-window
    // selections — winnowing self-synchronization holds only w+k away
    // from the edges — which is exactly the tail the proportion rule
    // is meant to keep, so identical copies are the crisp fixture.)
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = Seq(
      (1L, s"alpha beta gamma delta $shared epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, shared), (901L, shared))
      .toDF("bench_id", "text")
    def run(frac: Option[Double]) = graft.dedup.Dedup.winnowMatches(
        corpus, "doc_id", "text", bench, "bench_id", "text",
        k = 5, w = 4, minSharedFps = 2, maxBenchFpFreq = 64L,
        maxBenchFpDocFrac = frac)
      .collect()
    // absolute cap (64 rows) keeps the common fps → both pairs report
    assert(run(None).length === 2)
    // frac 0.5 with 2 bench docs: cap = 1 carrying doc — the shared
    // sentence's fps (in both) die; nothing else matches
    assert(run(Some(0.5)).isEmpty)
    // frac 1.0 admits everything again
    assert(run(Some(1.0)).length === 2)
  }

  test("winnowDecontaminate cuts the matched region, keeps the rest, " +
    "and passes untouched docs through") {
    val embedded = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = Seq(
      (1L, s"alpha beta gamma delta $embedded epsilon zeta eta theta"),
      (2L, "completely unrelated words appear in this document here " +
        "nothing shared at all with anything")).toDF("doc_id", "text")
    val bench = Seq((900L, embedded)).toDF("bench_id", "text")
    val got = graft.dedup.Dedup.winnowDecontaminate(
        corpus, "doc_id", "text", bench, "bench_id", "text",
        k = 5, w = 4, minSharedFps = 2, maxBenchFpFreq = 64L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: the embedded sentence is gone, the frame survives
    val c1 = got(1L)
    val t1 = c1.getAs[String]("text_clean")
    assert(!t1.contains("quick brown fox"), s"region not cut: $t1")
    assert(t1.startsWith("alpha beta gamma delta"),
      s"prefix lost: $t1")
    assert(t1.endsWith("epsilon zeta eta theta") ||
      t1.contains("zeta eta theta"), s"suffix lost: $t1")
    assert(c1.getAs[Long]("n_spans") >= 1)
    assert(c1.getAs[Long]("n_removed_chars") > 0)
    // attrition reconciles: cleaned length + removed = normalized length
    val norm1 = ("alpha beta gamma delta " + embedded +
      " epsilon zeta eta theta")
    assert(t1.length + c1.getAs[Long]("n_removed_chars") === norm1.length)
    // doc 2: untouched — normalized text back, zero attrition
    val c2 = got(2L)
    assert(c2.getAs[Long]("n_spans") === 0)
    assert(c2.getAs[Long]("n_removed_chars") === 0)
    assert(c2.getAs[String]("text_clean").startsWith("completely"))
  }

  test("winnowFingerprintsRaw: hash/pos parity with the normalized " +
    "variant, raw spans land on the original text") {
    val docs = Seq(
      (1L, "The   Quick\tBrown Fox jumps\nover the lazy DOG tonight"),
      (2L, "  leading and trailing whitespace everywhere here  "),
      // lowercase EXPANSION (İ → i + combining dot): the alignment
      // path where |lowered| != |raw|
      (3L, "İstanbul kebab shops open late tonight always"))
      .toDF("doc_id", "text")
    val k = 5; val w = 4
    val norm = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val raw = TextAnalysis
      .winnowFingerprintsRaw(docs, "doc_id", "text", k, w)
      .select("doc_id", "pos", "fp").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(raw === norm, "raw variant must select identical (pos, fp)")
    // every raw span must slice out of the ORIGINAL text a substring
    // whose normalization equals the selected normalized k-gram
    val texts = docs.as[(Long, String)].collect().toMap
    TextAnalysis.winnowFingerprintsRaw(docs, "doc_id", "text", k, w)
      .as[(Long, Long, Long, Long, Long)].collect().foreach {
        case (id, pos, _, rlo, rhi) =>
          val t = texts(id)
          assert(rlo >= 1 && rhi <= t.codePointCount(0, t.length),
            s"doc $id span [$rlo,$rhi] out of raw range")
          val rawSlice = {
            val a = t.offsetByCodePoints(0, (rlo - 1).toInt)
            val b = t.offsetByCodePoints(0, rhi.toInt)
            t.substring(a, b)
          }
          val normDoc = docs.filter($"doc_id" === id)
            .select(TextAnalysis.normalizeText($"text")).as[String].head()
          val gram = normDoc.substring((pos - 1).toInt,
            (pos - 1 + k).toInt)
          val sliceNorm = docs.sparkSession.range(1)
            .select(TextAnalysis.normalizeText(lit(rawSlice)))
            .as[String].head()
          // edge spaces: a gram starting/ending on a collapsed run
          // maps to the whole raw run (greedy), and re-normalizing
          // the slice standalone TRIMS that edge — compare trimmed
          assert(sliceNorm === gram.trim,
            s"doc $id pos $pos: raw slice '$rawSlice' normalizes to " +
              s"'$sliceNorm', selected gram '$gram'")
      }
  }

  test("winnowDecontaminateRaw: untouched docs round-trip " +
    "byte-identical, touched docs keep original bytes minus the span") {
    val embedded = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = Seq(
      // mixed case + irregular whitespace AROUND the quote: only the
      // quote may be cut, everything else byte-exact
      (1L, s"Alpha  BETA\tgamma delta $embedded epsilon Zeta eta theta"),
      (2L, "Completely UNRELATED words\t\tappear in THIS document " +
        "here nothing shared at all with anything  "),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bench = Seq((900L, embedded)).toDF("bench_id", "text")
    val got = graft.dedup.Dedup.winnowDecontaminateRaw(
        corpus, "doc_id", "text", bench, "bench_id", "text",
        k = 5, w = 4, minSharedFps = 2, maxBenchFpFreq = 64L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: quote gone, frame keeps ORIGINAL casing and whitespace
    val c1 = got(1L)
    val t1 = c1.getAs[String]("text_clean")
    assert(!t1.toLowerCase.contains("quick brown fox"),
      s"region not cut: $t1")
    assert(t1.startsWith("Alpha  BETA\tgamma delta"),
      s"raw prefix altered: '$t1'")
    assert(t1.endsWith("Zeta eta theta") || t1.contains("Zeta eta"),
      s"raw suffix altered: '$t1'")
    assert(c1.getAs[Long]("n_spans") >= 1)
    val raw1 = s"Alpha  BETA\tgamma delta $embedded epsilon Zeta eta theta"
    assert(t1.length + c1.getAs[Long]("n_removed_chars") === raw1.length)
    // doc 2: BYTE-IDENTICAL round-trip (tabs, trailing spaces, casing)
    val c2 = got(2L)
    assert(c2.getAs[String]("text_clean") ===
      "Completely UNRELATED words\t\tappear in THIS document " +
        "here nothing shared at all with anything  ")
    assert(c2.getAs[Long]("n_spans") === 0L)
    assert(c2.getAs[Long]("n_removed_chars") === 0L)
    // doc 3: NULL stays NULL (never coalesced on the output path)
    val c3 = got(3L)
    assert(c3.isNullAt(c3.fieldIndex("text_clean")))
    assert(c3.getAs[Long]("n_spans") === 0L)
  }

  test("winnowSelfMatches: shared regions pair up, boilerplate fps are capped away") {
    val header = "standard boilerplate navigation header text block"
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    // ALL six docs share the header (doc-freq 6 > cap 4 → its fps
    // die); only docs 1 and 2 also share the quote
    val docs = Seq(
      (1L, s"$header alpha beta $quote gamma delta"),
      (2L, s"$header epsilon zeta $quote eta theta"),
      (3L, s"$header zucchini quasar mellow fjord blizzard kayak"),
      (4L, s"$header orchid tundra velvet prism nomad cascade"),
      (5L, s"$header ember lagoon crystal bonsai zephyr mosaic"),
      (6L, s"$header falcon indigo marble sprocket juniper quill"))
      .toDF("doc_id", "text")
    val got = graft.dedup.Dedup.winnowSelfMatches(docs, "doc_id", "text",
        k = 5, w = 4, minSharedFps = 2, maxFpDocs = 4L)
      .collect()
    assert(got.length === 1, s"expected exactly the (1,2) pair, got " +
      got.mkString(", "))
    assert(got(0).getAs[Long]("doc_a") === 1L &&
      got(0).getAs[Long]("doc_b") === 2L)
    assert(got(0).getAs[Long]("n_shared_fps") >= 2)
    // raising the cap to 6 admits the header fps → all 15 pairs report
    val loose = graft.dedup.Dedup.winnowSelfMatches(docs, "doc_id",
        "text", k = 5, w = 4, minSharedFps = 2, maxFpDocs = 6L)
      .collect()
    assert(loose.length === 15)
  }

  test("winnowContamination: embedded quote scores high, clean doc zero, sub-k doc absent") {
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = Seq(
      (1L, s"alpha beta gamma delta $quote epsilon zeta eta theta"),
      (2L, "completely unrelated words appear in this document here " +
        "nothing shared at all with anything"),
      (3L, "abc")) // shorter than k: no fingerprints, no row
      .toDF("doc_id", "text")
    val bench = Seq((900L, quote)).toDF("bench_id", "text")
    val got = graft.dedup.Dedup.winnowContamination(corpus, "doc_id",
        "text", bench, "bench_id", "text", k = 5, w = 4,
        maxBenchFpFreq = 64L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!got.contains(3L))
    val c1 = got(1L)
    assert(c1.getAs[Long]("n_matched_fps") >= 2)
    assert(c1.getAs[Double]("contamination_frac") > 0.0 &&
      c1.getAs[Double]("contamination_frac") < 1.0)
    assert(c1.getAs[Long]("n_fps") >= c1.getAs[Long]("n_matched_fps"))
    val c2 = got(2L)
    assert(c2.getAs[Long]("n_matched_fps") === 0L)
    assert(c2.getAs[Double]("contamination_frac") === 0.0)
  }

  test("luhnValid: known PANs pass, off-by-one fails, length band binds") {
    val df = Seq(
      (1L, "4111111111111111"),  // canonical valid test PAN
      (2L, "4111111111111112"),  // check digit off by one
      (3L, "5500005555555559"),  // valid MC-shaped test PAN
      (4L, "49927398716"),       // Luhn-valid but 11 digits: too short
      (5L, "4111111111111111111111")) // 22 digits: too long
      .toDF("id", "d")
    val got = df.select(col("id"),
        TextAnalysis.luhnValid(col("d")).as("v"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> false))
  }

  test("creditCardExposure: separators normalized, Luhn splits " +
    "candidates, digit runs inside words never match") {
    val docs = Seq(
      (1L, "pay 4111-1111-1111-1111 or 4111 1111 1111 1112 today"),
      (2L, "order token1234567890123456 is not a card"),
      (3L, "no numbers at all"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.creditCardExposure(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) === ((2L, 1L))) // two candidates, one Luhn-valid
    assert(got(2L) === ((0L, 0L))) // \b blocks letter-adjacent digits
    assert(got(3L) === ((0L, 0L)))
    assert(got(4L) === ((0L, 0L)))
  }
}
