package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("upsert keeps the highest-version row per key; unseen keys insert") {
    val base = Seq((1L, "one", 1L), (2L, "two", 1L), (3L, "three", 1L))
      .toDF("id", "text", "version")
    val updates = Seq((2L, "two-v2", 2L), (9L, "nine", 2L))
      .toDF("id", "text", "version")
    val got = Curation.upsert(base, updates, Seq("id"), col("version"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "one", 1L), (2L, "two-v2", 2L),
      (3L, "three", 1L), (9L, "nine", 2L)))
  }

  test("decontaminate drops normalized-content matches only") {
    val corpus = Seq((1L, "keep me"), (2L, "Remove   Me"), (3L, "also kept"))
      .toDF("doc_id", "text")
    // benchmark text differs in case and whitespace — only normalized
    // fingerprints can catch it
    val benchmark = Seq("remove me").toDF("text")
    val got = Curation.decontaminate(corpus, benchmark, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 3L))
  }

  test("ngramDecontaminate catches benchmark text QUOTED inside larger docs") {
    val quote = (1 to 13).map(i => s"bench$i").mkString(" ") // one full 13-gram
    val corpus = Seq(
      (1L, s"a clean page about something else entirely " +
        (1 to 13).map(i => s"filler$i").mkString(" ")),
      (2L, s"intro paragraph then $quote and a conclusion"), // partial inclusion
      (3L, quote), // exact copy
      (4L, (1 to 12).map(i => s"bench$i").mkString(" ")) // only 12 words — no 13-gram
    ).toDF("doc_id", "text")
    val benchmark = Seq(quote).toDF("text")
    val got = Curation.ngramDecontaminate(corpus, benchmark, "text", "doc_id", n = 13)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 2 and 3 share the benchmark 13-gram; 1 and 4 survive — note the
    // exact-fingerprint decontaminate would MISS doc 2
    assert(got === Seq(1L, 4L))
    val fpOnly = Curation.decontaminate(corpus, benchmark, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fpOnly === Seq(1L, 2L, 4L)) // the gap this operator closes
  }

  test("spanDecontaminate excises quoted benchmark passages, keeps the page") {
    val quote = (1 to 6).map(i => s"bench$i").mkString(" ")
    val corpus = Seq(
      (1L, "a clean page about something else entirely here now"),
      (2L, s"intro words then $quote and a conclusion"), // quoting page
      (3L, quote),                                       // IS benchmark text
      (4L, (1 to 5).map(i => s"bench$i").mkString(" "))  // 5 words — no 6-gram
    ).toDF("doc_id", "text")
    val benchmark = Seq(quote).toDF("text")
    val got = Curation.spanDecontaminate(corpus, benchmark, "text", "doc_id", n = 6)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got(0) === ((1L, "a clean page about something else entirely here now", 9L, 0L)))
    // the quote is excised, the page survives — q86's whole-doc drop
    // would have lost the 7 surrounding words
    assert(got(1) === ((2L, "intro words then and a conclusion", 6L, 6L)))
    assert(got(2) === ((3L, "", 0L, 6L)))
    assert(got(3) === ((4L, "bench1 bench2 bench3 bench4 bench5", 5L, 0L)))
  }

  test("packSequences assigns start-position sequence ids per shard") {
    val docs = Seq(
      ("en", 1L, 600L), ("en", 2L, 500L), ("en", 3L, 100L), ("en", 4L, 900L),
      ("de", 10L, 1500L), ("de", 11L, 700L))
      .toDF("lang", "doc_id", "n_tokens")
    val got = Curation.packSequences(docs, "lang", "doc_id", col("n_tokens"), 1000)
      .select("lang", "doc_id", "seq_id", "seq_offset")
      .orderBy("lang", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      // de: starts at 0 and 1500
      ("de", 10L, 0L, 0L), ("de", 11L, 1L, 500L),
      // en: starts at 0, 600, 1100, 1200
      ("en", 1L, 0L, 0L), ("en", 2L, 0L, 600L),
      ("en", 3L, 1L, 100L), ("en", 4L, 1L, 200L)))
  }

  test("packSequences offsets stay inside the sequence capacity") {
    val docs = (1 to 200).map(i => ("s", i.toLong, (i % 37).toLong + 1L))
      .toDF("lang", "doc_id", "n_tokens")
    val out = Curation.packSequences(docs, "lang", "doc_id", col("n_tokens"), 64)
    assert(out.filter(col("seq_offset") < 0 || col("seq_offset") >= 64).count() === 0)
    // seq ids are non-decreasing in pack order
    val ids = out.orderBy("doc_id").select("seq_id").as[Long].collect().toSeq
    assert(ids === ids.sorted)
  }

  // --- property-based invariants (same minimal seeded-sample forAll as
  // graft.prep.PropertiesSpec — the scalatestplus bridge isn't cached) --

  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def forAllG[A](g: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(271L + i)).foreach(body)
    }

  private val snapshotGen: Gen[List[(Long, String, Long)]] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, for {
      id <- Gen.chooseNum(0L, 30L)
      txt <- Gen.identifier
      v <- Gen.chooseNum(1L, 5L)
    } yield (id, txt, v)))

  test("property: upsert is idempotent and keeps max version per key") {
    forAllG(snapshotGen) { rows =>
      // make (key, version) unique so keep-last is well-defined
      val uniq = rows.groupBy(r => (r._1, r._3)).map(_._2.head).toSeq
      val df = uniq.toDF("id", "text", "version")
      val base = df.filter(col("version") <= 2)
      val upd = df.filter(col("version") > 2)
      val merged = Curation.upsert(base, upd, Seq("id"), col("version"))
      // one row per key, carrying that key's max version
      val expect = uniq.groupBy(_._1).map { case (k, g) =>
        (k, g.map(_._3).max)
      }.toSet
      val got = merged.select("id", "version").as[(Long, Long)].collect().toSet
      assert(got === expect)
      // idempotent: upserting the merged result with no updates is a no-op
      val again = Curation.upsert(merged, merged.limit(0), Seq("id"), col("version"))
      assert(again.exceptAll(merged).count() === 0)
    }
  }

  test("property: pack offsets+lengths tile each shard's token stream") {
    val shardGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 500L)))
    forAllG(shardGen) { toks =>
      val docs = toks.zipWithIndex.map { case (t, i) => ("s", i.toLong, t) }
        .toDF("lang", "doc_id", "n_tokens")
      val out = Curation.packSequences(docs, "lang", "doc_id", col("n_tokens"), 1024)
        .orderBy("doc_id")
        .select("seq_id", "seq_offset", "n_tokens")
        .as[(Long, Long, Long)].collect().toSeq
      // reconstruct each doc's absolute start from (seq_id, seq_offset):
      // they must exactly tile the cumulative token stream
      var cum = 0L
      out.foreach { case (seq, off, n) =>
        assert(seq * 1024 + off === cum, s"gap/overlap at cum=$cum")
        cum += n
      }
    }
  }

  test("mixtureSample flattens the head: low-resource groups keep a higher rate") {
    // 900 "en" docs vs 100 "zh" docs, budget 300. Temperature-0.5 shares:
    // sqrt(900)=30, sqrt(100)=10 → en gets 3/4 of budget (225 of 900 =
    // 25%), zh gets 1/4 (75 of 100 = 75%) — zh's rate must be higher.
    val docs = ((1 to 900).map(i => (i.toLong, "en")) ++
      (1001 to 1100).map(i => (i.toLong, "zh"))).toDF("doc_id", "lang")
    val got = Curation.mixtureSample(docs, "lang", col("doc_id"), budget = 300)
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    val enRate = byLang("en").toDouble / 900
    val zhRate = byLang("zh").toDouble / 100
    assert(zhRate > enRate * 2, s"zh=$zhRate en=$enRate")
    // md5-uniformity keeps realized counts near expectation
    assert(math.abs(byLang("en") - 225) < 60, s"en=${byLang("en")}")
    assert(math.abs(byLang("zh") - 75) < 30, s"zh=${byLang("zh")}")
    // deterministic: same inputs → identical sample
    val again = Curation.mixtureSample(docs, "lang", col("doc_id"), budget = 300)
    assert(again.orderBy("doc_id").collect().toSeq ===
      got.orderBy("doc_id").collect().toSeq)
  }

  test("domainMixtureSample rebalances by registrable domain from raw URLs") {
    // 800 docs on one hot blog host (two literal spellings that
    // canonicalize to the same registrable domain) vs 40 on a tail
    // domain; the hot domain must be flattened, the tail kept high.
    val docs = ((1 to 400).map(i =>
        (i.toLong, s"HTTPS://WWW.Hot.Example.COM/p/$i?utm_source=x")) ++
      (401 to 800).map(i => (i.toLong, s"http://hot.example.com:80/p/$i")) ++
      (1001 to 1040).map(i => (i.toLong, s"https://tail.example.co.uk/p/$i")))
      .toDF("doc_id", "url")
    val got = Curation.domainMixtureSample(docs, "doc_id", "url", budget = 200)
    val byDom = got.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDom.keySet === Set("example.com", "example.co.uk"))
    val hotRate = byDom("example.com").toDouble / 800
    val tailRate = byDom("example.co.uk").toDouble / 40
    assert(tailRate > hotRate * 2, s"tail=$tailRate hot=$hotRate")
    // deterministic under the md5 row hash
    val again = Curation.domainMixtureSample(docs, "doc_id", "url", budget = 200)
    assert(again.orderBy("doc_id").collect().toSeq ===
      got.orderBy("doc_id").collect().toSeq)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged incl. null text") {
    import graft.text.TextAnalysis
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone"),
      (4L, null.asInstanceOf[String]), (5L, "was")).toDF("doc_id", "text")
    val b = Seq((1L, "  same "), (2L, "new"), (6L, "fresh"),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Curation.snapshotDiff(a, b, "doc_id",
      TextAnalysis.fingerprint(col("text")))
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "unchanged", // whitespace-normalized fingerprints agree
      2L -> "changed",
      3L -> "removed",
      4L -> "unchanged", // null text in both snapshots is NOT a change
      5L -> "changed",   // text -> null IS a change
      6L -> "added"))
  }

  test("incrementalReprocess equals full recompute and only touches the delta") {
    import graft.text.TextAnalysis
    val a = Seq((1L, "keep me around ok"), (2L, "old version"),
      (3L, "gone soon"), (4L, "stable row")).toDF("doc_id", "text")
    val b = Seq((1L, "keep me around ok"), (2L, "a longer new version"),
      (4L, "stable row"), (9L, "brand new doc")).toDF("doc_id", "text")
    val processed = scala.collection.mutable.Set.empty[Long]
    def stage(df: org.apache.spark.sql.DataFrame) = {
      // record which keys the expensive stage actually sees
      processed ++= df.select("doc_id").as[Long].collect()
      df.select(col("doc_id"), length(col("text")).cast("long").as("len"))
    }
    val aResult = Seq((1L, 17L), (2L, 11L), (3L, 9L), (4L, 10L))
      .toDF("doc_id", "len")
    val got = Curation.incrementalReprocess(aResult, a, b, "doc_id",
      TextAnalysis.fingerprint(col("text")), stage)
      .as[(Long, Long)].collect().toSet
    // identical to running the stage on all of B: doc 2 rescored from
    // B's text (20, not the stale 11), doc 3 gone, doc 9 added
    assert(got === Set((1L, 17L), (2L, 20L), (4L, 10L), (9L, 13L)))
    // the stage saw ONLY the added/changed keys — the whole point
    assert(processed.toSet === Set(2L, 9L))
  }

  test("scoreMixtureRates allocates the budget by score share") {
    // equal-sized groups, 3:1 score ratio → exactly 3:1 rates; a group
    // with no score row is dropped (coverage is the caller's contract)
    val docs = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 200).map(i => (i.toLong, "b")) ++
      (201 to 210).map(i => (i.toLong, "unscored"))).toDF("doc_id", "g")
    val scores = Seq(("a", 3000000L), ("b", 1000000L)).toDF("g", "score_fp")
    val rates = Curation.scoreMixtureRates(docs, "g", scores, budget = 80)
      .as[(String, Double)].collect().toMap
    assert(rates.keySet === Set("a", "b"))
    // rate(a) = 80 * 3e6/4e6 / 100 = 0.6; rate(b) = 80 * 1e6/4e6 / 100 = 0.2
    assert(math.abs(rates("a") - 0.6) < 1e-12, rates("a"))
    assert(math.abs(rates("b") - 0.2) < 1e-12, rates("b"))
    val kept = Curation.scoreMixtureSample(docs, "g", col("doc_id"), scores, 80)
    assert(kept.filter(col("g") === "unscored").count() === 0L)
    // deterministic md5 decision: re-run reproduces the exact set
    val again = Curation.scoreMixtureSample(docs, "g", col("doc_id"), scores, 80)
    assert(again.orderBy("doc_id").collect().toSeq ===
      kept.orderBy("doc_id").collect().toSeq)
    // roughly 3:1 kept ratio (law-of-large-numbers slack on 100 rows)
    val byG = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG("a") > byG("b"), byG.toString)
  }

  test("scoreMixtureRates clips a dominant score's rate at 1.0") {
    val docs = ((1 to 4).map(i => (i.toLong, "tiny")) ++
      (5 to 104).map(i => (i.toLong, "big"))).toDF("doc_id", "g")
    val scores = Seq(("tiny", 900L), ("big", 100L)).toDF("g", "score_fp")
    val rates = Curation.scoreMixtureRates(docs, "g", scores, budget = 50)
      .as[(String, Double)].collect().toMap
    // tiny: 50*0.9/4 = 11.25 → clipped to 1.0
    assert(rates("tiny") === 1.0)
    val kept = Curation.scoreMixtureSample(docs, "g", col("doc_id"), scores, 50)
    assert(kept.filter(col("g") === "tiny").count() === 4L)
  }

  test("mixtureSample keeps every row of a group whose share exceeds its size") {
    // tiny group: budget share 10·sqrt(2)/(sqrt(2)+sqrt(98))... > 2 rows
    // → rate clips at 1.0 and both rows survive
    val docs = ((1 to 98).map(i => (i.toLong, "big")) ++
      Seq((200L, "rare"), (201L, "rare"))).toDF("doc_id", "lang")
    val got = Curation.mixtureSample(docs, "lang", col("doc_id"), budget = 50)
    assert(got.filter(col("lang") === "rare").count() === 2L)
    // sample is a subset of the input
    assert(got.join(docs, Seq("doc_id", "lang"), "left_anti").count() === 0L)
  }

  test("shuffleShards is a deterministic total assignment that breaks input order") {
    val docs = (0L until 512L).toDF("doc_id")
    val a = Curation.shuffleShards(docs, col("doc_id"), numShards = 8, seed = 7L)
    val b = Curation.shuffleShards(docs, col("doc_id"), numShards = 8, seed = 7L)
    assert(a.collect().toSeq === b.collect().toSeq) // same seed → same shards
    val shards = a.groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(shards.keySet.subsetOf((0L until 8L).toSet) && shards.size === 8)
    // roughly balanced (md5 uniformity): no shard more than 2x the mean
    assert(shards.values.max <= 2 * 512 / 8)
    // a different seed reshuffles: assignments must not all coincide
    val c = Curation.shuffleShards(docs, col("doc_id"), numShards = 8, seed = 8L)
    val sameCount = a.select("doc_id", "shard")
      .join(c.select(col("doc_id"), col("shard").as("s2")), "doc_id")
      .filter(col("shard") === col("s2")).count()
    assert(sameCount < 512)
    // sort_key order within a shard is unrelated to doc_id order
    val firstShard = a.filter(col("shard") === 0)
      .orderBy("sort_key").select("doc_id").as[Long].collect().toSeq
    assert(firstShard !== firstShard.sorted)
  }

  test("importanceWeights ranks target-like docs above off-distribution ones") {
    // style A shares its bigrams with the target; style B is disjoint
    def styleA(i: Int): String =
      (0 until 30).map(j => Seq("the", "cat", "sat", "on", "a", "mat")(
        (i + j) % 6)).mkString(" ")
    def styleB(i: Int): String =
      (0 until 30).map(j => s"zz${(i * 13 + j * 5) % 11}").mkString(" ")
    val corpus = ((1L to 5L).map(i => (i, styleA(i.toInt))) ++
      (6L to 10L).map(i => (i, styleB(i.toInt)))).toDF("doc_id", "text")
    val target = (100 to 120).map(i => styleA(i)).toDF("text")
    val w = Curation.importanceWeights(corpus, "doc_id", "text", target, "text",
      buckets = 1 << 12)
    val byDoc = w.select("doc_id", "affinity_fp").as[(Long, Long)]
      .collect().toMap
    val aMin = (1L to 5L).map(byDoc).min
    val bMax = (6L to 10L).map(byDoc).max
    assert(aMin > bMax,
      s"target-like docs must outscore off-distribution ones: $byDoc")
    // target-like docs clear the neutral 1e9 line; disjoint ones don't
    assert(aMin > 1000000000L && bMax < 1000000000L)
    w.unpersist()
    // the resample keeps exactly the target-like half at the default
    // threshold; a doc too short to score is dropped, not kept blindly
    val withShort = corpus.unionAll(Seq((11L, "solo")).toDF("doc_id", "text"))
    val kept = Curation.importanceResample(withShort, "doc_id", "text",
      target, "text", buckets = 1 << 12)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === (1L to 5L).toSeq)
  }

  test("frozen ImportanceModel reproduces the batch scorer bit-for-bit") {
    def styleA(i: Int): String =
      (0 until 30).map(j => Seq("the", "cat", "sat", "on", "a", "mat")(
        (i + j) % 6)).mkString(" ")
    def styleB(i: Int): String =
      (0 until 30).map(j => s"zz${(i * 13 + j * 5) % 11}").mkString(" ")
    val corpus = ((1L to 5L).map(i => (i, styleA(i.toInt))) ++
      (6L to 10L).map(i => (i, styleB(i.toInt)))).toDF("doc_id", "text")
    val target = (100 to 120).map(i => styleA(i)).toDF("text")
    val batch = Curation.importanceWeights(corpus, "doc_id", "text",
      target, "text", buckets = 1 << 12)
      .select("doc_id", "affinity_fp").as[(Long, Long)].collect().toMap
    val m = Curation.trainImportanceModel(corpus, "text", target, "text",
      buckets = 1 << 12)
    val frozen = corpus.select(col("doc_id"),
      Curation.importanceAffinity(col("text"), m).as("affinity_fp"))
      .as[(Long, Long)].collect().toMap
    assert(frozen === batch)
    // short docs score NULL under the frozen model (batch: absent)
    val short = Seq((1L, "solo"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(Curation.importanceAffinity(col("text"), m)).collect()
    assert(short.forall(_.isNullAt(0)))
    // paper-form n ∈ {1,2} union: frozen still reproduces batch, and
    // a single-word doc becomes scoreable
    val batchU = Curation.importanceWeights(corpus, "doc_id", "text",
      target, "text", buckets = 1 << 12, unigrams = true)
      .select("doc_id", "affinity_fp").as[(Long, Long)].collect().toMap
    val mu = Curation.trainImportanceModel(corpus, "text", target, "text",
      buckets = 1 << 12, unigrams = true)
    val frozenU = corpus.select(col("doc_id"),
      Curation.importanceAffinity(col("text"), mu, unigrams = true)
        .as("affinity_fp")).as[(Long, Long)].collect().toMap
    assert(frozenU === batchU)
    assert(batchU !== batch) // unigram evidence changes the scores
    val solo = Seq((1L, "the")).toDF("doc_id", "text")
      .select(Curation.importanceAffinity(col("text"), mu, unigrams = true))
      .collect()
    assert(!solo(0).isNullAt(0))
  }

  test("clusterBalancedSample flattens dominant embedding clusters") {
    def jitter(i: Int): Double = (i % 7) * 0.01
    // one dominant semantic neighborhood (200 points), two sparse ones
    val pts =
      (1L to 200L).map(i => (i, Seq(10.0 + jitter(i.toInt), 0.0))) ++
      (201L to 210L).map(i => (i, Seq(0.0, 10.0 + jitter(i.toInt)))) ++
      (211L to 220L).map(i => (i, Seq(-10.0 - jitter(i.toInt), -10.0)))
    val df = pts.toDF("vec_id", "embedding")
    val kept = Curation.clusterBalancedSample(df, "vec_id", "embedding",
      budget = 25, nClusters = 3)
      .select("vec_id").as[Long].collect().toSet
    val bigKept = kept.count(_ <= 200L) / 200.0
    val sparseKept = kept.count(_ > 200L) / 20.0
    // the dominant cluster is downsampled far below the sparse ones
    assert(bigKept < sparseKept,
      s"dominant kept $bigKept, sparse kept $sparseKept")
    assert(kept.count(_ <= 200L) > 0 && kept.count(_ > 200L) > 0)
    // deterministic under fixed (seed, budget)
    val again = Curation.clusterBalancedSample(df, "vec_id", "embedding",
      budget = 25, nClusters = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("assignFixedCentroids: nearest centroid, first-minimum tie-break") {
    val cents = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0))
    val rows = Seq(
      (1L, Seq(0.1, 0.2)),   // nearest c0
      (2L, Seq(9.0, 1.0)),   // nearest c1
      (3L, Seq(1.0, 9.0)),   // nearest c2
      (4L, Seq(5.0, 0.0)))   // EXACT tie c0/c1 → first wins (c0)
    val got = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Curation.assignFixedCentroids(col("embedding"), cents).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("assignFixedCentroids: malformed vectors surface as cluster -1") {
    val cents = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0))
    val rows = Seq(
      (1L, Seq(0.1, 0.2)),        // well-formed → c0
      (2L, null: Seq[Double]),    // null vector
      (3L, Seq(5.0)))             // shorter than centroid dim
    val got = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Curation.assignFixedCentroids(col("embedding"), cents).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> -1L, 3L -> -1L))
  }

  test("clusterBalancedSampleFixed flattens the dominant fixed cluster") {
    def jitter(i: Int): Double = (i % 7) * 0.01
    val pts =
      (1L to 200L).map(i => (i, Seq(10.0 + jitter(i.toInt), 0.0))) ++
      (201L to 210L).map(i => (i, Seq(0.0, 10.0 + jitter(i.toInt))))
    val df = pts.toDF("vec_id", "embedding")
    val cents = Seq(Seq(10.0, 0.0), Seq(0.0, 10.0))
    val kept = Curation.clusterBalancedSampleFixed(df, "vec_id", "embedding",
      cents, budget = 25)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.count(_ <= 200L) / 200.0 < kept.count(_ > 200L) / 10.0)
  }

  test("contaminationReport counts dirty grams and hit docs per benchmark doc") {
    val words = (0 until 40).map(i => s"w$i")
    val benchText = words.mkString(" ") // 40 words → 28 distinct 13-grams
    val cleanText = (0 until 40).map(i => s"x$i").mkString(" ")
    // corpus doc 1 quotes the benchmark's first 15 words (3 13-grams),
    // doc 2 quotes words 5-25 (8 13-grams + overlap), doc 3 is clean
    val corpus = Seq(
      (1L, ("intro " * 3) + words.take(15).mkString(" ")),
      (2L, words.slice(5, 25).mkString(" ") + (" outro" * 3)),
      (3L, cleanText)).toDF("doc_id", "text")
    val bench = Seq((100L, benchText), (200L, cleanText + " extra tail"))
      .toDF("bench_id", "text")
    val got = Curation.contaminationReport(corpus, bench, "text",
      "doc_id", "bench_id", n = 13)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // bench 100: 28 grams total. doc1 = [intro×3, w0..w14] (18 toks):
    // its pure-w grams are w0..w12, w1..w13, w2..w14 → bench grams
    // 1..3. doc2 = [w5..w24, outro×3] (23 toks): pure-w grams
    // w5..w17 … w12..w24 → bench grams 6..13 (8 of them). Disjoint
    // sets → dirty = 3 + 8 = 11, docs hit = 2.
    assert(got(100L) === ((28L, 11L, 2L)))
    // bench 200 = [x0..x39, extra, tail] (42 toks → 30 grams); corpus
    // doc 3 = x0..x39 contributes its 28 grams, all of which are bench
    // 200 grams 1..28 → dirty = 28, docs hit = 1
    assert(got(200L) === ((30L, 28L, 1L)))
  }

  test("retrievalContaminationAudit: planted quote shares grams, scrambled twin reports zero") {
    // corpus: doc 1 QUOTES the benchmark verbatim inside filler, doc 2
    // shares vocabulary but no 5-gram (paraphrase suspect), docs 3-4
    // are unrelated
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = Seq(
      (1L, s"intro words here $quote and an outro"),
      (2L, "lazy dog fox quick over brown jumps the tonight scrambled"),
      (3L, "entirely different text about spark and catalyst plans"),
      (4L, "another unrelated document mentioning nothing in common"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, quote)).toDF("bench_id", "text")
    val got = Curation.retrievalContaminationAudit(corpus, bench,
      "text", "doc_id", "bench_id", k = 3, n = 5)
      .as[(Long, Long, Int, Long, Long)].collect()
      .sortBy(_._3)
    // BM25 alone cannot tell the verbatim quote from the scrambled
    // bag-of-words doc (it may even rank the shorter scrambled doc
    // higher — length normalization); the OVERLAP column is what
    // separates them: the quoting doc shares 5-grams, the scrambled
    // one reports ZERO — the paraphrase-suspect row the audit exists
    // to surface
    val byDoc = got.map(r => r._2 -> r).toMap
    assert(byDoc.contains(1L) && byDoc.contains(2L),
      s"both suspects must be retrieved: $got")
    assert(byDoc(1L)._5 > 0L, "verbatim quote must share grams")
    assert(byDoc(2L)._5 === 0L, "scrambled doc must report zero overlap")
    // zeros are KEPT — every retrieved pair reports, clean or not
    assert(got.forall(_._1 === 100L))
  }

  test("ImportanceModel save/load roundtrips and scores identically") {
    def styleA(i: Int): String =
      (0 until 30).map(j => Seq("the", "cat", "sat", "on", "a", "mat")(
        (i + j) % 6)).mkString(" ")
    val corpus = (1L to 8L).map(i => (i, styleA(i.toInt))).toDF("doc_id", "text")
    val target = (100 to 110).map(i => styleA(i)).toDF("text")
    val m = Curation.trainImportanceModel(corpus, "text", target, "text",
      buckets = 1 << 12)
    val dir = java.nio.file.Files.createTempDirectory("graft_impmodel_").toString
    Curation.saveImportanceModel(spark, m, dir)
    val back = Curation.loadImportanceModel(spark, dir)
    assert(back.buckets === m.buckets && back.tTotal === m.tTotal &&
      back.rTotal === m.rTotal)
    assert(back.tCnt.toSeq === m.tCnt.toSeq && back.rCnt.toSeq === m.rCnt.toSeq)
    val a = corpus.select(Curation.importanceAffinity(col("text"), m))
      .as[Long].collect().toSeq
    val b = corpus.select(Curation.importanceAffinity(col("text"), back))
      .as[Long].collect().toSeq
    assert(a === b)
  }

  test("writeShuffledShards lays out shard=K dirs with rows in sort_key order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    val docs = (0L until 256L).toDF("doc_id")
    Curation.writeShuffledShards(docs, col("doc_id"), numShards = 4,
      seed = 42L, path = dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs === (0 until 4).map(i => s"shard=$i").toArray.sorted)
    // every row lands in the shard its hash dictates, in sorted order
    // (the partition-dir column reads back as int — align types)
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("sort_key"), col("shard").cast("long").as("shard"))
    val expect = Curation.shuffleShards(docs, col("doc_id"), 4, 42L)
    assert(back.except(expect.select("doc_id", "sort_key", "shard")).count() === 0L)
    assert(expect.select("doc_id", "sort_key", "shard").except(back).count() === 0L)
    import org.apache.spark.sql.functions.{input_file_name, lag}
    import org.apache.spark.sql.expressions.Window
    // read each file in physical order: sort_key must be nondecreasing
    val viol = spark.read.parquet(dir).withColumn("__f", input_file_name())
      .withColumn("__prev", lag(col("sort_key"), 1).over(
        Window.partitionBy(col("__f")).orderBy(monotonically_increasing_id())))
      .filter(col("__prev").isNotNull && col("__prev") > col("sort_key"))
      .count()
    assert(viol === 0L, "rows within a shard file are not in sort_key order")
  }

  test("repeatUpsample: base copies + fractional extra, cap binds, rate 0 drops") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    def fp(rate: Double): Long = (rate * (1 << 24)).toLong
    val rates = Seq(("g0", fp(0.0)), ("g1", fp(0.5)), ("g2", fp(2.0)),
      ("g3", fp(2.8))).toDF("grp", "rate_fp")
    val got = Curation.repeatUpsample(docs, "grp", col("id"), rates,
      maxRepeats = 4)
    val byGrp = got.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    assert(!byGrp.contains("g0")) // rate 0 drops the group
    // g1: Bernoulli 0.5 over 100 rows — between 20 and 80
    assert(byGrp("g1") >= 20L && byGrp("g1") <= 80L)
    assert(byGrp("g2") === 200L) // exactly 2 copies each
    // g3: 2 copies + ~80% a third — strictly more than g2's mass
    assert(byGrp("g3") > 200L && byGrp("g3") <= 300L)
    // copy_no is dense per row: a 2-copy row carries 0 and 1
    val copies = got.filter(col("grp") === "g2")
      .groupBy("id").agg(collect_set(col("copy_no")).as("c"))
      .select("c").as[Seq[Long]].collect()
    assert(copies.forall(_.sorted == Seq(0L, 1L)))
    // the cap binds: maxRepeats = 2 flattens g3 to exactly 2 copies
    val capped = Curation.repeatUpsample(docs, "grp", col("id"), rates,
      maxRepeats = 2).filter(col("grp") === "g3").count()
    assert(capped === 200L)
    // sub-1 rates agree with the Bernoulli mixture family's decision
    val bern = Curation.applyMixtureRates(docs, "grp", col("id"),
      rates.filter(col("grp") === "g1")
        .select(col("grp"), (col("rate_fp") / lit(16777216.0)).as("__rate")))
      .select("id").as[Long].collect().toSet
    val up1 = got.filter(col("grp") === "g1").select("id")
      .as[Long].collect().toSet
    assert(up1 === bern)
    intercept[IllegalArgumentException] {
      Curation.repeatUpsample(docs, "grp", col("id"), rates, maxRepeats = 0)
    }
  }

  test("tokenBudgetSelect: greedy prefix by (score desc, id), exact budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, 3L, 5L), (2L, 2L, 5L), (3L, 2L, 5L), (4L, 1L, 5L))
      .toDF("doc_id", "score_fp", "n_tokens")
    def sel(budget: Long): Set[Long] =
      Curation.tokenBudgetSelect(docs, "doc_id", "score_fp", "n_tokens",
        budget).select("doc_id").as[Long].collect().toSet
    assert(sel(12L) === Set(1L, 2L)) // 5 + 5 fit; the tie doc 3 would hit 15
    assert(sel(15L) === Set(1L, 2L, 3L)) // exact boundary INCLUDES
    assert(sel(4L) === Set.empty) // best doc alone exceeds
    assert(sel(0L) === Set.empty)
    intercept[IllegalArgumentException] {
      Curation.tokenBudgetSelect(docs, "doc_id", "score_fp", "n_tokens", -1L)
    }
    // null score/token rows are unrankable — dropped, never selected
    val withNull = docs.unionByName(Seq(
      (9L, Option.empty[Long], Option(5L)),
      (10L, Option(9L), Option.empty[Long]))
      .toDF("doc_id", "score_fp", "n_tokens"))
    assert(Curation.tokenBudgetSelect(withNull, "doc_id", "score_fp",
      "n_tokens", 12L).select("doc_id").as[Long].collect().toSet
      === Set(1L, 2L))
  }

  test("tokenBudgetSelect two-level form equals the naive global window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 200L).map(i => (i, i % 7, (i % 5) + 1))
      .toDF("doc_id", "score_fp", "n_tokens")
    val budget = 180L
    val got = Curation.tokenBudgetSelect(docs, "doc_id", "score_fp",
      "n_tokens", budget).select("doc_id").as[Long].collect().toSet
    val naive = docs.withColumn("__run",
      sum(col("n_tokens")).over(Window
        .orderBy(col("score_fp").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__run") <= budget)
      .select("doc_id").as[Long].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty && got.size < 200)
  }

  test("curriculumOrder: closed-form ordinal == global-sort ordinal on unequal sources") {
    val rnd = new scala.util.Random(31)
    val docs = (1L to 150L).map { i =>
      // deliberately unequal source sizes (src0 huge, src4 tiny)
      val src = s"src${math.min(rnd.nextInt(6), rnd.nextInt(6))}"
      (i, src, rnd.nextInt(40).toLong)
    }.toDF("doc_id", "source", "diff")
    val got = Curation.curriculumOrder(docs, "doc_id", "source", col("diff"))
      .as[(Long, String, Long, Long, Long)].collect()
    // naive reference: per-source rank, then global (r, source) sort
    val rows = docs.as[(Long, String, Long)].collect()
    val ranked = rows.groupBy(_._2).toSeq.flatMap { case (s, g) =>
      g.sortBy(r => (r._3, r._1)).zipWithIndex
        .map { case ((id, _, d), i) => (id, s, d, i + 1L) }.toSeq
    }
    val expect = ranked.sortBy(r => (r._4, r._2)).zipWithIndex
      .map { case ((id, s, d, r), ord) => (id, s, d, r, ord.toLong) }
      .toSet
    assert(got.toSet === expect)
    // ordinal is dense 0..n-1
    assert(got.map(_._5).sorted.toSeq === (0L until 150L).toSeq)
  }

  test("curriculumOrder: first cycle interleaves every source; no global sort in plan") {
    val docs = (1L to 60L).map(i => (i, s"s${i % 4}", i % 9))
      .toDF("doc_id", "source", "diff")
    val got = Curation.curriculumOrder(docs, "doc_id", "source", col("diff"))
    // ordinals 0..3 cover all 4 sources (round-robin head)
    val head = got.filter(col("ordinal") < 4).select("source")
      .as[String].collect().toSet
    assert(head === Set("s0", "s1", "s2", "s3"))
    // the scale claim: no single-partition (global-sort) exchange
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global exchange found in plan:\n$plan")
  }
}
