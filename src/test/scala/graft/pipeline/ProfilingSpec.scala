package graft.pipeline

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profileNumeric: exact counts, ranges and fixed-point mean, nulls excluded") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.25), (2.0, 10.25), (2.0, null), (null, 0.75))
      .toDF("a", "b")
    val got = Profiling.profileNumeric(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    // a: 3 non-null of 4, values {1,2,2} → mean 5/3 via micro-units
    assert(got(0) === (("a", 3L, 1L, 2L, 1.0, 2.0, 5000000.0 / 3 / 1e6)))
    // b: values {10.25, 10.25, 0.75} → floor-to-micro exact
    assert(got(1) === (("b", 3L, 1L, 2L, 0.75, 10.25, 21250000.0 / 3 / 1e6)))
  }

  test("dataCard: per-source counts, quality mass and dup exposure, null text safe") {
    // bias-only weights: score = 2.0 for every non-null text, so the
    // quality columns are exactly countable by hand
    val w = graft.text.Quality.Weights(
      bias = 2.0, lenSat = 0.0, punct = 0.0, stop = 0.0, cpt = 0.0)
    val docs = Seq(
      (1L, "web", "en", "alpha beta"),          // dup of 2 (case/ws)
      (2L, "web", "en", "  ALPHA   beta "),
      (3L, "web", "de", "gamma"),
      (4L, "books", "en", "alpha beta"),        // cross-source dup of 1/2
      (5L, "books", "en", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "lang", "text")
    val got = Profiling.dataCard(docs, "source", "doc_id", "text", "lang", w)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // web: 3 docs; tokens 2+2+1 (whitespace split of trimmed text);
    // chars are RAW lengths; langs {en, de}; all 3 non-null pass the
    // gate; quality mass 3 × 2e6; docs 1 and 2 share a fingerprint
    val web = got("web")
    assert(web._2 === 3L && web._3 === 5L)
    assert(web._4 === ("alpha beta".length + "  ALPHA   beta ".length
      + "gamma".length).toLong)
    assert(web._5 === 2L && web._6 === 3L && web._7 === 6000000L)
    assert(web._8 === 2L)
    // books: the null-text doc contributes to n_docs only; doc 4's
    // fingerprint collides with web's pair → 1 dup-exposed doc
    val books = got("books")
    assert(books._2 === 2L && books._3 === 2L
      && books._4 === "alpha beta".length.toLong)
    assert(books._5 === 1L && books._6 === 1L && books._7 === 2000000L)
    assert(books._8 === 1L)
  }

  test("privacyReport: per-group exposure totals with the q89 cascade semantics") {
    val docs = Seq(
      ("g1", "reach me at a@b.com or 1.2.3.4 today"), // email + ip
      ("g1", "nothing sensitive here"),
      // email whose domain LOOKS like an IP: the cascade counts it
      // once as an email, never again as an IP
      ("g1", "see x@1.2.3.4.com"),
      ("g2", "call 555-123-4567 now"),
      ("g2", "call 555-123-4567 or 555-987-6543"))
      .toDF("source", "text")
    val got = Profiling.privacyReport(docs, "source", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    // (source, n_docs, n_docs_with_pii, n_emails, n_ips, n_phones)
    assert(got("g1") === (("g1", 3L, 2L, 2L, 1L, 0L)))
    assert(got("g2") === (("g2", 2L, 2L, 0L, 0L, 3L)))
  }

  test("sourceOverlap counts distinct shared fingerprints per unordered pair") {
    val docs = Seq(
      ("s1", "shared doc one"), ("s1", "shared  DOC one"), // same fp, 1 distinct
      ("s1", "only in s1"),
      ("s2", "shared doc one"), ("s2", "also shared two"),
      ("s3", "also shared two"), ("s3", "shared doc one"))
      .toDF("source", "text")
    val got = Profiling.sourceOverlap(docs, "source", "text")
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // s1∩s2 = {doc one}; s1∩s3 = {doc one}; s2∩s3 = {doc one, two}
    assert(got === Map(("s1", "s2") -> 1L, ("s1", "s3") -> 1L,
      ("s2", "s3") -> 2L))
  }

  test("profileNumeric: empty table and all-null column yield null range, zero mean") {
    val empty = Seq.empty[(java.lang.Double, java.lang.Double)].toDF("a", "b")
    val gotEmpty = Profiling.profileNumeric(empty, Seq("a", "b")).collect()
    assert(gotEmpty.length === 2)
    gotEmpty.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getLong(3) === 0L)
      assert(r.isNullAt(4) && r.isNullAt(5))
      assert(r.getDouble(6) === 0.0)
    }
    val allNull = Seq[(java.lang.Double, java.lang.Double)]((null, 1.0), (null, 2.0))
      .toDF("a", "b")
    val gotNull = Profiling.profileNumeric(allNull, Seq("a")).collect().head
    assert(gotNull.getLong(1) === 0L && gotNull.getLong(2) === 2L)
    assert(gotNull.isNullAt(4) && gotNull.isNullAt(5) && gotNull.getDouble(6) === 0.0)
  }

  test("profileNumeric is a single aggregation job, output rows = |columns|") {
    val df = (1 to 1000).map(i => (i.toDouble, i * 2.0, i * 3.0))
      .toDF("x", "y", "z")
    val got = Profiling.profileNumeric(df, Seq("x", "y", "z"))
    assert(got.count() === 3L)
    assert(got.columns.toSeq ===
      Seq("column", "n", "n_null", "n_distinct", "min_v", "max_v", "mean_v"))
  }

  test("vocabDrift: hand-checked counts and two-sided cross-multiplied verdicts") {
    // A: 10 tokens total — "common" ×8, "aonly" ×2
    // B: 10 tokens total — "common" ×8, "bonly" ×1, "rising" ×1
    val a = Seq((1L, ("common " * 8).trim + " aonly aonly"))
      .toDF("doc_id", "text").select("text")
    val b = Seq((2L, ("common " * 8).trim + " bonly rising"))
      .toDF("doc_id", "text").select("text")
    val got = Profiling.vocabDrift(a, b, "text", topK = 10)
      .as[(String, Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // shares equal (8/10 vs 8/10): neither side drifts at factor 2
    assert(got("common") === (("common", 8L, 8L, false, false)))
    // present only in A: share 2/10 vs 0 — drift_up, never drift_down
    assert(got("aonly") === (("aonly", 2L, 0L, true, false)))
    assert(got("bonly") === (("bonly", 0L, 1L, false, true)))
    // ranking: combined count desc, token asc — common first, then the
    // 2-count A-only token, then the 1-count tokens by name
    val ranked = Profiling.vocabDrift(a, b, "text", topK = 3)
      .as[(String, Long, Long, Boolean, Boolean)].collect().map(_._1).toSeq
    assert(ranked === Seq("common", "aonly", "bonly"))
  }

  test("vocabDrift: factor gates the verdict — a 1.5x shift drifts at 4/3 but not at 2") {
    // A: "x" 3 of 6 (share 1/2); B: "x" 2 of 6 (share 1/3) — ratio 1.5
    val a = Seq("x x x p q r").toDF("text")
    val b = Seq("x x p q r s").toDF("text")
    def verdict(num: Long, den: Long): Boolean =
      Profiling.vocabDrift(a, b, "text", topK = 10, factorNum = num,
        factorDen = den)
        .filter($"token" === "x").head().getBoolean(3)
    assert(!verdict(2, 1), "1.5x shift must not clear factor 2")
    assert(verdict(4, 3), "1.5x shift must clear factor 4/3")
    // boundary is strict: exactly 1.5x does NOT clear factor 3/2
    assert(!verdict(3, 2), "cross-multiplication is strictly greater-than")
  }

  test("embeddingHealth: disjoint cascade classifies each row exactly once") {
    import org.apache.spark.sql.functions._
    val ok = Seq(1.0f, 2.0f, 3.0f)
    val rows = Seq(
      (1L, Option(ok)),
      (2L, Option.empty[Seq[Float]]),                       // null
      (3L, Option(Seq(1.0f, 2.0f))),                        // wrong dim
      (4L, Option(Seq(Float.NaN, 1.0f, 2.0f))),             // nonfinite
      (5L, Option(Seq(Float.PositiveInfinity, 0f, 0f))),    // nonfinite
      (6L, Option(Seq(0.0f, 0.0f, 0.0f))),                  // zero
      // NaN in a wrong-width vector: wrong_dim wins (cascade order)
      (7L, Option(Seq(Float.NaN))))
      .toDF("id", "v")
    val r = Profiling.embeddingHealth(rows, "v", dim = 3).head()
    assert(r.getAs[Long]("n_rows") === 7L)
    assert(r.getAs[Long]("n_null") === 1L)
    assert(r.getAs[Long]("n_wrong_dim") === 2L)
    assert(r.getAs[Long]("n_nonfinite") === 2L)
    assert(r.getAs[Long]("n_zero") === 1L)
    assert(r.getAs[Long]("n_ok") === 1L)
    intercept[IllegalArgumentException] {
      Profiling.embeddingHealth(rows, "v", dim = 0)
    }
  }

  test("vocabDrift: degenerate inputs fail loudly or stay sane") {
    val a = Seq("x y").toDF("text")
    intercept[IllegalArgumentException] {
      Profiling.vocabDrift(a, a, "text", topK = 0)
    }
    intercept[IllegalArgumentException] {
      Profiling.vocabDrift(a, a, "text", topK = 1, factorNum = 0)
    }
    // identical corpora: no verdicts anywhere
    val same = Profiling.vocabDrift(a, a, "text", topK = 10)
      .as[(String, Long, Long, Boolean, Boolean)].collect()
    assert(same.forall(r => !r._4 && !r._5))
  }

  test("zipfFit: an exact 1/r corpus fits alpha ~ 1; deterministic; " +
    "k_used binds to vocab when topK exceeds it") {
    // token t_r appears floor(120/r) times, r = 1..20 → ln(cnt) ≈
    // ln 120 − ln(rank): slope ≈ −1 up to floor noise
    val rows = (1 to 20).flatMap { r =>
      (1 to (120 / r)).map(k => (s"${r}_$k".hashCode.toLong, s"t${"%02d".format(r)}"))
    }
    val docs = rows.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Profiling.zipfFit(docs, "text", topK = 100)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 1)
    val (kUsed, nTokens, vocab, sx, _, _, _, alphaFp) =
      (got(0)._1, got(0)._2, got(0)._3, got(0)._4, got(0)._5, got(0)._6,
        got(0)._7, got(0)._8)
    assert(kUsed === 20L && vocab === 20L)
    assert(nTokens === (1 to 20).map(120 / _).sum.toLong)
    assert(sx > 0L)
    assert(alphaFp > 850000L && alphaFp < 1150000L, s"alpha_fp $alphaFp")
    val again = Profiling.zipfFit(docs.repartition(7), "text", topK = 100)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(again.toSeq === got.toSeq)
    intercept[IllegalArgumentException] {
      Profiling.zipfFit(docs, "text", topK = 1)
    }
  }
}
