package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("scoreQuality matches a hand-computed logit") {
    // text: 4 tokens, 1 of 20 chars punct, 2 stopwords, 20 chars
    val text = "the cat, the mat.out" // tokens: the cat, the mat.out
    val df = Seq(text).toDF("text")
    val w = Quality.Weights(bias = 1.0, lenSat = 2.0, punct = -3.0,
      stop = 4.0, cpt = -0.5, lenCap = 8.0)
    val n = 4.0
    val pr = text.count(c => ".!?,;:".contains(c)).toDouble / text.length
    val sr = 2.0 / n
    val cpt = text.length / n
    val expected = 1.0 + 2.0 * math.min(1.0, n / 8.0) - 3.0 * pr +
      4.0 * sr - 0.5 * cpt
    val got = df.select(Quality.scoreQuality($"text", w)).as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("defaultWeights favor clean prose over punctuation walls") {
    val df = Seq(
      ("good", Seq.fill(40)("the quick fox runs to a tree and it is fine")
        .mkString(" ")),
      ("bad", Seq.fill(60)("!!! ??? ;;; ,,, buy now").mkString(" ")))
      .toDF("id", "text")
    val s = df.select($"id",
      Quality.scoreQuality($"text").as("s")).as[(String, Double)]
      .collect().toMap
    assert(s("good") > s("bad"))
  }

  test("trainWeights separates planted good/bad classes and scoreDocs applies them") {
    // good: natural stopword density, no punctuation walls;
    // bad: punctuation-heavy, stopword-free
    val good = (0 until 60).map(i =>
      (i.toLong, s"the fish $i swims in a lake and it is close to the shore", 1.0))
    val bad = (60 until 120).map(i =>
      (i.toLong, s"!!! ,,, ;;; item$i ::: qqq www zzz ??? !!! ,,, ;;;", 0.0))
    val labeled = (good ++ bad).toDF("doc_id", "text", "label")
    val w = Quality.trainWeights(labeled, "text", "label")
    val scored = Quality.scoreDocs(labeled, "doc_id", "text", w)
      .join(labeled.select($"doc_id", $"label"), Seq("doc_id"))
    val acc = scored.agg(avg(when($"keep" === ($"label" === 1.0), 1.0)
      .otherwise(0.0))).as[Double].head()
    assert(acc >= 0.95, s"resubstitution accuracy $acc below 0.95")
  }

  test("blank and whitespace-only docs get a DEFINED score (bias), never null") {
    // pins the cross-engine blank-text contract (see Quality.features):
    // split(trim(''), '\s+') yields [''] in Spark AND DuckDB, so
    // tokenCount = 1, every ratio feature is 0, and the score is
    // exactly the bias — a null here would be silently dropped by
    // curateCorpus's keep filter while DuckDB kept the doc
    val w = Quality.defaultWeights
    val texts = Map(1L -> "", 2L -> "   ", 3L -> "\n\t")
    val df = (texts.toSeq :+ (4L -> "real text here")).toDF("doc_id", "text")
    val out = Quality.scoreDocs(df, "doc_id", "text", w)
    assert(out.filter($"score".isNull || $"keep".isNull).count() === 0)
    // pseudo-token counts under BOTH engines' shared semantics (trim
    // strips SPACES only; splitting a residual string yields empty
    // pseudo-tokens, verified in Spark and DuckDB): '' → [''] = 1,
    // '   ' → trim → '' → 1, '\n\t' → survives trim → ['',''] = 2.
    // punct = stop = 0; cpt = raw length / tc.
    val tc = Map(1L -> 1, 2L -> 1, 3L -> 2)
    val blanks = out.filter($"doc_id" <= 3).select($"doc_id", $"score")
      .as[(Long, Double)].collect()
    blanks.foreach { case (id, s) =>
      val expected = w.bias + w.lenSat * (tc(id) / w.lenCap) +
        w.cpt * (texts(id).length.toDouble / tc(id))
      assert(math.abs(s - expected) < 1e-6,
        s"blank doc $id scored $s, expected $expected")
    }
    // NULL text stays NULL: no document to judge, callers decide
    val nulls = Seq((5L, null: String)).toDF("doc_id", "text")
    assert(Quality.scoreDocs(nulls, "doc_id", "text", w)
      .filter($"score".isNull).count() === 1)
  }

  test("gopherGates: each rule trips on its planted violation, clean prose keeps") {
    val clean = ((1 to 30).map(i => s"word$i") ++ Seq("the", "a"))
      .mkString(" ") // 32 words, all alphabetic, no symbols/bullets
    val docs = Seq(
      (1L, clean),
      (2L, "the a short doc"), // 4 words < 30 → ok_words false
      // 32 words but every word is 1 char → mean word length < 3
      (3L, (Seq.fill(30)("x") ++ Seq("the", "a")).mkString(" ")),
      // symbol wall: ### and ... and … push symbols/words over 1/10
      (4L, clean + " ### ... … # #"),
      // 10 lines, all bullets → bullet ratio 100% > 90%
      (5L, (1 to 10).map(i => s"- item $i the a").mkString("\n")),
      // 10 lines, 4 end in ellipsis → 40% > 30%
      (6L, (1 to 10).map(i =>
        if (i <= 4) s"line $i the a...." else s"line $i the a").mkString("\n")),
      // >20% numeric-only words → alpha fraction < 80%
      (7L, ((1 to 10).map(_.toString) ++ (1 to 20).map(i => s"w$i")
        ++ Seq("the", "a")).mkString(" ")),
      (8L, (1 to 40).map(i => s"word$i").mkString(" ")) // no stop words
    ).toDF("doc_id", "text")
    val got = Quality.gopherGates(docs, "doc_id", "text",
      minWords = 30, stopWords = Seq("the", "a"), minStopWords = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9))).toMap
    // (ok_words, ok_word_len, ok_symbols, ok_bullets, ok_ellipsis,
    //  ok_alpha, ok_stop, keep)
    assert(got(1L) === ((true, true, true, true, true, true, true, true)))
    assert(got(2L)._1 === false && got(2L)._8 === false)
    assert(got(3L)._2 === false, "1-char words must fail mean word length")
    assert(got(4L)._3 === false, "symbol wall must fail the symbol ratio")
    assert(got(5L)._4 === false, "all-bullet doc must fail the bullet rule")
    assert(got(6L)._5 === false, "40% ellipsis-ended lines must fail")
    assert(got(7L)._6 === false, "numeric words must fail the alpha rule")
    assert(got(8L)._7 === false, "no stop words must fail the stop rule")
  }

  test("gopherGates: NULL text yields NULL rules, never a silent keep/drop") {
    val docs = Seq((1L, null: String), (2L, "the a " + ("w " * 40)))
      .toDF("doc_id", "text")
    val rows = Quality.gopherGates(docs, "doc_id", "text",
      minWords = 30, stopWords = Seq("the", "a"), minStopWords = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(9), "null text must yield null keep")
    assert(!rows(2L).isNullAt(9))
  }

  test("scoreDocs keep is exactly score > 0 on the raw (unrounded) logit") {
    val df = Seq((1L, "a b c"), (2L, "the of to in is it the of to in"))
      .toDF("doc_id", "text")
    val out = Quality.scoreDocs(df, "doc_id", "text").collect()
    out.foreach { r =>
      assert(r.getBoolean(2) === (r.getDouble(1) > 0) ||
        math.abs(r.getDouble(1)) < 1e-6) // rounded display vs raw decision
    }
  }

  test("gateFunnel: hand-computed attrition incl. NULL-as-fail") {
    import spark.implicits._
    // rules a, b in priority order; doc 4 has a NULL verdict on b
    val gates = Seq(
      (1L, true, Some(true)),   // survives both
      (2L, false, Some(true)),  // first-killed by a
      (3L, true, Some(false)),  // first-killed by b
      (4L, true, None),         // NULL b -> fail
      (5L, false, Some(false))) // first-killed by a; also fails b
      .toDF("doc_id", "a", "b")
    val got = Quality.gateFunnel(gates, Seq("a", "b"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0L, "a", 2L, 2L, 3L),  // 2 fail a outright; 3 survive a
      (1L, "b", 3L, 2L, 1L))) // b fails 3 total, kills 2 marginal, 1 survives
    // metrics are self-consistent: first-fails + final survivors = n
    assert(got.map(_._4).sum + got.last._5 === 5L)
    intercept[IllegalArgumentException] {
      Quality.gateFunnel(gates, Seq.empty)
    }
  }

  test("gateFunnel: rule names with quotes/spaces label rows verbatim " +
    "(typed unpivot, no SQL splicing)") {
    import spark.implicits._
    val hostile = "it's a % weird ''rule"
    val gates = Seq((1L, true), (2L, false)).toDF("doc_id", hostile)
    val got = Quality.gateFunnel(gates, Seq(hostile))
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, hostile, 1L, 1L, 1L)))
  }
}
