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

  test("scoreDocs keep is exactly score > 0 on the raw (unrounded) logit") {
    val df = Seq((1L, "a b c"), (2L, "the of to in is it the of to in"))
      .toDF("doc_id", "text")
    val out = Quality.scoreDocs(df, "doc_id", "text").collect()
    out.foreach { r =>
      assert(r.getBoolean(2) === (r.getDouble(1) > 0) ||
        math.abs(r.getDouble(1)) < 1e-6) // rounded display vs raw decision
    }
  }
}
