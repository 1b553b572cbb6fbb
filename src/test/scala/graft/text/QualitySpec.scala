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
