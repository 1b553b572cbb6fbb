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
}
