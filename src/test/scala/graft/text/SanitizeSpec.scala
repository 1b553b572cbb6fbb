package graft.text

import graft.SparkSpec

/** [[TextAnalysis.sanitizeControlChars]] — strips C0 controls and DEL,
  * keeps tab/newline/carriage-return, counts removals, NULL contract.
  */
class SanitizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String) =
    TextAnalysis.sanitizeControlChars(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)

  test("strips every C0 control and DEL") {
    val dirty = "a\u0000b\u0007c\u001bd\u007fe"
    val r = run(dirty)
    assert(r.getString(1) === "abcde")
    assert(r.getLong(2) === 4L)
  }

  test("keeps tab, newline, and carriage return") {
    val structured = "col1\tcol2\nrow2\r\nrow3"
    val r = run(structured)
    assert(r.getString(1) === structured)
    assert(r.getLong(2) === 0L)
  }

  test("vertical tab and form feed are stripped, space survives") {
    val r = run("a\u000bb\u000cc d")
    assert(r.getString(1) === "abc d")
    assert(r.getLong(2) === 2L)
  }

  test("NULL text passes through as NULL") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = TextAnalysis.sanitizeControlChars(df, "doc_id", "text")
      .collect()(0)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }
}
