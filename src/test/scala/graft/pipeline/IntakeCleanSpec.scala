package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Pipelines.intakeClean]] — the strip → NFC → C4 composition:
  * every stage observable in one pass, stage order (controls stripped
  * BEFORE line rules; NFC before content tests), and the NULL/clean
  * contracts.
  */
class IntakeCleanSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Pipelines.intakeClean(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("all three defects cleaned in one pass") {
    // decomposed e+U+0301, a BEL inside a good line, a killer line
    val dirty = "one two thrée.\nfour five six!\nbad line\n{ x }"
    val out = run(Seq((1L, dirty)))(1L)
    // control stripped, NFC recomposed, only punctuated 3-word lines kept
    assert(out.getAs[String]("text_kept") ===
      "one two thrée.\nfour five six!")
    assert(out.getAs[Long]("n_ctrl_removed") === 1L)
    assert(out.getAs[Long]("n_kept") === 2L)
    // the '{' line kills the page even though its line was dropped
    assert(!out.getAs[Boolean]("keep_doc"))
    // the recomposed é in the KEPT text is the only non-ASCII left
    assert(out.getAs[Long]("n_nonascii") === 1L)
  }

  test("control chars inside rule tokens are stripped before the rules") {
    // 'lorem ipsum' only reads as the killer token AFTER the strip
    val out = run(Seq(
      (1L, "one two three.\nfour five six.\nseven eight nine.\nlorem ipsum here.")))(1L)
    assert(!out.getAs[Boolean]("keep_doc"))
  }

  test("clean text passes through unchanged and keeps") {
    val clean = "one two three.\nfour five six!\nseven eight nine?"
    val out = run(Seq((1L, clean)))(1L)
    assert(out.getAs[String]("text_kept") === clean)
    assert(out.getAs[Long]("n_ctrl_removed") === 0L)
    assert(out.getAs[Long]("n_nonascii") === 0L)
    assert(out.getAs[Boolean]("keep_doc"))
  }

  test("NULL text yields NULL outputs and keep_doc = false") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Pipelines.intakeClean(df, "doc_id", "text").collect()(0)
    assert(out.isNullAt(out.fieldIndex("text_kept")))
    assert(out.isNullAt(out.fieldIndex("n_ctrl_removed")))
    assert(!out.getAs[Boolean]("keep_doc"))
  }

  test("matches the manual stage chain") {
    val docs = (1L to 40L).map(i =>
      (i, s"alpha bet́a $i.\ngamma delta!\nshort")).toDF("doc_id", "text")
    val composed = Pipelines.intakeClean(docs, "doc_id", "text")
      .select("doc_id", "text_kept").as[(Long, String)].collect().sorted.toSeq
    val manual = {
      val stripped = graft.text.TextAnalysis.stripControlChars(col("text"))
      val norm = graft.functions.UnicodeExpressions.nfc(stripped)
      docs.select(col("doc_id"),
        array_join(graft.text.Quality.c4KeptLines(norm, 3), "\n")
          .as("text_kept"))
        .as[(Long, String)].collect().sorted.toSeq
    }
    assert(composed === manual)
  }
}
