package graft.text

import org.apache.spark.sql.Row

import graft.SparkSpec

/** [[Quality.c4LineFilter]] — every C4 rule branch on hand-built docs:
  * terminal punctuation (incl. the closing-quote case), min words per
  * line, lorem-ipsum / curly-brace page kills, min kept lines, and the
  * NULL-text contract.
  */
class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Quality.c4LineFilter(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("line rules: terminal punctuation and minimum words") {
    val doc = Seq(
      "one two three.",        // kept: '.' + 3 words
      "no terminal punct",     // dropped: no terminal mark
      "a b.",                  // dropped: 2 words
      "four five six seven!",  // kept: '!'
      "is that so?",           // kept: '?'
      "he said \"hi there\"",  // kept: closing quote counts (C4 rule)
      "").filter(_ => true).mkString("\n")
    val out = run(Seq((1L, doc)))(1L)
    assert(out.getAs[Long]("n_lines") === 7)
    assert(out.getAs[Long]("n_kept") === 4)
    assert(out.getAs[String]("text_kept") ===
      "one two three.\nfour five six seven!\nis that so?\nhe said \"hi there\"")
    assert(out.getAs[Boolean]("keep_doc"))
  }

  test("CRLF documents survive: lines split on \\r?\\n, not just \\n") {
    // a Windows-convention doc must not fail every line rule over its
    // trailing \r bytes (stripControlChars deliberately keeps \r)
    val out = run(Seq((1L,
      "one two three.\r\nfour five six.\r\nseven eight nine.")))(1L)
    assert(out.getAs[Long]("n_lines") === 3)
    assert(out.getAs[Long]("n_kept") === 3)
    assert(out.getAs[Boolean]("keep_doc"))
  }

  test("a lone trailing \\r is NOT terminal punct: \\z anchors like RE2 $") {
    // "one two three.\r" (old-Mac line break, not part of a \r\n
    // pair) — Java $ matches before the final \r and would keep it
    // (a divergence from the DuckDB oracle); \z doesn't
    val out = run(Seq((1L, "four five six.\none two three.\r")))(1L)
    assert(out.getAs[Long]("n_kept") === 1)
    assert(out.getAs[String]("text_kept") === "four five six.")
  }

  test("the lorem-ipsum page rule is case-insensitive") {
    val threeGood = "one two three.\nfour five six.\nseven eight nine."
    val out = run(Seq(
      (1L, threeGood + "\nLorem Ipsum dolor sit amet."),
      (2L, threeGood)))
    assert(!out(1L).getAs[Boolean]("keep_doc"),
      "the canonical capitalized placeholder must fail the page rule")
    assert(out(2L).getAs[Boolean]("keep_doc"))
  }

  test("blocklistGate: case-variant duplicate blocklist words don't throw") {
    val df = Seq((1L, "clean text here")).toDF("doc_id", "text")
    val out = Quality.blocklistGate(df, "doc_id", "text",
      Seq("Bad", "bad", "BAD", "worse")).collect()(0)
    assert(out.getAs[Long]("n_blocked") === 0)
    assert(out.getAs[Boolean]("keep"))
  }

  test("page rules: lorem ipsum, curly brace, min kept lines") {
    val threeGood = "one two three.\nfour five six.\nseven eight nine."
    val out = run(Seq(
      (1L, threeGood),
      (2L, threeGood + "\nthis has lorem ipsum inside."),
      (3L, threeGood + "\nif (x) { return. }"),
      (4L, "one two three.\nfour five six.")))
    assert(out(1L).getAs[Boolean]("keep_doc"))
    assert(!out(2L).getAs[Boolean]("keep_doc"))
    assert(!out(3L).getAs[Boolean]("keep_doc"))
    // only 2 kept lines < minKeptLines=3
    assert(!out(4L).getAs[Boolean]("keep_doc"))
    assert(out(4L).getAs[Long]("n_kept") === 2)
  }

  test("a page-killed doc still reports its line attrition") {
    val out = run(Seq((1L, "one two three.\nbad line\n{ x }")))(1L)
    assert(!out.getAs[Boolean]("keep_doc"))
    assert(out.getAs[Long]("n_lines") === 3)
    assert(out.getAs[Long]("n_kept") === 1)
  }

  test("NULL text yields NULL stats and keep_doc = false") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null: String)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val out = Quality.c4LineFilter(df, "doc_id", "text").collect()(0)
    assert(out.isNullAt(out.fieldIndex("text_kept")))
    assert(out.isNullAt(out.fieldIndex("n_lines")))
    assert(out.isNullAt(out.fieldIndex("n_kept")))
    assert(!out.getAs[Boolean]("keep_doc"))
  }

  test("blocklistGate: token-level membership, not substring") {
    val df = Seq(
      (1L, "a clean page here"),
      (2L, "contains graftbad once"),
      (3L, "GraftBad graftworse graftbad hits"),
      // substring inside a longer token must NOT match (Scunthorpe)
      (4L, "notgraftbadword stays fine")).toDF("doc_id", "text")
    val out = Quality.blocklistGate(df, "doc_id", "text",
        Seq("graftbad", "graftworse"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) === ((0L, true)))
    assert(out(2L) === ((1L, false)))
    // normalization lowercases, so GraftBad counts too
    assert(out(3L) === ((3L, false)))
    assert(out(4L) === ((0L, true)))
  }

  test("blocklistGate: NULL text yields NULL count and keep = false") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null: String)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val out = Quality.blocklistGate(df, "doc_id", "text", Seq("bad"))
      .collect()(0)
    assert(out.isNullAt(1))
    assert(!out.getBoolean(2))
    intercept[IllegalArgumentException] {
      Quality.blocklistGate(df, "doc_id", "text", Seq.empty)
    }
  }

  test("custom thresholds are honored") {
    // with minWordsPerLine=2 the 2-word line passes; with
    // minKeptLines=1 a single kept line keeps the page
    val out = Quality.c4LineFilter(
      Seq((1L, "a b.\nc d e.")).toDF("doc_id", "text"), "doc_id", "text",
      minWordsPerLine = 2, minKeptLines = 1).collect()(0)
    assert(out.getAs[Long]("n_kept") === 2)
    assert(out.getAs[Boolean]("keep_doc"))
  }
}
