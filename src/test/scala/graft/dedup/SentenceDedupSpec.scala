package graft.dedup

import graft.SparkSpec

/** [[Dedup.sentenceDedup]] — keep-first election at sentence
  * granularity: boundary detection, cross-doc drops, line-wrap
  * non-boundaries, lossless reassembly, and the null/empty contract.
  */
class SentenceDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Dedup.sentenceDedup(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("a repeated sentence drops everywhere but its first occurrence") {
    val out = run(Seq(
      (1L, "unique one here. the boilerplate disclaimer. tail a!"),
      (2L, "other start here? the boilerplate disclaimer. tail b!")))
    assert(out(1L)._1 ===
      "unique one here. the boilerplate disclaimer. tail a!")
    assert(out(2L)._1 === "other start here? tail b!")
    assert(out(2L)._3 === 1L)
  }

  test("within-doc repeats also collapse to the first occurrence") {
    val out = run(Seq((1L, "again and again. again and again. done now.")))
    assert(out(1L)._1 === "again and again. done now.")
    assert(out(1L) === (("again and again. done now.", 2L, 1L)))
  }

  test("normalization: case and whitespace variants are one sentence") {
    val out = run(Seq(
      (1L, "The  Same   Sentence. trailer one!"),
      (2L, "the same sentence. trailer two!")))
    assert(out(2L)._1 === "trailer two!")
  }

  test("an unpunctuated line break is a wrap, not a boundary") {
    // the same words split across a newline WITHOUT terminal punct
    // stay one sentence — and match their single-line twin by the
    // whitespace-collapsing key
    val out = run(Seq(
      (1L, "wrapped over\ntwo lines. end a."),
      (2L, "wrapped over two lines. end b.")))
    assert(out(2L)._1 === "end b.")
  }

  test("newline AFTER terminal punct is a boundary") {
    val out = run(Seq((1L, "first sentence.\nsecond sentence.")))
    assert(out(1L)._2 === 2L)
  }

  test("reassembly is lossless when nothing drops") {
    val text = "alpha beta. gamma delta! epsilon zeta?"
    val out = run(Seq((1L, text)))
    assert(out(1L) === ((text, 3L, 0L)))
  }

  test("null and empty docs survive as empty with zero drops") {
    val out = run(Seq((1L, null.asInstanceOf[String]), (2L, "")))
    assert(out(1L) === (("", 1L, 0L)))
    assert(out(2L) === (("", 1L, 0L)))
  }
}
