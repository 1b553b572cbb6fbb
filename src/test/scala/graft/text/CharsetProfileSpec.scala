package graft.text

import graft.SparkSpec

/** [[TextAnalysis.charsetProfile]] — exact class counts on hand-built
  * strings, the ≤5 % non-ASCII boundary, and custom thresholds.
  */
class CharsetProfileSpec extends SparkSpec {
  import spark.implicits._

  private def profile(text: String) =
    TextAnalysis.charsetProfile(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)

  test("counts every class exactly") {
    // 'ab 1é漢' — 2 letters, 1 digit, 1 space, 2 non-ASCII, 6 chars
    val r = profile("ab 1é漢")
    assert(r.getAs[Long]("n_chars") === 6)
    assert(r.getAs[Long]("n_ascii") === 4)
    assert(r.getAs[Long]("n_letter") === 2)
    assert(r.getAs[Long]("n_digit") === 1)
    assert(r.getAs[Long]("n_space") === 1)
    assert(r.getAs[Long]("n_nonascii") === 2)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("pure printable ASCII keeps with zero non-ASCII") {
    val r = profile("The quick brown fox! 42 ~[ ]~")
    assert(r.getAs[Long]("n_nonascii") === 0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("the gate keeps at exactly 5 percent and drops just above") {
    // 19 ASCII + 1 non-ASCII = 20 chars → 1·20 ≤ 20·1 → keep
    val exact = profile("a" * 19 + "é")
    assert(exact.getAs[Boolean]("keep"))
    // 18 ASCII + 1 non-ASCII = 19 chars → 1·20 > 19 → drop
    val above = profile("a" * 18 + "é")
    assert(!above.getAs[Boolean]("keep"))
  }

  test("structure chars (tab/LF/CR) are not charged as non-ASCII") {
    // 40 'a' + 39 '\n' = 79 chars, zero REAL non-ASCII: the old
    // n_chars − n_ascii numerator billed all 39 line breaks and
    // dropped the doc; the [^ -~\t\n\r] numerator keeps it
    val r = profile(Array.fill(40)("a").mkString("\n"))
    assert(r.getAs[Long]("n_chars") === 79)
    assert(r.getAs[Long]("n_ascii") === 40)
    assert(r.getAs[Long]("n_nonascii") === 0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("NULL text gates keep = false, not NULL") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, null)), schema)
    val r = TextAnalysis.charsetProfile(df, "doc_id", "text").collect()(0)
    assert(r.isNullAt(r.fieldIndex("n_chars")))
    assert(!r.isNullAt(r.fieldIndex("keep")) && !r.getAs[Boolean]("keep"))
  }

  test("custom threshold is cross-multiplied, not floated") {
    // 1 non-ASCII of 3 chars: ≤ 1/3 keeps, ≤ 1/4 drops
    val df = Seq((1L, "abé")).toDF("doc_id", "text")
    val keep3 = TextAnalysis.charsetProfile(df, "doc_id", "text",
      maxNonAsciiNum = 1L, maxNonAsciiDen = 3L).collect()(0)
    assert(keep3.getAs[Boolean]("keep"))
    val keep4 = TextAnalysis.charsetProfile(df, "doc_id", "text",
      maxNonAsciiNum = 1L, maxNonAsciiDen = 4L).collect()(0)
    assert(!keep4.getAs[Boolean]("keep"))
  }
}
