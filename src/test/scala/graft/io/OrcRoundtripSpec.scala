package graft.io

import graft.SparkSpec

/** ORC sink/scan round-trip (q238's kernel): content identity across
  * types the documents table carries, including NULLs and non-ASCII.
  */
class OrcRoundtripSpec extends SparkSpec {
  import spark.implicits._

  test("write-read preserves rows, NULLs, and unicode") {
    val rows = Seq(
      (1L, Some("plain"), "en", 5L),
      (2L, Some("café 漢字"), "fr", 8L),
      (3L, None, "de", 0L))
    val df = rows.toDF("doc_id", "text", "lang", "n_chars")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_orc").toString
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // file scans mark columns nullable; names and types must survive
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().toSet === df.collect().toSet)
  }
}
