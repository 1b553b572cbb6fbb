package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[UnicodeExpressions.nfc]] — recomposition, identity on composed
  * text, NULL passthrough, and the codegen path staying compiled.
  */
class UnicodeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(UnicodeExpressions.nfc($"t"))
      .as[String].head()

  test("recomposes decomposed sequences") {
    assert(nfc("é") === "é")
    assert(nfc("mérge thése") === "mérge thése")
  }

  test("already-composed and ASCII text is unchanged") {
    assert(nfc("plain ascii 123") === "plain ascii 123")
    assert(nfc("café") === "café")
    assert(nfc("") === "")
  }

  test("normalization shortens the UTF-16 length") {
    val out = Seq("éé").toDF("t")
      .select(length(UnicodeExpressions.nfc($"t")), length($"t"))
      .as[(Int, Int)].head()
    assert(out === ((2, 4)))
  }

  test("NULL passes through") {
    val out = Seq(Option.empty[String]).toDF("t")
      .select(UnicodeExpressions.nfc($"t")).collect()(0)
    assert(out.isNullAt(0))
  }

  test("stays compiled with codegen fallback disabled") {
    val old = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = Seq("éx").toDF("t")
        .select(UnicodeExpressions.nfc($"t")).as[String].collect()
      assert(got.toSeq === Seq("éx"))
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("graft_nfc registers as a SQL function") {
    GraftFunctions.register(spark)
    // the combining acute rides into the SQL text via the Scala escape
    val got = spark.sql("SELECT graft_nfc('e\u0301x') AS a").collect()(0)
    assert(got.getString(0) === "\u00e9x")
  }

  test("non-string input is rejected at analysis time") {
    val e = intercept[Exception] {
      Seq(1L).toDF("t").select(UnicodeExpressions.nfc($"t")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
