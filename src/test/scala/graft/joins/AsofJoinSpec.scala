package graft.joins

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    // key, time, px
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 9.0)).toDF("k", "qt", "px")

  private val trades = Seq(
    ("a", 5L, 100), // before any quote
    ("a", 10L, 101), // exactly at a quote (<= matches)
    ("a", 25L, 102), // between quotes -> 20
    ("a", 99L, 103), // after all -> 30
    ("b", 14L, 104), // before b's only quote
    ("c", 50L, 105)) // key with no quotes at all
    .toDF("k", "tt", "trade_id")

  test("asOf picks the latest right row at-or-before each left row") {
    val out = AsofJoin.asOf(trades, quotes, Seq("k"), "tt", "qt", Seq("px"))
      .select("trade_id", "px").as[(Int, Double)].collect().toMap
    assert(out === Map(101 -> 1.0, 102 -> 2.0, 103 -> 3.0))
  }

  test("non-strict asOf keeps unmatched left rows with null values") {
    val out = AsofJoin.asOf(trades, quotes, Seq("k"), "tt", "qt",
      Seq("px"), strict = false)
    assert(out.count() === 6)
    val unmatched = out.filter(col("px").isNull)
      .select("trade_id").as[Int].collect().toSet
    assert(unmatched === Set(100, 104, 105))
  }

  test("asOfWithin drops matches older than maxAge") {
    val out = AsofJoin.asOfWithin(trades, quotes, Seq("k"), "tt", "qt",
      Seq("px"), maxAge = lit(10L))
      .select("trade_id", "px").as[(Int, Double)].collect().toMap
    // trade 103 at t=99 matched quote at 30: age 69 > 10 -> dropped
    assert(out === Map(101 -> 1.0, 102 -> 2.0))
  }

  test("carried right columns colliding with left columns are rejected") {
    val q = Seq(("a", 10L, 1.0)).toDF("k", "qt", "px")
    val t = Seq(("a", 15L, 9.9)).toDF("k", "tt", "px") // left also has px
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asOf(t, q, Seq("k"), "tt", "qt", Seq("px"))
    }
    assert(e.getMessage.contains("px"))
  }

  test("legitimately-null right values don't break strict matching") {
    val q = Seq(("a", 10L, Option.empty[Double]), ("a", 20L, Some(2.0)))
      .toDF("k", "qt", "px")
    val t = Seq(("a", 15L, 1)).toDF("k", "tt", "trade_id")
    val out = AsofJoin.asOf(t, q, Seq("k"), "tt", "qt", Seq("px"))
    // matched row exists (quote at 10) even though its px is null...
    assert(out.count() === 1)
    // ...but last(ignoreNulls) carries values, so px is null here
    assert(out.filter(col("px").isNull).count() === 1)
  }
}
