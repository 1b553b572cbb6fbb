package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Fixture smoke spec: reads the REAL driver-generated parquet under
  * /root/testdata (not synthetic test data) and asserts the ingest
  * layer handles the types actually observed on disk. This is the
  * early-warning the round-8 regression lacked — the fixture's `ts`
  * column silently changed from nanosecond INT64 to MICROS timestamp
  * and every purely-synthetic suite stayed green while all 33
  * events-reading gate queries crashed. If the fixture changes shape
  * again, THIS spec fails first, naming the drifted column.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def fixturePresent = new java.io.File(s"$dir/events.parquet").exists

  test("events reader absorbs the fixture's observed ts encoding") {
    assume(fixturePresent)
    val ev = Tables.events(spark, dir)
    // canonical shape regardless of physical encoding
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    val row = ev.select(min("ts_ns").as("ns"), min(unix_micros(col("ts"))).as("us"),
      count(lit(1)).as("n")).head()
    assert(row.getAs[Long]("n") > 0)
    // ts_ns and ts agree to the microsecond
    assert(row.getAs[Long]("ns") / 1000L == row.getAs[Long]("us"))
    // sanity on magnitude: the fixture's events span ~2024+, so the
    // epoch-micros must be > 1.6e15 (2020-09) — a 1000x collapse (the
    // round-8 streaming corruption) lands near 1.7e12 and fails here
    assert(row.getAs[Long]("us") > 1_600_000_000_000_000L,
      s"epoch-micros ${row.getAs[Long]("us")} is implausibly small — " +
        "timestamp unit mis-read (ns/us confusion)")
  }

  test("streaming events reader agrees with the batch reader") {
    assume(fixturePresent)
    val batch = Tables.events(spark, dir)
      .agg(min("ts_ns"), max("ts_ns"), count(lit(1))).head()
    val stream = graft.streaming.StreamingPrep.runToMemory(
      graft.streaming.StreamingPrep.streamEvents(spark, dir))
      .agg(min("ts_ns"), max("ts_ns"), count(lit(1))).head()
    assert(batch == stream,
      s"batch/stream events disagree: $batch vs $stream")
  }

  test("every fixture table loads with the engine's expected key columns") {
    assume(fixturePresent)
    // name -> columns the engine's operators select; drift in any of
    // these breaks queries downstream, so fail here with the table name
    val expect = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey"),
      "supplier" -> Seq("s_suppkey", "s_nationkey"),
      "part" -> Seq("p_partkey"),
      "nation" -> Seq("n_nationkey", "n_regionkey", "n_name"),
      "region" -> Seq("r_regionkey", "r_name"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    expect.foreach { case (t, cols) =>
      val have = Tables.load(spark, dir, t).columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty, s"table $t missing columns $missing (has $have)")
    }
  }

  /** Both historical encodings normalize to identical values through
    * [[Tables.normalizeEventsTs]] — the contract that makes the reader
    * producer-upgrade-proof.
    */
  test("normalizeEventsTs: ns-INT64 and MICROS-timestamp inputs agree") {
    import spark.implicits._
    val us = 1700000000123456L // 2023-11-14, with sub-ms micros
    val legacy = Seq((1L, us * 1000L, 7L)).toDF("event_id", "ts", "user_id")
    val typed = Seq((1L, us, 7L)).toDF("event_id", "raw", "user_id")
      .withColumn("ts", timestamp_micros(col("raw"))).drop("raw")
      .select("event_id", "ts", "user_id")
    val a = Tables.normalizeEventsTs(legacy)
      .select("event_id", "ts_ns", "user_id", "ts").head()
    val b = Tables.normalizeEventsTs(typed)
      .select("event_id", "ts_ns", "user_id", "ts").head()
    assert(a == b)
    assert(a.getAs[Long]("ts_ns") == us * 1000L)
  }
}
