package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the oracle corpus (`TESTDATA.md`): TPC-H-ish star schema +
  * `events` + `documents` + `embeddings`, one parquet per table under a
  * scale-factor directory.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  /** `events` normalized to the engine's canonical shape — `ts` as a
    * microsecond TimestampType plus exact `ts_ns` nanoseconds — no
    * matter which of the fixture's historical encodings the parquet
    * carries. The upstream producer has shipped `ts` as BOTH a
    * nanosecond INT64 (Spark reads it as long only under the legacy
    * conf; vectorized reader otherwise rejects ns timestamps with
    * [PARQUET_TYPE_ILLEGAL]) and a proper MICROS timestamp (read as
    * TIMESTAMP_NTZ when `isAdjustedToUTC=false`). An ingest layer that
    * assumes one physical encoding breaks the day a producer upgrades
    * its writer — so branch on the OBSERVED schema, never on an
    * assumption. Truncation ns→us matches what any us-resolution
    * engine (DuckDB included) does on read; the session timezone is
    * UTC everywhere in this engine, so the NTZ→TZ cast preserves the
    * stored micros exactly.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(spark, d, "events"))
  }

  /** Rewrite a raw events relation (batch or streaming — pure column
    * algebra, no actions) to the canonical column order
    * `(…, ts_ns, …, ts)`: `ts_ns` sits where the raw `ts` was, the
    * derived TimestampType `ts` is appended last. Keeping one order
    * across BOTH physical encodings means downstream `select("*")` /
    * sink schemas don't shift when the producer changes its writer.
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // legacy fixture: INT64 nanoseconds read as long
        val cols = raw.columns.map {
          case "ts" => col("ts").as("ts_ns")
          case c    => col(c)
        } :+ timestamp_micros(expr("ts div 1000")).as("ts")
        raw.select(cols.toIndexedSeq: _*)
      case _ =>
        // typed MICROS timestamp (TIMESTAMP or TIMESTAMP_NTZ); with the
        // UTC session timezone the cast is value-preserving
        val t = col("ts").cast(org.apache.spark.sql.types.TimestampType)
        val cols = raw.columns.map {
          case "ts" => (unix_micros(t) * lit(1000L)).as("ts_ns")
          case c    => col(c)
        } :+ t.as("ts")
        raw.select(cols.toIndexedSeq: _*)
    }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Canonical ratings relation derived from `events`:
    * user = user_id, item = the `k` key inside the JSON `props`,
    * rating = value, time = microsecond epoch of ts.
    *
    * This is the engine's stand-in for the reference's Amazon review
    * table (`user,item,rating,time`, reference `run_als.py:8`) over the
    * driver-provided corpus. Kept as a single narrow projection so the
    * parquet scan reads only 4 columns.
    */
  def ratingsFromEvents(spark: SparkSession, d: String): DataFrame =
    events(spark, d).select(
      col("user_id").cast("string").as("user"),
      get_json_object(col("props"), "$.k").cast("long").cast("string").as("item"),
      col("value").as("rating"),
      unix_micros(col("ts")).as("time"))
}
