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
  /** `events` carries a nanosecond parquet timestamp, which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]); read it as a
    * long (legacy conf) and surface BOTH `ts_ns` (exact) and a derived
    * microsecond `ts` TimestampType column. Truncation ns→us matches
    * what any us-resolution engine (DuckDB included) does on read.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
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
