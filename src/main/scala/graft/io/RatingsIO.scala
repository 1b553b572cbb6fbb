package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Rating, Schemas}

/** Sources and sinks (SURVEY §2.1).
  *
  * Every reader returns a distributed DataFrame with an explicit schema —
  * never a driver-local table (the reference's pandas ETL is eager and
  * single-process, `json-to-csv.py:5-12`; at 100 TB all of these must be
  * partition-parallel scans, which `spark.read` gives us natively).
  */
object RatingsIO {

  /** NDJSON review scan + projection + rename → canonical ratings relation.
    * Mirrors reference `json-to-csv.py:5-11` (read JSON lines, keep 4
    * columns, rename positionally) as one declarative plan: the explicit
    * read-schema doubles as the projection, so the JSON parser never
    * materializes unused fields, and Catalyst prunes at the scan.
    */
  def readReviewsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.rawReview).json(path)
      .select(
        col("reviewerID").as("user"),
        col("asin").as("item"),
        col("overall").as("rating"),
        col("unixReviewTime").as("time"))

  /** Headerless CSV sink (reference `json-to-csv.py:12`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "false").csv(path)

  /** Headerless CSV scan with caller-supplied positional schema
    * (reference `run_als.py:8`: `pd.read_csv(path, names=[...])`).
    */
  def readRatingsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.rating).csv(path)

  /** Parquet scan — the reference's distributed-run format
    * (`report.pdf` §4: Parquet on S3). Native columnar scan with
    * predicate pushdown and column pruning.
    */
  def readRatingsParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC sink/scan — the second columnar format a lakehouse ingests;
    * same pushdown/pruning machinery as parquet in Spark's DSv2 path.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readRatingsOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.rating).orc(path)

  def asRatings(df: DataFrame): Dataset[Rating] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col("user").cast("string"),
      col("item").cast("string"),
      col("rating").cast("double"),
      col("time").cast("long")).as[Rating]
  }
}
