package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas of the engine.
  *
  * The reference's single input relation is a ratings table with columns
  * `user, item, rating, time` (reference `run_als.py:8`,
  * `json-to-csv.py:11`); its schema system is positional and
  * caller-asserted. We make it explicit and typed.
  */
final case class Rating(user: String, item: String, rating: Double, time: Long)

/** Raw Amazon-review-shaped record consumed by the ETL
  * (reference `json-to-csv.py:10`): only 4 of ~12 fields are kept.
  */
final case class RawReview(
    reviewerID: String,
    asin: String,
    overall: Double,
    unixReviewTime: Long)

object Schemas {

  /** `user STRING, item STRING, rating DOUBLE, time LONG` — the engine's
    * canonical ratings relation (reference `run_als.py:8`).
    */
  val rating: StructType = StructType(Seq(
    StructField("user", StringType),
    StructField("item", StringType),
    StructField("rating", DoubleType),
    StructField("time", LongType)))

  /** Projection source schema for NDJSON reviews
    * (reference `json-to-csv.py:5-10`). Extra fields in real data are
    * ignored because the reader projects exactly these.
    */
  val rawReview: StructType = StructType(Seq(
    StructField("reviewerID", StringType),
    StructField("asin", StringType),
    StructField("overall", DoubleType),
    StructField("unixReviewTime", LongType)))
}
