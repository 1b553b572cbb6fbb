package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared lifecycle helpers for the streaming twins' bucketed index
  * tables ([[StreamingDedup]], [[StreamingParagraphDedup]],
  * [[StreamingSubstringDedup]]). All three tag index rows with the
  * batchId that wrote them so an at-least-once foreachBatch REPLAY
  * probes only `batch_id < currentBatchId` — the exact pre-batch
  * index — instead of self-matching its own failed attempt's rows.
  */
object IndexTables {

  /** Fail fast when `table` predates the `batch_id` replay-guard
    * column: silently proceeding would throw an opaque
    * AnalysisException from the probe's filter mid-stream. The fix is
    * a one-time explicit rewrite ([[migrateLegacy]]) — explicit
    * because at index scale it is a full-table rewrite the operator
    * should schedule, not something a stream start should kick off
    * implicitly.
    */
  def requireBatchIdColumn(spark: SparkSession, table: String): Unit =
    if (!spark.table(table).schema.fieldNames.contains("batch_id"))
      throw new IllegalStateException(
        s"index table '$table' predates the batch_id replay-guard column; " +
          s"""run graft.streaming.IndexTables.migrateLegacy(spark, "$table", bucketCol, buckets) """ +
          "once (rewrites every row with batch_id = -1, preserving the " +
          "bucket spec), then restart the stream")

  /** One-time legacy migration: rewrite `table` with `batch_id = -1`
    * (pre-history — visible to every batch of any future lineage),
    * preserving the bucket spec so the probe join stays exchange-free.
    * Idempotent: a table that already has the column is left alone.
    * `bucketCol` is the twin's bucket key — "band_hash" for
    * [[StreamingDedup]], "h" for the paragraph/substring twins.
    */
  def migrateLegacy(spark: SparkSession, table: String,
      bucketCol: String, buckets: Int): Unit = {
    if (spark.table(table).schema.fieldNames.contains("batch_id")) return
    // Stage the rewrite: write the tagged copy to a sibling table FIRST,
    // so the original — possibly the sole copy of a full-scale index —
    // survives any executor loss or write failure mid-rewrite. Only
    // after the staged copy is fully committed does the original get
    // replaced, and the final rewrite reads from the DURABLE staged
    // table (not from non-fault-tolerant checkpoint blocks).
    val staged = table + "__migrated"
    spark.sql(s"DROP TABLE IF EXISTS $staged")
    graft.io.Bucketing.writeBucketedAligned(
      spark.table(table).withColumn("batch_id", lit(-1L)),
      staged, bucketCol, buckets, "error")
    // overwrite from the durable staged copy (reads staged, writes
    // original — no read-from-write-target conflict), then drop staging
    graft.io.Bucketing.writeBucketedAligned(
      spark.table(staged), table, bucketCol, buckets, "overwrite")
    spark.sql(s"DROP TABLE $staged")
  }
}
