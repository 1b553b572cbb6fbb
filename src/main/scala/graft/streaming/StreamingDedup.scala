package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup

/** Continuous incremental near-dup dedup — the streaming face of
  * [[graft.dedup.Dedup.bucketIndex]]/`dedupAgainstIndex`/`updateIndex`:
  * each micro-batch probes the LSH bucket index of everything ADMITTED
  * so far, reports per-doc verdicts (`dup_of` = earlier owner, NULL =
  * survivor), and folds its survivors into the index for the next
  * batch.
  *
  * Built on `foreachBatch` rather than keyed state on purpose: the
  * natural state key is the LSH *bucket*, but a document's verdict
  * aggregates across its 16 band buckets — a second stateful hop that
  * Structured Streaming does not allow after an arbitrary-stateful
  * operator. The index-as-table formulation sidesteps that, keeps the
  * probe a plain broadcast/sort-merge join (same 100 TB shape as
  * batch), and is exactly how production lakehouse dedup maintains its
  * identity index (Delta/Iceberg MERGE per ingest batch).
  *
  * Batch-internal duplicates are out of scope here, as in q90's batch
  * contract: compose `minHashPairs` within the batch when needed.
  * State lives in persisted index blocks (released generation-over-
  * generation), not in stream state — a restart resumes from any
  * index snapshot the caller saved.
  */
object StreamingDedup {

  /** Start the dedup stream. `onBatch(verdicts, batchId)` receives
    * every micro-batch's rows with their `dup_of` column (the caller
    * routes survivors to the sink of record and may snapshot the
    * index); verdicts arrive already materialized (persisted) and are
    * released after the callback returns.
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      initialIndex: Option[DataFrame] = None)
      (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    // one mutable reference, only touched inside foreachBatch (which
    // Structured Streaming serializes batch-over-batch)
    var index: DataFrame = initialIndex.orNull
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val verdicts = (if (index == null) {
          batch.withColumn("dup_of", lit(null).cast("long"))
        } else {
          Dedup.dedupAgainstIndex(batch, index, idCol, textCol,
            shingleK, bands, rowsPerBand, threshold)
        }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        verdicts.count() // materialize before mutating the index
        try {
          val survivors = verdicts.filter(col("dup_of").isNull)
            .select(batch.columns.map(col): _*)
          val next =
            if (index == null)
              Dedup.bucketIndex(survivors, idCol, textCol,
                shingleK, bands, rowsPerBand)
            else
              Dedup.updateIndex(index, survivors, idCol, textCol,
                shingleK, bands, rowsPerBand)
          // updateIndex/bucketIndex are eager — the old generation's
          // blocks can drop as soon as the new one is materialized
          if (index != null) index.unpersist()
          index = next
          onBatch(verdicts, batchId)
        } finally verdicts.unpersist()
      }
      .start()
  }
}
