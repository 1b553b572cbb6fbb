package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.PortableSketches

/** Continuous corpus statistics — the streaming face of
  * [[graft.pipeline.PortableSketches]]: each micro-batch's registers
  * fold into the running sketch, so cardinality over everything ever
  * ingested is available after every trigger without any rescan.
  *
  * Replay safety comes FREE here, unlike the dedup indexes: HLL's
  * merge is `max` per bucket, which is idempotent — an at-least-once
  * foreachBatch replay folds the same registers twice and changes
  * nothing, so no batchId guard is needed (contrast
  * [[StreamingDedup]]'s `batch_id < current` probe). This is the
  * general rule for streaming sketch folds: max-merge sketches (HLL,
  * bottom-k) are replay-idempotent; sum-merge sketches (Count-Min,
  * histograms) would double-count on replay and need an idempotent
  * sink (e.g. per-batch register tables keyed by batchId, summed at
  * read time) — documented here, implemented for the idempotent case.
  *
  * State is at most 2^p rows, held as a persisted frame and replaced
  * per batch (the previous generation is unpersisted once the new one
  * is materialized — the [[StreamingDedup]] in-memory pattern).
  */
object StreamingSketches {

  final case class Run(
      query: StreamingQuery,
      registers: () => Option[DataFrame],
      release: () => Unit)

  /** Start the rolling-HLL stream. `onBatch(registers, batchId)`
    * receives the registers-so-far after each trigger (safe to
    * collect: ≤ 2^p rows).
    */
  def startHll(stream: DataFrame, key: Column, p: Int = 12)
      (onBatch: (DataFrame, Long) => Unit): Run = {
    // one mutable reference, only touched inside foreachBatch (which
    // Structured Streaming serializes batch-over-batch)
    var regs: DataFrame = null
    val query = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = PortableSketches.hllRegisters(batch, key, p)
        val merged = (if (regs == null) b
          else PortableSketches.hllMerge(regs, b))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        merged.count() // materialize before dropping the old generation
        val old = regs
        regs = merged
        if (old != null) old.unpersist()
        onBatch(merged, batchId)
      }
      .start()
    Run(query,
      registers = () => Option(regs),
      release = () => Option(regs).foreach(_.unpersist()))
  }
}
