package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.dedup.Dedup

/** Continuous paragraph-level exact dedup — the streaming face of
  * [[graft.dedup.Dedup.paragraphDedup]]: each micro-batch's lines are
  * deduped within the batch (keep-first in (doc_id, para_no) order),
  * probed against the md5 line-hash index of everything ADMITTED
  * before, and the surviving lines reassemble the batch's documents;
  * kept hashes fold into the index append-only. When ingest delivers
  * doc_ids in order, the result is IDENTICAL to the batch operator
  * over the full corpus — which is why the registered query (q101) is
  * hash-gated against the same DuckDB oracle as q97, where every
  * MinHash streaming twin can only be rows-only.
  *
  * Index = one md5 string per distinct non-empty normalized line, in
  * a parquet table bucketed by hash: the probe anti-join needs no
  * exchange on the index side and each batch appends only its new
  * hashes — O(batch) shuffle per trigger, the same posture as
  * [[StreamingDedup]]'s bucketed mode. Empty/whitespace lines are
  * structural: always kept, never indexed (the corpus-wide empty-line
  * hash would be a hot key AND a wrong dedup).
  *
  * Same foreachBatch discipline as [[StreamingDedup]] (learned
  * empirically there): all reads/writes of the table go through the
  * batch's cloned session, and every result that outlives the append
  * is localCheckpoint'd first.
  *
  * Replay safety: foreachBatch is AT-LEAST-ONCE — a failure between
  * the index append and the caller's sink commit replays the batch
  * against an index that already contains its own hashes. Index rows
  * therefore carry the batchId that wrote them, and the probe reads
  * only rows with `batch_id < currentBatchId` — a replayed batch
  * probes exactly the pre-batch index and reproduces its original
  * verdicts. The replay's re-append duplicates (h, batchId) rows in
  * storage; the probe's `distinct` (exchange-free on the h-bucketed
  * table) absorbs them for all later batches.
  *
  * The guard assumes batchIds from ONE checkpoint lineage (Structured
  * Streaming keeps them monotonic across restarts of the same
  * checkpoint) — so resuming this stream MUST reuse its checkpoint,
  * the standard restart story. Seeding a NEW stream (fresh
  * checkpoint, batchIds restart at 0) from an existing index table
  * requires re-tagging its rows to batch_id = -1 first so batch 0 can
  * see them — `IndexTables.migrateLegacy` is that rewrite (or start
  * with a fresh table). Tables created before the batch_id column
  * existed are rejected at start with the same migration pointer.
  */
object StreamingParagraphDedup {

  /** Start the stream; `onBatch` receives each micro-batch's
    * reassembled docs as (doc_id, text, n_kept, n_dropped).
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexTable: String, sep: String = "\n", indexBuckets: Int = 32)
      (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val setup = docs.sparkSession
    if (!setup.catalog.tableExists(indexTable))
      graft.io.Bucketing.writeBucketedAligned(setup.createDataFrame(
        setup.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("h", StringType),
          StructField("batch_id", LongType)))),
        indexTable, "h", indexBuckets, "overwrite")
    else
      // a pre-batch_id table would fail the probe's filter mid-stream
      // with an opaque missing-column error; fail at start instead,
      // naming the migration step (IndexTables.migrateLegacy)
      IndexTables.requireBatchIdColumn(setup, indexTable)

    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sess = batch.sparkSession
        // replay guard: only hashes admitted by EARLIER batches probe;
        // a failed attempt's own rows (batch_id == batchId) are
        // invisible, so the replay reproduces the original verdicts.
        // distinct absorbs re-append duplicates; both it and the probe
        // join are exchange-free on the h-bucketed scan.
        val index = sess.table(indexTable)
          .filter(col("batch_id") < batchId).select("h").distinct()
        val paras = Dedup.explodedParas(batch, idCol, textCol, sep)
        val nonEmpty = paras.filter(!col("__empty"))
        // within-batch keep-first, then the cross-batch probe
        val w = Window.partitionBy(col("__k"))
          .orderBy(col("doc_id"), col("para_no"))
        val batchOwners = nonEmpty
          .withColumn("__rn", row_number().over(w))
        val flagged = batchOwners
          .join(index.withColumnRenamed("h", "__k").withColumn("__hit", lit(true)),
            Seq("__k"), "left")
          .withColumn("__keep", col("__rn") === 1 && col("__hit").isNull)
          .drop("__rn", "__hit")
          .unionByName(paras.filter(col("__empty")).withColumn("__keep", lit(true)))
          .localCheckpoint()
        val out = Dedup.reassembleParas(flagged, sep)
          .localCheckpoint()
        // admitted = this batch's kept non-empty hashes, appended once
        val newHashes = flagged
          .filter(col("__keep") && !col("__empty"))
          .select(col("__k").as("h")).distinct()
          .withColumn("batch_id", lit(batchId))
          .localCheckpoint()
        // bucket-aligned append: one file per bucket per trigger, not
        // one per (task, bucket) — see Bucketing.writeBucketedAligned
        graft.io.Bucketing.writeBucketedAligned(
          newHashes, indexTable, "h", indexBuckets, "append")
        onBatch(out, batchId)
      }
      .start()
  }
}
