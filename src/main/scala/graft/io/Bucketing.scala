package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table sinks (SCALE.md "Joins"): writing both sides of a
  * recurring fact-fact join bucketed (+sorted) by the join key makes
  * every later join shuffle-free — the sort-merge join reads
  * co-bucketed files directly. The write pays one shuffle once;
  * every downstream join of the two tables pays none.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table registered in the
    * session catalog (parquet under the warehouse dir).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Create-if-absent variant: reuse an already-materialized bucketed
    * table so repeated query runs in one session neither race on the
    * warehouse dir nor re-pay the write shuffle. The caller owns
    * invalidation (drop the table) if the source data changes.
    */
  def ensureBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    synchronized {
      val s = df.sparkSession
      if (!s.catalog.tableExists(table)) {
        // A prior session (fresh in-memory catalog) may have left the
        // managed location behind without metadata; saveAsTable refuses
        // to reuse it, so clear the orphaned directory first — via the
        // Hadoop FileSystem API so hdfs:/s3a: warehouse URIs work, not
        // just the local filesystem.
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
        val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(wh)) fs.delete(wh, true)
        writeBucketed(df, table, key, buckets)
      }
    }
}
