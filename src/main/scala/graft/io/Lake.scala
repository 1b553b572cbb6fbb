package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned lake layout: the write-side half of partition
  * pruning. Writing a corpus partitioned by its coarse filter columns
  * (language, source, date) means every downstream query that filters
  * on them never opens the other partitions' files at all — the scan's
  * `PartitionFilters` prune directories before any I/O, which at 100 TB
  * is the difference between reading 2 TB and reading all of it.
  */
object Lake {

  /** Write `df` as parquet partitioned by `partitionCols` (directory
    * per distinct value combination). Callers choose LOW-cardinality
    * columns — each combination becomes a directory and at least one
    * file per writing task that holds it; high-cardinality keys belong
    * in `bucketBy` (see [[Bucketing]]) instead.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Read a partitioned lake path; filters on the partition columns
    * applied by the caller reach the scan as `PartitionFilters`
    * (directory pruning), not data filters.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
