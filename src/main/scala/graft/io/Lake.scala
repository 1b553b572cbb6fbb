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

  /** Z-order clustered write: range-partition + sort by the 2-D Morton
    * key of two bucketed dimensions, then write `nFiles` files. Rows
    * close in EITHER dimension land in few files, so parquet min/max
    * statistics (file- and row-group-level) skip most of the table for
    * predicates on either column — a lexicographic sort gives that for
    * the leading column only. Dimensions are first min/max-scaled into
    * [0, 2¹⁶) (one scalar aggregate broadcast back; the linear map is
    * monotone ⇒ clustering-preserving and SCAN-PARALLEL — a rank/ntile
    * bucketing would be a single-partition global window, the exact
    * scale-killer this engine bans; heavy skew costs some balance, the
    * range partitioner below re-levels the file sizes regardless).
    * One shuffle (the range partitioner) + local sorts — the same cost
    * shape as a plain sorted write.
    */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    require(nFiles > 0, "nFiles must be positive")
    val buckets = (1L << 16) - 1L
    val stats = df.agg(
      min(col(colA).cast("double")).as("amin"),
      max(col(colA).cast("double")).as("amax"),
      min(col(colB).cast("double")).as("bmin"),
      max(col(colB).cast("double")).as("bmax")).head()
    if (stats.isNullAt(0) || stats.isNullAt(2)) {
      // empty input (or an all-null dimension): nothing to cluster —
      // write the frame as-is rather than NPE on the null aggregates
      df.write.mode("overwrite").parquet(path)
      return
    }
    def scaled(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      floor((col(c).cast("double") - lit(lo)) / lit(span) * buckets).cast("long")
    }
    val ra = scaled(colA, stats.getDouble(0), stats.getDouble(1))
    val rb = scaled(colB, stats.getDouble(2), stats.getDouble(3))
    df.withColumn("__zkey",
      graft.functions.ZOrderExpressions.zorderKey(ra, rb))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-files compaction — the maintenance job every continuously-
    * ingested lake needs: streaming sinks and incremental upserts leave
    * one file per micro-batch/task, and a 100 TB table fragmented into
    * millions of small files pays per-file open/list/footer costs that
    * dwarf the data read. Rewrites `srcPath` into `destPath` with file
    * count chosen from the measured input bytes (`targetFileBytes` per
    * output file, Hadoop FS metadata — no data pass), preserving the
    * partition layout when `partitionCols` is given: one
    * `repartition(n)` shuffle, then a partitioned write.
    *
    * Returns (input file count, output file count). Dest-then-swap is
    * the caller's concern (atomic rename/catalog flip); compacting
    * in place would race readers.
    */
  def compact(spark: SparkSession, srcPath: String, destPath: String,
      partitionCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L << 20): (Long, Long) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(srcPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getLen
      }
      buf.toSeq
    }
    val nOut = math.max(1L, math.ceil(files.sum.toDouble / targetFileBytes).toLong)
    val src = spark.read.parquet(srcPath)
    if (partitionCols.isEmpty) {
      src.repartition(nOut.toInt)
        .write.mode("overwrite").parquet(destPath)
    } else {
      import org.apache.spark.sql.functions._
      // Cluster by the partition columns so each output directory is
      // written by few tasks (a round-robin repartition would write a
      // file per task×partition, re-fragmenting the very layout being
      // compacted) — but not by ONE task unconditionally: a skewed
      // partition (one 5 TB language directory) must neither funnel
      // through a single writer nor become a single file. Each
      // partition gets a salt of ceil(rows·avgBytes/target) values —
      // 1 for every small partition (exactly one file, the compaction
      // contract), >1 only where splitting is needed — via a broadcast
      // of the per-partition row counts (partition combos are low-
      // cardinality by the layout contract). maxRecordsPerFile is the
      // belt-and-braces cap for salt-hash imbalance.
      val pcols = partitionCols.map(col)
      val totalRecords = math.max(1L, src.count()) // parquet footer count
      val avgBytes = math.max(1.0, files.sum.toDouble / totalRecords)
      val maxRecs = math.max(1L, (targetFileBytes / avgBytes).toLong)
      val splits = src.groupBy(pcols: _*).agg(count(lit(1)).as("__prows"))
        .withColumn("__nsplit",
          greatest(lit(1L), ceil(col("__prows") / lit(maxRecs))).cast("int"))
        .drop("__prows")
        .withColumnsRenamed(partitionCols.map(c => c -> s"__p_$c").toMap)
      // null-safe join keys: a null partition value (the
      // __HIVE_DEFAULT_PARTITION__ directory) must match its own
      // splits row — a plain equi-join drops every null-keyed row
      val joinCond = partitionCols
        .map(c => col(c) <=> col(s"__p_$c")).reduce(_ && _)
      // salt = hash of the row's PHYSICAL identity — source file path +
      // row index from the scan's `_metadata` column — not of the row
      // values: value-hash salts send identical duplicate rows to ONE
      // writer (a hot partition of pure copies — the boilerplate-dup
      // case compaction exists for — funnels through a single task),
      // and anything nondeterministic (rand/monotonic ids) corrupts
      // data under task retry. File+offset is unique per row, uniform
      // under any duplication, and a retried task recomputes the exact
      // same salt from the immutable input files.
      val srcWithId = src
        .withColumn("__file", col("_metadata.file_path"))
        .withColumn("__ridx", col("_metadata.row_index"))
      srcWithId.join(broadcast(splits), joinCond)
        .drop(partitionCols.map(c => s"__p_$c"): _*)
        .withColumn("__salt",
          pmod(xxhash64(col("__file"), col("__ridx")), col("__nsplit")).cast("int"))
        .drop("__nsplit", "__file", "__ridx")
        // 2× the byte-derived task count: (combo, salt) groups hash to
        // tasks, and headroom halves the chance two split groups of the
        // same hot partition collapse into one writer
        .repartition(math.min(2L * nOut, Int.MaxValue.toLong).toInt,
          (pcols :+ col("__salt")): _*)
        .drop("__salt")
        .write.option("maxRecordsPerFile", maxRecs)
        .partitionBy(partitionCols: _*).mode("overwrite").parquet(destPath)
    }
    val d = new org.apache.hadoop.fs.Path(destPath)
    val outIt = fs.listFiles(d, true)
    var nOutFiles = 0L
    while (outIt.hasNext) {
      if (outIt.next().getPath.getName.endsWith(".parquet")) nOutFiles += 1
    }
    (files.size.toLong, nOutFiles)
  }
}
