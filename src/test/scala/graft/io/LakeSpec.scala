package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write + filtered read prunes partitions at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lake").toString
    val df = Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "fr", 30L), (4L, "en", 40L))
      .toDF("id", "lang", "v")
    Lake.writePartitioned(df, tmp, Seq("lang"))

    val back = Lake.read(spark, tmp).filter(col("lang") === "en")
    assert(back.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 4L))

    // the lang filter must reach the scan as a PartitionFilter
    // (directory pruning), not a post-scan data filter
    val plan = back.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("lang"), s"lang filter not pushed to partitions:\n$plan")
  }

  test("compact shrinks a fragmented table to target-sized files, content-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (1 to 2000).map(i => (i.toLong, s"text $i" * 10, if (i % 3 == 0) "de" else "en"))
      .toDF("id", "text", "lang")
    df.repartition(40).write.parquet(s"$tmp/frag")
    val (nIn, nOut) = Lake.compact(spark, s"$tmp/frag", s"$tmp/out",
      targetFileBytes = 64L << 20)
    assert(nIn === 40L && nOut === 1L, s"in=$nIn out=$nOut")
    assert(Lake.read(spark, s"$tmp/out").orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
    // partition-preserving variant keeps directory pruning alive
    Lake.writePartitioned(df.repartition(20), s"$tmp/pfrag", Seq("lang"))
    val (_, nOutP) = Lake.compact(spark, s"$tmp/pfrag", s"$tmp/pout",
      partitionCols = Seq("lang"), targetFileBytes = 64L << 20)
    assert(nOutP === 2L, s"expected one file per lang partition, got $nOutP")
    val pruned = Lake.read(spark, s"$tmp/pout").filter(col("lang") === "de")
    assert(pruned.count() === df.filter($"lang" === "de").count())
    val pplan = pruned.queryExecution.executedPlan.toString
    assert(pplan.linesIterator.exists(l =>
      l.contains("PartitionFilters:") && l.contains("lang")), pplan)
  }

  test("compact splits a skewed partition into multiple files, small ones keep one") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_skew").toString
    // planted skew: 'en' is 1000× 'de'
    val df = ((1 to 100000).map(i => (i.toLong, s"payload $i", "en")) ++
      (1 to 100).map(i => (i.toLong + 200000, s"payload $i", "de")))
      .toDF("id", "text", "lang")
    Lake.writePartitioned(df.repartition(8), s"$tmp/frag", Seq("lang"))
    Lake.compact(spark, s"$tmp/frag", s"$tmp/out",
      partitionCols = Seq("lang"), targetFileBytes = 32L << 10)
    def filesIn(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val enFiles = filesIn(s"$tmp/out/lang=en")
    val deFiles = filesIn(s"$tmp/out/lang=de")
    assert(enFiles > 1L, s"skewed partition wrote $enFiles file(s) — not split")
    assert(deFiles === 1L, s"small partition fragmented into $deFiles files")
    // content survives the salted rewrite
    assert(Lake.read(spark, s"$tmp/out").count() === 100100L)
  }

  test("compact splits a partition of PURE duplicate rows, deterministically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dup").toString
    // every 'en' row is byte-identical: a value-derived salt maps them
    // all to ONE salt (one writer task for the whole hot partition);
    // the _metadata (file_path, row_index) salt is unique per physical
    // row, so the partition splits regardless of duplication — and a
    // retried task recomputes the same salt from the immutable input.
    val df = ((1 to 50000).map(_ => (1L, "same boilerplate payload", "en")) ++
      (1 to 50).map(i => (i.toLong, s"small $i", "de")))
      .toDF("id", "text", "lang")
    Lake.writePartitioned(df.repartition(4), s"$tmp/dupfrag", Seq("lang"))
    def filesIn(dir: String): Seq[Long] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getLen
      }
      buf.toSeq
    }
    // duplicates dictionary-compress to ~nothing, so drive the split
    // off a small byte target (avgBytes floors at 1 ⇒ maxRecs = 1024)
    Lake.compact(spark, s"$tmp/dupfrag", s"$tmp/dupout",
      partitionCols = Seq("lang"), targetFileBytes = 1L << 10)
    assert(filesIn(s"$tmp/dupout/lang=en").size > 1,
      "pure-duplicate hot partition funneled through one writer")
    assert(filesIn(s"$tmp/dupout/lang=de").size === 1)
    assert(Lake.read(spark, s"$tmp/dupout").count() === 50050L)
    // determinism: same immutable input ⇒ same salts ⇒ the same file
    // layout (multiset of file sizes), which is what retry safety means
    Lake.compact(spark, s"$tmp/dupfrag", s"$tmp/dupout2",
      partitionCols = Seq("lang"), targetFileBytes = 1L << 10)
    assert(filesIn(s"$tmp/dupout2/lang=en").sorted ===
      filesIn(s"$tmp/dupout/lang=en").sorted)
  }

  test("compact preserves rows whose partition value is NULL") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_null").toString
    val df = Seq[(java.lang.Long, String, String)](
      (1L, "a", "en"), (2L, "b", null), (3L, "c", "en"), (4L, "d", null))
      .toDF("id", "text", "lang")
    Lake.writePartitioned(df.repartition(4), s"$tmp/frag", Seq("lang"))
    Lake.compact(spark, s"$tmp/frag", s"$tmp/out",
      partitionCols = Seq("lang"), targetFileBytes = 64L << 20)
    val back = Lake.read(spark, s"$tmp/out")
    assert(back.count() === 4L)
    assert(back.filter($"lang".isNull).select("id").as[Long]
      .collect().sorted.toSeq === Seq(2L, 4L))
  }

  test("zorderKey interleaves bits; sort clusters both dimensions") {
    import graft.functions.ZOrderKernel
    // hand-checks: interleave(a, b) puts a's bits even, b's odd
    assert(ZOrderKernel.interleave(0L, 0L) === 0L)
    assert(ZOrderKernel.interleave(1L, 0L) === 1L)
    assert(ZOrderKernel.interleave(0L, 1L) === 2L)
    assert(ZOrderKernel.interleave(3L, 3L) === 15L)
    assert(ZOrderKernel.interleave(0xffffffffL, 0L) === 0x5555555555555555L)
    // locality: z-ordering a 2-D grid beats a lexicographic sort on
    // how tightly EACH dimension clusters into file-sized chunks
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val chunks = 16
    def spreadOf(sorted: Seq[(Long, Long)], dim: ((Long, Long)) => Long): Double =
      sorted.grouped(sorted.size / chunks).map { chunk =>
        val v = chunk.map(dim); (v.max - v.min).toDouble
      }.sum / chunks
    val byZ = grid.sortBy { case (x, y) => ZOrderKernel.interleave(x, y) }
    val byLex = grid.sortBy(identity)
    // lex sort: x clusters perfectly but y spans the full range in
    // every chunk; z-order keeps BOTH spans small
    assert(spreadOf(byZ, _._1) < 20 && spreadOf(byZ, _._2) < 20,
      s"z spans: ${spreadOf(byZ, _._1)}, ${spreadOf(byZ, _._2)}")
    assert(spreadOf(byLex, _._2) > 60)
  }

  test("zorderWrite preserves content and bounds per-file spans on both columns") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val rnd = new scala.util.Random(5)
    val df = (1 to 4096).map { i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextDouble() * 100) }
      .toDF("id", "u", "v")
    Lake.zorderWrite(df, tmp, "u", "v", nFiles = 16)
    val back = Lake.read(spark, tmp)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    // per-file min/max spans on BOTH dims must be well under the full
    // range (this is exactly the property parquet stats skipping uses)
    import org.apache.spark.sql.functions._
    val spans = back.groupBy(input_file_name())
      .agg((max($"u") - min($"u")).as("du"), (max($"v") - min($"v")).as("dv"))
      .agg(avg($"du").as("adu"), avg($"dv").as("adv")).head()
    assert(spans.getDouble(0) < 600, s"u span ${spans.getDouble(0)}")
    assert(spans.getDouble(1) < 60, s"v span ${spans.getDouble(1)}")
    // empty input writes an empty (readable) table instead of throwing
    val empty = java.nio.file.Files.createTempDirectory("graft_zempty").toString
    Lake.zorderWrite(df.filter($"id" < 0), empty, "u", "v")
    assert(Lake.read(spark, empty).count() === 0L)
  }
}
