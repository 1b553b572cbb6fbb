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
}
