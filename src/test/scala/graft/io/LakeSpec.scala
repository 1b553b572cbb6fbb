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
}
