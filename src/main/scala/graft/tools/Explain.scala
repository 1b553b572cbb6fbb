package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: `runMain graft.tools.Explain <sfDir> [query...]`
  * prints the formatted physical plan of each named query (all headline
  * queries by default) — the iterate-on-`.explain` loop the build rules
  * call for.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else graft.Bench.headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n================================================== $n")
      try SparkEntryPlan(n, spark, sfDir)
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }

  private def SparkEntryPlan(n: String, spark: SparkSession, sfDir: String): Unit =
    graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
}
