package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.recommender.GdMf

/** Dev probe for the GdMf epoch loop: splits wall-clock into time spent
  * inside Spark jobs vs the driver-side gap (Catalyst analysis /
  * optimization / plan construction between jobs). The epoch loop's
  * jobs are strictly sequential, so `wall − Σ job` IS the driver cost.
  *
  * `runMain graft.tools.EpochProbe [sfDir] [k] [epochs]`
  */
object EpochProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(30)
    val epochs = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-epoch-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    object L extends SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      @volatile var jobNanos = 0L
      @volatile var nJobs = 0
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) { jobNanos += System.nanoTime() - s; nJobs += 1 }
      }
    }

    def ratings(dir: String) =
      graft.io.Tables.events(spark, dir).select(
        org.apache.spark.sql.functions.col("user_id").cast("string").as("user"),
        org.apache.spark.sql.functions.get_json_object(
          org.apache.spark.sql.functions.col("props"), "$.k")
          .cast("long").cast("string").as("item"),
        org.apache.spark.sql.functions.col("value").as("rating"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("time"))

    // JIT/codegen warm-up at the smallest scale
    GdMf.fit(ratings("/root/testdata/sf0.001"),
      GdMf.Config(nFactors = k, epochs = 3, collectErrors = true)).release()

    spark.sparkContext.addSparkListener(L)
    for (rep <- 1 to 2) {
      L.jobNanos = 0; L.nJobs = 0
      val t0 = System.nanoTime()
      val m = GdMf.fit(ratings(sfDir),
        GdMf.Config(nFactors = k, epochs = epochs, collectErrors = true))
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(null) // no-op placeholder
      println(f"[probe] rep=$rep wall=$wall%.2fs jobs=${L.nJobs} " +
        f"jobTime=${L.jobNanos / 1e9}%.2fs driverGap=${wall - L.jobNanos / 1e9}%.2fs " +
        f"perEpochWall=${wall / epochs}%.3fs perEpochGap=${(wall - L.jobNanos / 1e9) / epochs}%.3fs")
      m.release()
    }
    spark.stop()
  }
}
