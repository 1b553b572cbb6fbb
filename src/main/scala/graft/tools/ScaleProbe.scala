package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing for the Bench scale slots (not part of the driver
  * contract): `runMain graft.tools.ScaleProbe <sfDir> <cpus>
  * [ccReps routeReps capReps]` — one warm pass at sf0.001, then two
  * timed passes per slot under the bench session config, for
  * calibrating replication factors and checking the low-vs-high core
  * ratio without a full bench run.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleProbe <sfDir> <cpus> [cc route cap]")
    val sfDir = args(0)
    val cpus = args(1)
    val cc = if (args.length > 2) args(2).toInt else 1024
    val route = if (args.length > 3) args(3).toInt else 16
    val cap = if (args.length > 4) args(4).toInt else 4096
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("GRAFT_SCALE_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = s.stageInfo
            val ms = for {
              a <- i.completionTime; b <- i.submissionTime
            } yield a - b
            if (ms.exists(_ > 300))
              println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
                f"${ms.getOrElse(0L) / 1000.0}%7.2f s  ${i.name.take(60)}")
          }
        })
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[scale $cpus%s] $label%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val warmDir = {
      val w = "/root/testdata/sf0.001"
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    t("warm-cc")(graft.Bench.scaleCc(spark, warmDir, 64))
    t("warm-route")(graft.Bench.scaleRoute(spark, warmDir, 4))
    t("warm-cap")(graft.Bench.scaleCap(spark, warmDir, 64))
    (1 to 2).foreach { i =>
      t(s"cc-$cc-$i")(graft.Bench.scaleCc(spark, sfDir, cc))
      t(s"route-$route-$i")(graft.Bench.scaleRoute(spark, sfDir, route))
      t(s"cap-$cap-$i")(graft.Bench.scaleCap(spark, sfDir, cap))
    }
    spark.stop()
  }
}
