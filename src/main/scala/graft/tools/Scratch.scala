package graft.tools

import org.apache.spark.sql.SparkSession

import graft.recommender.GdMf

/** Ad-hoc timing harness for operator stages (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ratings = graft.io.Tables.ratingsFromEvents(spark, dir)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // job-count instrumentation (+ optional per-job trace)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val trace = new java.util.concurrent.atomic.AtomicBoolean(false)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (trace.get()) {
            val desc = Option(j.properties)
              .map(_.getProperty("spark.job.description", "")).getOrElse("")
            starts.put(j.jobId, (System.nanoTime(), desc.take(90)))
          }
          ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (trace.get()) Option(starts.remove(j.jobId)).foreach {
            case (t0, desc) =>
              println(f"[scratch]   job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.3f s  $desc")
          }
      })

    val r = ratings
    // warm
    time("warm: funk 1 epoch sf0.001") {
      GdMf.fit(graft.io.Tables.ratingsFromEvents(spark, "/root/testdata/sf0.001"),
        GdMf.Config(nFactors = 30, epochs = 1)).userState.count()
    }

    // traced single run: which jobs make up setup + 2 epochs
    trace.set(true)
    time("funk k=30 epochs=2 TRACED") {
      GdMf.fit(r, GdMf.Config(nFactors = 30, epochs = 2)).userState.count()
    }
    trace.set(false)

    for (ep <- Seq(0, 1, 3, 6)) {
      jobs.set(0)
      time(s"funk k=30 epochs=$ep") {
        GdMf.fit(r, GdMf.Config(nFactors = 30, epochs = ep)).userState.count()
      }
      println(s"[scratch]   jobs=${jobs.get()}")
    }
    for (ci <- Seq(1, 2, 3); rep <- 1 to 2) {
      jobs.set(0)
      time(s"funk k=30 epochs=6 ckptInterval=$ci rep$rep") {
        GdMf.fit(r, GdMf.Config(nFactors = 30, epochs = 6,
          checkpointInterval = ci)).userState.count()
      }
      println(s"[scratch]   jobs=${jobs.get()}")
    }
    // setup phases in isolation, mirroring fit's setup exactly
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    jobs.set(0)
    time("phase: ratings scan+parse") { r.count(); () }
    println(s"[scratch]   jobs=${jobs.get()}")
    val uDim = graft.encode.Encoding.dimension(r, "user", "time", "u_id")
    val iDim = graft.encode.Encoding.dimension(r, "item", "time", "i_id")
    jobs.set(0)
    time("phase: dimension(user)+dimension(item)") { uDim.count(); iDim.count(); () }
    println(s"[scratch]   jobs=${jobs.get()}")
    jobs.set(0)
    time("phase: ratingStats") { graft.encode.Encoding.ratingStats(r); () }
    println(s"[scratch]   jobs=${jobs.get()}")
    jobs.set(0)
    val facts = graft.encode.Encoding.encode(r, uDim, iDim)
      .select(col("u_id"), col("i_id"), col("rating"))
      .repartition(32, col("u_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("phase: facts encode+repartition+persist") { facts.count(); () }
    println(s"[scratch]   jobs=${jobs.get()}")
    facts.unpersist()
    spark.stop()
  }
}
