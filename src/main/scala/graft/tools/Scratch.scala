package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Ad-hoc timing harness for operator stages (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = d.unionAll(d.select(col("doc_id") + 100000,
      concat(col("text"), lit(" near duplicate suffix marker"))))
      .repartition(32)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    import graft.recommender.GdMf
    val r = graft.io.Tables.ratingsFromEvents(spark, dir)
    def fit(ep: Int, collect: Boolean) = {
      val t0 = System.nanoTime()
      GdMf.fit(r, GdMf.Config(nFactors = 30, epochs = ep, collectErrors = collect))
      (System.nanoTime() - t0) / 1e9
    }
    val w = fit(1, false) // warm
    val e1 = fit(1, false)
    val e5 = fit(5, false)
    val e5c = fit(5, true)
    println(f"warm=$w%.1f fit(1)=$e1%.1f fit(5)=$e5%.1f fit(5,collect)=$e5c%.1f marginal/epoch=${(e5 - e1) / 4}%.2f collectCost/epoch=${(e5c - e5) / 5}%.2f")
    spark.stop()
  }
}
