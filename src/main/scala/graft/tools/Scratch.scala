package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    def ratings = graft.io.Tables.ratingsFromEvents(spark, dir)
      .withColumn("event_id", monotonically_increasing_id()) // stand-in

    def q03(r: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("user", "item")
        .orderBy(col("time").desc, col("event_id").desc)
      r.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    }

    // warm
    time("warm scan")(graft.io.Tables.events(spark, dir).count())
    time("warm q03")(q03(ratings).count())

    time("scan only")(graft.io.Tables.events(spark, dir).count())
    time("scan+parse (forced)")(
      ratings.agg(sum(crc32(col("item")))).count())
    time("q03 as-is")(q03(ratings).count())
    val pre = ratings.repartition(32)
    time("q03 pre-repartitioned")(q03(pre).count())
    spark.stop()
  }
}
