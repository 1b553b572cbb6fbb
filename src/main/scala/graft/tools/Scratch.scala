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

    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    time("q43 run 1 (64 perm)") {
      Dedup.minHashPairs(docs, "doc_id", "text", 5, 16, 4, 0.5).count()
    }
    time("q43 run 2 (warm)") {
      Dedup.minHashPairs(docs, "doc_id", "text", 5, 16, 4, 0.5).count()
    }
    time("q43 32 perm") {
      Dedup.minHashPairs(docs, "doc_id", "text", 5, 16, 2, 0.5).count()
    }
    spark.stop()
  }
}
