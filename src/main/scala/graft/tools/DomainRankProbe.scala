package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost breakdown of the q137 domain-PageRank composition: times the
  * PSL canon checkpoint, the edge/node prep + 5-iteration loop, and a
  * second full run (warm codegen), so the fixed-vs-amortizing split
  * is measured instead of guessed.
  *
  * `runMain graft.tools.DomainRankProbe [sfDir]`
  */
object DomainRankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DRP $label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import org.apache.spark.sql.graftbridge.DatasetBridge
    for (round <- 1 to 2) {
      println(s"DRP -- round $round")
      val docs = graft.io.Tables.documents(spark, sfDir)
      // the EXACT q137 projection (shared helper) — a probe over a
      // simplified one-arm URL mix measured a different graph
      val canon = graft.SparkEntry.crawlDomainsOf(docs)
      val cp = time("canon checkpoint")(DatasetBridge.localCheckpointFresh(canon))
      val nn = time("count")(cp.df.count())
      val tgt = cp.df.select(col("doc_id").as("tid"), col("domain").as("dst"))
      val e0 = cp.df.select(((col("doc_id") * 7 + 11) % nn).as("tid"),
          col("domain").as("src"))
        .unionAll(cp.df.select(((col("doc_id") * 13 + 5) % nn).as("tid"),
          col("domain").as("src")))
      val e = e0.join(tgt, "tid").select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
      val ranks = time("pagerank 5 iter")(
        graft.pipeline.LinkAnalysis.pageRankFixed(e,
          cp.df.select(col("domain").as("node")).distinct()))
      time("collect")(ranks.collect())
      cp.release()
    }
    spark.stop()
  }
}
