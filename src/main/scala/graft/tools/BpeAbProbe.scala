package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B probe for the two 32k-merge OOV tokenization
  * kernels (dictionary-encoded vs per-occurrence replay) — the
  * measurement TODO.md asked for before re-deciding the default: one
  * JVM, shared warm-up, `rounds` alternating (dict, per-occ) runs,
  * report per-round seconds plus min and median. A single Bench run's
  * one-shot pair is inside the ±30 % run-to-run noise band; the
  * interleaved min is the comparable statistic.
  *
  * `runMain graft.tools.BpeAbProbe [sfDir] [rounds]`
  */
object BpeAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bpe-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths (JIT + codegen + kernel rank-index build)
    graft.Bench.bpe32kTokenize(spark, sfDir)
    graft.Bench.bpe32kTokenizePerOcc(spark, sfDir)
    val dict = Array.ofDim[Double](rounds)
    val perocc = Array.ofDim[Double](rounds)
    for (r <- 0 until rounds) {
      dict(r) = time(graft.Bench.bpe32kTokenize(spark, sfDir))
      perocc(r) = time(graft.Bench.bpe32kTokenizePerOcc(spark, sfDir))
    }
    def stats(a: Array[Double]): String = {
      val s = a.sorted
      val med = if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      f"min=${s.head}%.3f med=$med%.3f runs=[${a.map(x => f"$x%.3f").mkString(",")}]"
    }
    println(s"""BPEAB dict    ${stats(dict)}""")
    println(s"""BPEAB per-occ ${stats(perocc)}""")
    spark.stop()
  }
}
