package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Headliners cover every operator family at its production
  * configuration: scan/ETL, dedup (exact + windowed + MinHash), aggs,
  * joins (broadcast + multiway), windows, serving/eval, ALS training,
  * text profiling, ANN, streaming. A session-warmup query runs first so
  * codegen/JIT cost isn't attributed to the first headliner.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q01_project_filter",
    "q03_dedup_keeplast",
    "q09_csv_roundtrip",
    "q10_tpch_q1",
    "q13_join_broadcast",
    "q14_join_multiway",
    "q17_window_topk",
    "q19_global_topk",
    "q25_bias_serve_eval",
    "q30_mllib_als_eval",
    "q34_funk_svd_k30",
    "q35_als_gd_k30",
    "q40_text_profile",
    "q43_minhash_neardup",
    "q47_ann_bruteforce",
    "q49_item_item_sim",
    "q55_stream_window_agg",
    "q61_sessionize",
    "q67_range_join",
    // round-6 surface, heaviest first: substring dedup (3 corpus
    // shuffles), paragraph dedup (2 + reassembly), trained-BPE counts
    // (2 jobs/round × 6 training rounds + the count scan), and the
    // bucketed-table streaming near-dup (per-trigger O(batch) probes)
    "q97_paragraph_dedup",
    "q99_substring_dedup",
    "q103_bpe_token_count",
    "q95_stream_neardup",
    // round-7 surface: the quality gate is the round's heaviest new
    // map pass (4 regex/HOF features per doc) and stands in for the
    // whole map-only family (q110/q115 share the shape); importance
    // resampling is the round's heaviest new SHUFFLE op (gram explode
    // + two bucket aggs + per-doc sum)
    "q113_quality_score",
    "q117_importance_resample")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // typed-UDAF aggregates (minhash/simhash/gradients) should stay
      // hash-based for realistic group counts, not fall back to
      // sort-based at 128 keys
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up pass at the smallest scale factor: JIT + codegen +
    // interpreted-expression classloading dominate first execution
    // (measured ~12s of a 16s first minhash run), and a throughput
    // benchmark should measure the operator, not JVM warmup.
    val warmDir = {
      val w = "/root/testdata/sf0.001"
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    headline.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }

    // steady-state throughput: min over repeated runs (run-to-run
    // variance from GC/cache pressure at local[32] is ±50% on the
    // heavier queries; min-of-N is the standard estimator). Uniform
    // min-of-3 for EVERY query — a per-query adaptive rep count makes
    // heavy and light queries use different estimators, so cross-query
    // and round-over-round comparisons were slightly apples-to-oranges.
    val reps = 3
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      // GC pressure left by the previous query is the main source of
      // run-to-run variance at local[32]; start each query clean
      System.gc()
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e")
            None // a failure must not masquerade as a fast run
        }
      }
      val times = (1 to reps).flatMap(_ => once())
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    // Derived sec/epoch figures (the BASELINE.md comparison units:
    // reference FunkSVD 9.47 s/epoch, ALS 14.39 s/epoch) — extra keys
    // inside the queries map per the driver contract; excluded from
    // the total, which sums only measured queries.
    val derived = Seq(
      "x_funk_svd_sec_per_epoch" ->
        results.toMap.getOrElse("q34_funk_svd_k30", -6.0) / 6,
      "x_als_gd_sec_per_epoch" ->
        results.toMap.getOrElse("q35_als_gd_k30", -6.0) / 6)
    val qs = (results ++ derived).map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
