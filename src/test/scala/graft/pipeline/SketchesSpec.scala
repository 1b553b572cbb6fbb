package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Portable HLL sketches (q125/q126): estimator accuracy against the
  * exact distinct count, merge-equals-whole, and the null/identity
  * edge cases the register contract promises.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllEstimate is within 5% of the exact distinct count at p=12") {
    val n = 20000
    val df = spark.range(n * 3)
      .select((col("id") % n).cast("string").as("k"))
    val regs = PortableSketches.hllRegisters(df, col("k"), p = 12)
    val est = PortableSketches.hllEstimate(regs, p = 12)
    val err = math.abs(est - n) / n
    // standard error at p=12 is 1.04/sqrt(4096) ≈ 1.6%; 5% is 3σ
    assert(err < 0.05, s"estimate $est vs exact $n (err $err)")
  }

  test("small-range linear counting: exact-ish at tiny cardinalities") {
    val df = spark.range(50).select(col("id").cast("string").as("k"))
    val est = PortableSketches.hllEstimate(
      PortableSketches.hllRegisters(df, col("k")), p = 12)
    assert(math.abs(est - 50) < 3, s"linear-counting estimate $est vs 50")
  }

  test("merge of shard registers equals whole-corpus registers") {
    val df = spark.range(5000)
      .select(col("id"), (col("id") % 1000).cast("string").as("k"))
    val whole = PortableSketches.hllRegisters(df, col("k"))
      .as[(Long, Int)].collect().toSet
    val merged = PortableSketches.hllMerge(
      PortableSketches.hllRegisters(df.filter(col("id") % 2 === 0), col("k")),
      PortableSketches.hllRegisters(df.filter(col("id") % 2 === 1), col("k")))
      .as[(Long, Int)].collect().toSet
    assert(merged === whole)
  }

  test("cmEstimate never undercounts and is near-exact at low load") {
    // 100 keys into 4×1024 cells: collisions are rare, so estimates
    // should equal true counts for most keys and never be below them
    val df = spark.range(10000)
      .select((col("id") % 100).cast("string").as("k"))
    val sketch = PortableSketches.cmSketch(df, col("k"))
    val exact = df.groupBy("k").count().as[(String, Long)].collect().toMap
    var exactHits = 0
    for ((k, n) <- exact) {
      val est = PortableSketches.cmEstimate(sketch, k)
      assert(est >= n, s"CM undercounted $k: $est < $n")
      if (est == n) exactHits += 1
    }
    assert(exactHits >= 95, s"only $exactHits/100 exact at low load")
  }

  test("cmMerge of shard sketches equals the whole-corpus sketch") {
    val df = spark.range(5000)
      .select(col("id"), (col("id") % 40).cast("string").as("k"))
    val whole = PortableSketches.cmSketch(df, col("k"))
      .as[(Int, Long, Long)].collect().toSet
    val merged = PortableSketches.cmMerge(
      PortableSketches.cmSketch(df.filter(col("id") % 2 === 0), col("k")),
      PortableSketches.cmSketch(df.filter(col("id") % 2 === 1), col("k")))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
  }

  test("histQuantile is within one bucket width of the exact quantile") {
    val df = spark.range(10000).select((col("id") % 1000).as("v"))
    val regs = PortableSketches.histRegisters(df, col("v"),
      lo = 0.0, hi = 1000.0, buckets = 100)
    // exact p50 of 0..999 uniform = 499.5; bucket width 10
    val p50 = PortableSketches.histQuantile(regs, 0.5, 0.0, 1000.0, 100)
    assert(math.abs(p50 - 499.5) <= 10.0, s"p50 estimate $p50")
    val p95 = PortableSketches.histQuantile(regs, 0.95, 0.0, 1000.0, 100)
    assert(math.abs(p95 - 949.5) <= 10.0, s"p95 estimate $p95")
  }

  test("histMerge equals whole; out-of-range values clamp to edge buckets") {
    val df = spark.range(1000).select((col("id") - 100).as("v"))
    val whole = PortableSketches.histRegisters(df, col("v"), 0.0, 500.0, 10)
      .as[(Long, Long)].collect().toSet
    val merged = PortableSketches.histMerge(
      PortableSketches.histRegisters(df.filter(col("v") % 2 === 0),
        col("v"), 0.0, 500.0, 10),
      // =!= 0, not === 1: Spark's % keeps the dividend's sign, so
      // negative odd values sit at -1
      PortableSketches.histRegisters(df.filter(col("v") % 2 =!= 0),
        col("v"), 0.0, 500.0, 10))
      .as[(Long, Long)].collect().toSet
    assert(merged === whole)
    val m = whole.toMap
    assert(m(0L) >= 100L, "negatives must clamp into bucket 0")
    assert(m(9L) >= 400L, "overflow values must clamp into the top bucket")
  }

  test("bloomProbe: no false negatives; false positives rare at 16 bits/key") {
    val members = spark.range(2000)
      .select(concat(lit("m"), col("id")).as("k"))
    val bloom = PortableSketches.bloomBits(members, col("k"))
    val probed = PortableSketches.bloomProbe(
      members.unionByName(
        spark.range(2000).select(concat(lit("x"), col("id")).as("k"))),
      col("k"), bloom)
      .select(col("k"), col("might_contain")).as[(String, Boolean)].collect()
    val (ms, xs) = probed.partition(_._1.startsWith("m"))
    assert(ms.forall(_._2), "a member was reported absent (false negative)")
    val fpr = xs.count(_._2).toDouble / xs.size
    // 5 hashes into 65536 bits for 2000 keys → theoretical FPR ~1e-4
    assert(fpr < 0.01, s"false-positive rate too high: $fpr")
  }

  test("hllRegistersBy: each group's slice equals its standalone sketch") {
    val df = spark.range(6000).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") % 500).cast("string").as("k"))
    val grouped = PortableSketches.hllRegistersBy(df, col("g"), col("k"))
    for (g <- Seq("0", "1", "2")) {
      val slice = grouped.filter(col("group") === g)
        .select(col("bucket"), col("max_rho"))
        .as[(Long, Int)].collect().toSet
      val standalone = PortableSketches.hllRegisters(
        df.filter(col("g") === g), col("k"))
        .as[(Long, Int)].collect().toSet
      assert(slice === standalone, s"group $g slice diverged")
    }
  }

  test("bloomProbe verdicts are per-key: duplicate rows don't break membership") {
    // regression (round-10 review find): hits grouped per key must not
    // pool duplicate rows' probes — 2 rows of a member key counted
    // 2·numHashes hits and flipped a true member to false
    val members = Seq("a", "b").toDF("k")
    val bloom = PortableSketches.bloomBits(members, col("k"))
    val probed = PortableSketches.bloomProbe(
      Seq("a", "a", "a", "b", "z", "z").toDF("k"), col("k"), bloom)
      .select(col("k"), col("might_contain")).as[(String, Boolean)]
      .collect()
    assert(probed.filter(_._1 == "a").forall(_._2), "duplicated member lost")
    assert(probed.filter(_._1 == "b").forall(_._2))
    assert(probed.count(_._1 == "a") === 3, "row multiplicity must survive")
  }

  test("bloomMerge equals the whole-set filter; null keys probe false") {
    val a = Seq("a", "b").toDF("k")
    val b = Seq("b", "c").toDF("k")
    val whole = PortableSketches.bloomBits(a.unionByName(b), col("k"))
      .as[Long].collect().toSet
    val merged = PortableSketches.bloomMerge(
      PortableSketches.bloomBits(a, col("k")),
      PortableSketches.bloomBits(b, col("k")))
      .as[Long].collect().toSet
    assert(merged === whole)
    val gotNull = PortableSketches.bloomProbe(
      Seq(Option("a"), None).toDF("k"), col("k"),
      PortableSketches.bloomBits(a, col("k")))
      .select(col("k"), col("might_contain")).as[(Option[String], Boolean)]
      .collect().toMap
    assert(gotNull(Some("a")) === true)
    assert(gotNull(None) === false, "null key must never 'might contain'")
  }

  test("bottomK is stable under partitioning and merges shard-wise") {
    val df = spark.range(5000).select(col("id").cast("string").as("k"))
    val whole = PortableSketches.bottomK(df, col("k"), 64)
      .as[(String, Long)].collect().toSet
    val repart = PortableSketches.bottomK(df.repartition(5), col("k"), 64)
      .as[(String, Long)].collect().toSet
    assert(repart === whole)
    val merged = PortableSketches.bottomKMerge(
      PortableSketches.bottomK(df.filter(col("id") % 2 === 0), col("k"), 64),
      PortableSketches.bottomK(df.filter(col("id") % 2 === 1), col("k"), 64),
      64).as[(String, Long)].collect().toSet
    assert(merged === whole)
  }

  test("kmvEstimate: ~exact below k, within 3σ above it") {
    val small = spark.range(40).select(col("id").cast("string").as("k"))
    assert(PortableSketches.kmvEstimate(
      PortableSketches.bottomK(small, col("k"), 64), 64) === 40.0)
    val n = 20000
    val big = spark.range(n.toLong * 2)
      .select((col("id") % n).cast("string").as("k"))
    val est = PortableSketches.kmvEstimate(
      PortableSketches.bottomK(big, col("k"), 256), 256)
    val err = math.abs(est - n) / n
    // KMV std error ≈ 1/sqrt(k−2) ≈ 6.3% at k=256; 20% is >3σ
    assert(err < 0.2, s"KMV estimate $est vs exact $n (err $err)")
  }

  test("cmHeavyHitters finds every true heavy hitter, estimates never undercount") {
    // key "hot" appears 5000 times; 100 background keys 50 times each
    val hot = spark.range(5000).select(lit("hot").as("k"))
    val cold = spark.range(5000)
      .select(concat(lit("c"), col("id") % 100).as("k"))
    val df = hot.unionByName(cold)
    val sketch = PortableSketches.cmSketch(df, col("k"))
    val hh = PortableSketches.cmHeavyHitters(
      sketch, df.select(col("k")).distinct(), col("k"), minCount = 1000)
      .as[(String, Long)].collect().toMap
    assert(hh.contains("hot"), s"missed the heavy hitter: $hh")
    assert(hh("hot") >= 5000L, "CM must never undercount")
    // nothing cold can exceed the threshold unless collisions add 20x
    assert(hh.keySet.forall(_ == "hot"), s"false heavy hitters: $hh")
  }

  test("duplicates don't move registers; nulls are excluded") {
    val base = Seq("a", "b", "c").toDF("k")
    val dups = Seq("a", "a", "b", "b", "b", "c").toDF("k")
    val withNulls = (Seq(Some("a"), None, Some("b"), Some("c"), None))
      .toDF("k")
    def regs(df: org.apache.spark.sql.DataFrame) =
      PortableSketches.hllRegisters(df, col("k"))
        .as[(Long, Int)].collect().toSet
    assert(regs(dups) === regs(base))
    assert(regs(withNulls) === regs(base))
  }
}
