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
