package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable sketches: summaries whose STATE is pure integers
  * derived from `xxhash64`, so any two runs — on this engine, another
  * cluster, or the DuckDB oracle — build bit-identical sketch state
  * from the same data. The built-in `approx_count_distinct` is the
  * contrast: its HLL++ registers are implementation-defined, which is
  * why q36 stays rows-only while the q125/q126 register gates are
  * hash-green.
  *
  * The 100 TB story: registers are tiny (2^p rows, ≤ 65536), the
  * register aggregation is a map-side-combinable `max` per bucket (one
  * shuffle of ≤ 2^p rows per partition, never of keys), and merging
  * two corpora's sketches is union+max over register rows — per-shard
  * sketches fold into global cardinalities without ever rescanning or
  * moving the data. That is the shape a corpus-stats service wants
  * (per-source distinct URLs/users/tokens across thousands of shards).
  */
object PortableSketches {

  /** HyperLogLog registers of the key column: one row per touched
    * bucket, `(bucket, max_rho)` — bucket = top `p` bits of
    * xxhash64(key as string), rho = 1 + leading zeros of the remaining
    * 64−p bits (capped at 65−p when they are all zero). Pure integer
    * state; NULL keys are excluded (they carry no identity to count).
    *
    * The leading-zero count is `65 − length(bin(rem))`: both this
    * engine and the oracle dialect print minimal-length binary for the
    * same 64-bit pattern, so no custom expression is needed and the
    * whole pass stays in whole-stage codegen.
    */
  def hllRegisters(df: DataFrame, key: Column, p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val h = xxhash64(key.cast("string"))
    val bucket = shiftrightunsigned(h, 64 - p)
    val rem = shiftleft(h, p)
    val rho = when(rem === 0, lit(64 - p + 1))
      .otherwise(lit(65) - length(bin(rem)))
    df.filter(key.isNotNull)
      .select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("max_rho"))
  }

  /** Fold two register sets: union + max per bucket — the sketch merge
    * that makes per-shard cardinality work composable. Registers from
    * [[hllRegisters]] over disjoint (or overlapping — max absorbs)
    * shards merge to exactly the whole-corpus registers.
    */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(max(col("max_rho")).as("max_rho"))

  /** Cardinality estimate from a register set (standard HLL estimator
    * with the linear-counting small-range correction). Driver-side:
    * the registers are at most 2^p rows.
    */
  def hllEstimate(registers: DataFrame, p: Int = 12): Double = {
    val m = 1 << p
    val regs = registers.select(col("bucket"), col("max_rho")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val zeros = m - regs.size
    val sum = (0 until m)
      .map(b => math.pow(2.0, -regs.getOrElse(b.toLong, 0).toDouble)).sum
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}
