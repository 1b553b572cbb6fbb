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

  /** Per-group HLL registers: `(group, bucket, max_rho)` — every
    * group's cardinality sketch in ONE pass over the data (the
    * production ask: distinct users per domain, per source, per day).
    * Same posture as [[hllRegisters]] with the group key joining the
    * shuffle key; shuffle volume is ≤ |groups|·2^p register rows, and
    * a single group's registers slice out for [[hllEstimate]].
    */
  def hllRegistersBy(df: DataFrame, group: Column, key: Column,
      p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val h = xxhash64(key.cast("string"))
    val bucket = shiftrightunsigned(h, 64 - p)
    val rem = shiftleft(h, p)
    val rho = when(rem === 0, lit(64 - p + 1))
      .otherwise(lit(65) - length(bin(rem)))
    df.filter(key.isNotNull)
      .select(group.as("group"), bucket.as("bucket"), rho.as("rho"))
      .groupBy("group", "bucket").agg(max(col("rho")).as("max_rho"))
  }

  /** Count-Min sketch of key frequencies: `(row, col, cnt)` cells,
    * col = low log2(width) bits of xxhash64("j:key") for hash row j.
    * Width must be a power of two so the signed-vs-unsigned modulo
    * agrees across engines (low bits are the same bit pattern either
    * way). Same scale posture as [[hllRegisters]]: the cell
    * aggregation is a map-side-combinable count over ≤ depth·width
    * cells, shard sketches merge by summing cells, and a key's
    * frequency estimate is the min over its depth cells — the
    * standard ε=e/width overestimate bound, never an undercount.
    * NULL keys are excluded.
    */
  def cmSketch(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    val rows = (0 until depth).map { j =>
      struct(lit(j).as("row"),
        xxhash64(concat_ws(":", lit(j), key.cast("string")))
          .bitwiseAND(lit((width - 1).toLong)).as("col"))
    }
    df.filter(key.isNotNull)
      .select(explode(array(rows: _*)).as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold two Count-Min sketches: union + sum per cell. */
  def cmMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "col")
      .agg(sum(col("cnt")).as("cnt"))

  /** Point frequency estimate for `key` from a collected sketch:
    * min over the key's depth cells (missing cell = 0). Driver-side;
    * the sketch is at most depth·width rows.
    */
  def cmEstimate(sketch: DataFrame, key: String, depth: Int = 4,
      width: Int = 1024): Long = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val cells = sketch.select(col("row"), col("col"), col("cnt"))
      .as[(Int, Long, Long)].collect()
      .map { case (r, c, n) => ((r, c), n) }.toMap
    (0 until depth).map { j =>
      // driver-side eval of the same xxhash64 the sketch pass used —
      // no per-probe Spark job
      val h = graft.functions.HashUtil.xxh64String(s"$j:$key") &
        (width - 1).toLong
      cells.getOrElse((j, h), 0L)
    }.min
  }

  /** Fixed-range histogram registers of a numeric column: `(bucket,
    * cnt)` with bucket = clamp(floor((v − lo) / (hi − lo) · buckets)).
    * The bucket arithmetic is one fixed-shape double chain (exact
    * cross-engine, same argument as the fixed ANN twins), the counts
    * are integers, and shard histograms merge by summing — the
    * portable stand-in for t-digest quantiles (q36's
    * percentile_approx stays rows-only; this family hash-gates).
    * Values outside [lo, hi) land in the edge buckets; NULLs are
    * excluded.
    */
  def histRegisters(df: DataFrame, value: Column, lo: Double, hi: Double,
      buckets: Int = 64): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val raw = floor((value.cast("double") - lit(lo)) / lit(hi - lo)
      * lit(buckets.toDouble)).cast("long")
    val b = least(greatest(raw, lit(0L)), lit(buckets.toLong - 1))
    df.filter(value.isNotNull)
      .select(b.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Fold two histograms: union + sum per bucket. */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimate from collected histogram registers: the left
    * edge of the bucket where the cumulative count crosses q·N —
    * error ≤ one bucket width. Driver-side.
    */
  def histQuantile(registers: DataFrame, q: Double, lo: Double, hi: Double,
      buckets: Int = 64): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    val regs = registers.select(col("bucket"), col("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = regs.map(_._2).sum
    val target = q * total
    var cum = 0L
    for ((b, n) <- regs) {
      cum += n
      if (cum >= target) return lo + (hi - lo) * b / buckets
    }
    hi
  }

  /** Point estimates for a relation of candidate keys against a
    * Count-Min sketch — the heavy-hitter scan: each candidate's
    * estimate is the min over its depth cells, computed relationally
    * (candidates explode to depth cell probes, join the broadcast
    * sketch, min per key — candidates never shuffle). Returns
    * (key, est_cnt) for candidates whose estimate ≥ `minCount`.
    * Estimates never undercount, so no true heavy hitter is missed.
    */
  def cmHeavyHitters(sketch: DataFrame, candidates: DataFrame,
      key: Column, minCount: Long, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    val probes = (0 until depth).map { j =>
      struct(lit(j).as("row"),
        xxhash64(concat_ws(":", lit(j), key.cast("string")))
          .bitwiseAND(lit((width - 1).toLong)).as("col"))
    }
    candidates.filter(key.isNotNull)
      .select(key.cast("string").as("key"),
        explode(array(probes: _*)).as("cell"))
      .select(col("key"), col("cell.row").as("row"), col("cell.col").as("col"))
      .join(broadcast(sketch.select(col("row"), col("col"), col("cnt"))),
        Seq("row", "col"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
      .filter(col("est_cnt") >= minCount)
  }

  /** Bottom-k consistent sample — the k distinct keys with the
    * smallest xxhash64, with their hashes: a STABLE corpus sample
    * (the same keys survive across runs, shards, partitionings and
    * engines — signed-long hash order on both sides) that doubles as
    * the KMV distinct-count sketch. Global top-k is the
    * TakeOrderedAndProject shape: per-partition k candidates, never a
    * global sort. Merging shards = union + re-bottom-k
    * ([[bottomKMerge]]).
    */
  def bottomK(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    df.filter(key.isNotNull)
      .select(key.cast("string").as("key"))
      .distinct()
      .select(col("key"), xxhash64(col("key")).as("h"))
      .orderBy(col("h"), col("key"))
      .limit(k)
  }

  /** Fold two bottom-k samples (distinct absorbs overlap). */
  def bottomKMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b).distinct()
      .orderBy(col("h"), col("key")).limit(k)

  /** KMV distinct-count estimate from a FULL bottom-k sample (fewer
    * than k rows means the sample IS the distinct set — exact). The
    * signed hashes map to (0,1) via the unsigned view; est =
    * (k−1)/u_(k), the classic KMV estimator.
    */
  def kmvEstimate(sample: DataFrame, k: Int): Double = {
    val hs = sample.select(col("h")).collect().map(_.getLong(0)).sorted
    if (hs.length < k) hs.length.toDouble
    else {
      val unsigned = BigDecimal(BigInt(hs.last) + (BigInt(1) << 63))
      val u = (unsigned / BigDecimal(BigInt(1) << 64)).toDouble
      (k - 1) / u
    }
  }

  /** Portable Bloom filter: the SET-BIT relation `(bit)` of the key
    * column under `numHashes` xxhash64 functions into a power-of-two
    * `bits` space (same low-bit agreement argument as [[cmSketch]]).
    * Distinct bit rows ARE the filter — mergeable by union+distinct,
    * at most `bits` rows, and engine-portable where the built-in
    * `BloomFilterAggregate`'s byte layout is not.
    *
    * The 100 TB use is membership pre-filtering where the exact set
    * is too big to broadcast comfortably: a benchmark-fingerprint
    * Bloom is ~10× smaller than the fingerprint set, and
    * [[bloomProbe]] keeps the probe a broadcast join against bit
    * rows. False positives only (tunable via bits/numHashes) — the
    * right direction for decontamination, where a false positive
    * merely drops a clean document.
    */
  def bloomBits(df: DataFrame, key: Column, numHashes: Int = 5,
      bits: Int = 1 << 16): DataFrame = {
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1,16], got $numHashes")
    require(bits >= 2 && (bits & (bits - 1)) == 0,
      s"bits must be a power of two, got $bits")
    val hs = (0 until numHashes).map { j =>
      xxhash64(concat_ws(":", lit(j), key.cast("string")))
        .bitwiseAND(lit((bits - 1).toLong))
    }
    df.filter(key.isNotNull)
      .select(explode(array(hs: _*)).as("bit"))
      .distinct()
  }

  /** Fold two Bloom filters: union + distinct. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** Per-row membership probe against a Bloom bit relation: returns
    * `df` plus a `might_contain` boolean — true iff ALL `numHashes`
    * bits of the key are set. The bit relation broadcasts (≤ `bits`
    * rows); the probed side never shuffles.
    */
  def bloomProbe(df: DataFrame, key: Column, bloom: DataFrame,
      numHashes: Int = 5, bits: Int = 1 << 16): DataFrame = {
    val hs = (0 until numHashes).map { j =>
      xxhash64(concat_ws(":", lit(j), key.cast("string")))
        .bitwiseAND(lit((bits - 1).toLong))
    }
    // correlated-free formulation: explode the key's bits, count how
    // many exist in the (broadcast) filter, compare to numHashes.
    // DISTINCT the bit arrays before exploding — duplicate key ROWS
    // would otherwise pool into one group and count 2·numHashes hits
    // (a false NEGATIVE for a true member, which the Bloom contract
    // forbids). Duplicate bits WITHIN one array (a self-collision)
    // must keep counting per hash index — the oracle counts per
    // (key, j) row — so only whole-array duplicates collapse.
    val withId = df.withColumn("__bits", array(hs: _*))
    val hits = withId
      .select(col("__bits")).distinct()
      .select(col("__bits"), explode(col("__bits")).as("bit"))
      .join(broadcast(bloom.select(col("bit"))), Seq("bit"))
      .groupBy(col("__bits")).agg(count(lit(1)).as("__hits"))
    withId
      .join(hits, Seq("__bits"), "left")
      // NULL keys are definitively absent, never "might contain":
      // concat_ws would silently hash the bare "j:" prefix for them
      .withColumn("might_contain",
        when(key.isNull, lit(false))
          .otherwise(coalesce(col("__hits"), lit(0L)) === numHashes))
      .drop("__bits", "__hits")
  }

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
