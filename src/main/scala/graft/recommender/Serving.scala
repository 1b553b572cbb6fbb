package graft.recommender

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predict-time serving surface (reference `models/als.py:193-217`).
  *
  * The reference predicts with a driver-side Python loop over test rows
  * (dict lookups + NumPy dot) — O(|test|) on one core. Here prediction is
  * a distributed plan: two left-outer equi-joins (user state, item state)
  * + a scoring expression + clip + cold-start fallback, all inside
  * whole-stage codegen. The per-id state tables are broadcast only
  * while their estimated bytes fit the threshold — an oversized state
  * degrades to a shuffle join instead of a driver OOM.
  *
  * Semantics preserved exactly (SURVEY §7.1.3):
  *  - known user AND known item → dot(u,i) + biases + mean, clipped to
  *    the observed [min,max] rating range;
  *  - anything unknown → raw global mean, NOT clipped, biases ignored.
  */
object Serving {

  /** dot(u_factors, i_factors) as a native codegen'd Catalyst
    * expression (graft.functions.DotProduct) — no UDF, no interpreted
    * higher-order function, no driver loop (reference
    * `models/als.py:211`).
    */
  def dot(u: Column, i: Column): Column =
    graft.functions.VectorExpressions.dot(u, i)

  def clip(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** Pre-known size statistics of a state table — the
    * `AnnIndex.statsHint` precedent: a hot serving path that already
    * knows its state's row count and factor width (a fit pipeline
    * counts users/items anyway) passes them here and [[predict]] runs
    * ZERO probe jobs before the real join.
    */
  case class StateStats(rows: Long, factorWidth: Int) {
    require(rows >= 0, s"rows must be >= 0, got $rows")
    require(factorWidth >= 0, s"factorWidth must be >= 0, got $factorWidth")
  }

  /** Generic factor-model scoring.
    *
    * @param userState (user, u_factors ARRAY<DOUBLE>, u_bias DOUBLE)
    * @param itemState (item, i_factors ARRAY<DOUBLE>, i_bias DOUBLE)
    * @param userStateStats / itemStateStats optional known (rows,
    *   factor width) — supplied, the size gate runs no probe job on
    *   that state (the hot-path bypass)
    */
  def predict(
      test: DataFrame,
      userState: DataFrame,
      itemState: DataFrame,
      stats: graft.encode.RatingStats,
      predCol: String = "prediction",
      broadcastThresholdBytes: Long = 10L << 20,
      userStateStats: Option[StateStats] = None,
      itemStateStats: Option[StateStats] = None): DataFrame = {
    // broadcast the per-id states only while they FIT: trained states
    // are typically fresh-checkpointed (no planner stats, so
    // auto-broadcast can't engage — hence an explicit hint), but
    // |users|/|items| at production scale can be 1e8+, where a FORCED
    // hint OOMs the driver and a shuffle join is fine (the
    // Encoding/itemItemTopK size-gate idiom). Without a stats hint,
    // ONE agg job probes count + MAX factor width together — max, not
    // a first-row sample: a NULL-factors or narrow first row would
    // UNDERestimate the state and force a broadcast in the unsafe
    // direction (driver OOM); max over non-null widths is the true
    // upper bound, and an all-NULL state genuinely has no arrays.
    // ~8 bytes/factor + 48 bytes row overhead.
    def gated(st: DataFrame, factorsCol: String,
        hint: Option[StateStats]): DataFrame = {
      val (n, k) = hint match {
        case Some(s) => (s.rows, s.factorWidth)
        case None =>
          val r = st.agg(count(lit(1)), max(size(col(factorsCol)))).head()
          (r.getLong(0), if (r.isNullAt(1)) 0 else r.getInt(1))
      }
      val est = n * (8L * k + 48L)
      if (est <= broadcastThresholdBytes) broadcast(st) else st
    }
    val scored = test
      .join(gated(userState, "u_factors", userStateStats),
        Seq("user"), "left_outer")
      .join(gated(itemState, "i_factors", itemStateStats),
        Seq("item"), "left_outer")
    val known = col("u_factors").isNotNull && col("i_factors").isNotNull
    val score = dot(col("u_factors"), col("i_factors")) +
      col("u_bias") + col("i_bias") + lit(stats.meanRating)
    scored
      .withColumn(predCol,
        when(known, clip(score, stats.minRating, stats.maxRating))
          .otherwise(lit(stats.meanRating)))
      .drop("u_factors", "i_factors", "u_bias", "i_bias")
  }
}
