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

  /** Generic factor-model scoring.
    *
    * @param userState (user, u_factors ARRAY<DOUBLE>, u_bias DOUBLE)
    * @param itemState (item, i_factors ARRAY<DOUBLE>, i_bias DOUBLE)
    */
  def predict(
      test: DataFrame,
      userState: DataFrame,
      itemState: DataFrame,
      stats: graft.encode.RatingStats,
      predCol: String = "prediction",
      broadcastThresholdBytes: Long = 10L << 20): DataFrame = {
    // broadcast the per-id states only while they FIT: trained states
    // are typically fresh-checkpointed (no planner stats, so
    // auto-broadcast can't engage — hence an explicit hint), but
    // |users|/|items| at production scale can be 1e8+, where a FORCED
    // hint OOMs the driver and a shuffle join is fine (the
    // Encoding/itemItemTopK size-gate idiom). One probe row reads the
    // factor width; ~8 bytes/factor + 48 bytes row overhead.
    def gated(st: DataFrame, factorsCol: String): DataFrame = {
      // coalesce: a state row with NULL factors (outer-join-assembled
      // states) must not NPE the size probe — width 0 is conservative
      val k = st.select(coalesce(size(col(factorsCol)), lit(0))).take(1)
        .headOption.map(_.getInt(0)).getOrElse(0)
      val est = st.count() * (8L * k + 48L)
      if (est <= broadcastThresholdBytes) broadcast(st) else st
    }
    val scored = test
      .join(gated(userState, "u_factors"), Seq("user"), "left_outer")
      .join(gated(itemState, "i_factors"), Seq("item"), "left_outer")
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
