package graft.recommender

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression metrics of the serving surface (reference
  * `models/als.py:219-223` `eval` → (mae, mse, rmse)).
  */
final case class Metrics(mae: Double, mse: Double, rmse: Double)

object Evaluator {

  /** MAE/MSE/RMSE in ONE distributed pass (the reference computes three
    * separate NumPy reductions on driver-collected arrays). A single
    * hash-free global aggregate: partial sums per partition, one final
    * reduce — O(1) driver memory at any scale.
    */
  def evaluate(df: DataFrame, labelCol: String, predCol: String): Metrics = {
    val err = col(predCol) - col(labelCol)
    val row = df.agg(
      avg(abs(err)).as("mae"),
      avg(err * err).as("mse")).head()
    val mae = row.getDouble(0)
    val mse = row.getDouble(1)
    Metrics(mae, mse, math.sqrt(mse))
  }

  /** Same metrics as a one-row DataFrame (for oracle-differential tests
    * and the `queries` surface).
    */
  def evaluateDf(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val err = col(predCol) - col(labelCol)
    df.agg(
      avg(abs(err)).as("mae"),
      avg(err * err).as("mse"),
      sqrt(avg(err * err)).as("rmse"))
  }

  /** Per-SLICE (cohort) regression metrics — "who is the model
    * failing for": the per-activity-tier / per-language / per-source
    * breakdown a single global MAE hides (a model can look fine on
    * average while being unusable for cold users). One
    * map-side-combinable aggregate keyed by the slice, |slices| rows
    * out; error averages accumulate FIXED-POINT (floor(x·10⁶) summed
    * as DECIMAL(38,0) — the house float-aggregation rule: double sums
    * are shuffle-order-dependent), so every slice row hash-gates. A
    * NULL slice is kept as its own cohort (e.g. cold users with no
    * train-side tier), never silently dropped.
    */
  def evaluateByDf(df: DataFrame, labelCol: String, predCol: String,
      sliceCol: String): DataFrame = {
    val err = col(predCol) - col(labelCol)
    def favg(c: org.apache.spark.sql.Column) =
      (sum(floor(c * lit(1e6))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .cast("double") / lit(1e6)) / count(c)
    df.groupBy(col(sliceCol)).agg(
      count(lit(1)).as("n"),
      favg(abs(err)).as("mae"),
      favg(err * err).as("mse"),
      sqrt(favg(err * err)).as("rmse"))
  }

  /** Per-rank DCG weights `floor(scale / log2(r+1))`, computed ONCE on
    * the driver and embedded as literals in BOTH engines' plans (the
    * oracle SQL is generated from the same array), so ranking metrics
    * are integer arithmetic end-to-end — no runtime float anywhere.
    */
  def dcgWeights(k: Int, scale: Long = 1000000L): Seq[Long] =
    (1 to k).map(r =>
      math.floor(scale / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** Top-N RANKING metrics — the implicit-recommender eval the
    * reference's regression metrics (mae/mse/rmse) cannot express:
    * per user, hits@k, reciprocal rank, DCG@k / ideal-DCG@k / NDCG@k
    * (Järvelin & Kekäläinen 2002, binary relevance). Everything is
    * fixed-point: DCG sums the embedded integer weights, RR is
    * `scale div firstHitRank`, NDCG is `(dcg·scale) div idcg` — exact
    * integral ops, so the whole per-user table hash-gates.
    *
    * Scale shape: one (user, item) equi-join of the k-capped recs
    * against the truth set, two map-side-combinable per-user
    * aggregates, and a |users|-row left join — never a users×items
    * product (recs are top-k by construction).
    *
    * @param recs  (userCol, itemCol, rankCol) — rank 1-based
    * @param truth (userCol, itemCol) held-out relevant pairs
    * @return per truth-user: (user, n_truth, hits, rr_fp, dcg_fp,
    *         idcg_fp, ndcg_fp); users with no hit report zeros for
    *         rr/dcg/ndcg.
    */
  def rankingMetrics(recs: DataFrame, truth: DataFrame,
      userCol: String, itemCol: String, rankCol: String,
      k: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = dcgWeights(k, scale)
    // rank → weight as a literal array lookup (element_at is 1-based)
    val wArr = array(w.map(lit): _*)
    val prefix = w.scanLeft(0L)(_ + _).tail // idcg for n hits = prefix(n)
    val pArr = array(prefix.map(lit): _*)
    val t = truth.select(col(userCol).as("user"), col(itemCol).as("item"))
      .distinct()
    val nTruth = t.groupBy("user").agg(count(lit(1)).as("n_truth"))
    val hits = recs
      .select(col(userCol).as("user"), col(itemCol).as("item"),
        col(rankCol).cast("int").as("rank"))
      .filter(col("rank") <= k)
      .join(t, Seq("user", "item"))
    val perUser = hits.groupBy("user").agg(
      count(lit(1)).as("hits"),
      min(col("rank")).as("first_rank"),
      sum(element_at(wArr, col("rank"))).as("dcg_fp"))
    nTruth.join(perUser, Seq("user"), "left")
      .select(col("user"), col("n_truth"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(expr(s"$scale div first_rank"), lit(0L)).as("rr_fp"),
        coalesce(col("dcg_fp"), lit(0L)).as("dcg_fp"),
        element_at(pArr, least(lit(k), col("n_truth")).cast("int"))
          .as("idcg_fp"))
      .withColumn("ndcg_fp",
        expr(s"(dcg_fp * $scale) div idcg_fp"))
  }
}
