package graft.recommender

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.encode.{Encoding, RatingStats}

/** MLlib-backed ALS recommender — the scale path (SURVEY §2.12).
  *
  * The reference's "ALS" is batch gradient descent (see [[GdMf]] with
  * `alternating = true` for the semantically faithful port); this class
  * is the *production* formulation: MLlib's blocked normal-equation ALS
  * optimizes the same objective and is the design the reference's own
  * report benchmarked against (`report.pdf` §7.1.1 "MLlib ALS"). The
  * report's MLlib row lost (1.59 vs 0.92 RMSE) because it was untuned
  * and lacked the bias/mean/clip serving wrapper — we fit damped
  * user/item biases, let ALS factorize the residuals, and serve through
  * [[Serving.predict]] with the reference's exact clip +
  * cold-start-mean semantics, never MLlib's `coldStartStrategy="drop"`
  * (which silently changes eval denominators, SURVEY §7.4.5).
  */
object AlsRecommender {

  final case class Params(
      rank: Int = 30,
      maxIter: Int = 10,
      reg: Double = 0.3, // biases carry additive structure; factors model
                         // interactions only, so shrink them harder

      seed: Long = 42L,
      numBlocks: Int = 32)

  final case class Model(
      userState: DataFrame, // user, u_factors, u_bias
      itemState: DataFrame, // item, i_factors, i_bias
      stats: RatingStats,
      userDim: DataFrame,
      itemDim: DataFrame,
      mlModel: org.apache.spark.ml.recommendation.ALSModel,
      private val backing: Seq[
        org.apache.spark.sql.graftbridge.DatasetBridge.FreshCheckpoint] = Nil) {

    def predict(test: DataFrame): DataFrame =
      Serving.predict(test, userState, itemState, stats)

    def evaluate(test: DataFrame): Metrics =
      Evaluator.evaluate(predict(test), "rating", "prediction")

    /** Drop the checkpoint blocks backing the dims/bias tables this
      * model's states reference (fit-many-models sessions accumulate
      * one block set per retained Model otherwise). States are unusable
      * afterwards.
      */
    def release(): Unit = backing.foreach(_.release())

    /** Top-N serving (SURVEY §2.7: described in the reference's paper,
      * never implemented there). Ranks by the model's FULL per-item
      * score `dot(P,Q) + i_bias` — MLlib's own `recommendForAllUsers`
      * ranks by the residual dot alone, which contradicts `predict`'s
      * semantics once item biases exist (mean and u_bias are constant
      * per user and cannot change the order). Item state broadcasts
      * (catalogs are the small side); rank-n filter benefits from
      * WindowGroupLimit pushdown. For huge catalogs, shortlist with
      * [[graft.similarity.Ann]] over the augmented vectors
      * `[Q, i_bias] · [P, 1]` first.
      */
    def recommendForAllUsers(n: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user"))
        .orderBy(col("score").desc, col("item"))
      userState.crossJoin(broadcast(itemState))
        .withColumn("score",
          Serving.dot(col("u_factors"), col("i_factors")) + col("i_bias"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= n)
        .select(col("user"), col("item"), col("rank"))
    }
  }

  def fit(ratings: DataFrame, params: Params = Params()): Model = {
    val orderCol = if (ratings.columns.contains("time")) "time" else "rating"
    // One scan of the source feeds the dims, stats, bias aggs, and the
    // encode; dims checkpoint once so their groupBy+window plan doesn't
    // re-run per broadcast consumer (same measured trap as GdMf.fit).
    val r = ratings
      .select(Seq("user", "item", "rating", orderCol).distinct.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fresh checkpoints (not Dataset.localCheckpoint): releasable via
    // Model.release(), and immune to the Spark 4 stats-compounding trap
    import org.apache.spark.sql.graftbridge.DatasetBridge
    val userDimCp = DatasetBridge.localCheckpointFresh(
      Encoding.dimension(r, "user", orderCol, "u_id"))
    val itemDimCp = DatasetBridge.localCheckpointFresh(
      Encoding.dimension(r, "item", orderCol, "i_id"))
    val userDim = userDimCp.df
    val itemDim = itemDimCp.df
    val stats = Encoding.ratingStats(r)

    // The reference's decomposition is `mean + u_bias + i_bias + P·Q`
    // (models/als.py:79). Mirror it: damped user/item biases from the
    // training deviations, then ALS factorizes the *residuals* — the
    // published reason its tuned runs beat raw MLlib ALS (BASELINE.md).
    val damping = 5.0
    val ubCp = DatasetBridge.localCheckpointFresh(
      r.groupBy("user").agg(
        (sum(col("rating") - stats.meanRating) /
          (count(lit(1)) + damping)).as("u_bias")))
    val ub = ubCp.df
    val ibCp = DatasetBridge.localCheckpointFresh(
      r.join(broadcast(ub), "user")
        .groupBy("item").agg(
          (sum(col("rating") - stats.meanRating - col("u_bias")) /
            (count(lit(1)) + damping)).as("i_bias")))
    val ib = ibCp.df
    val encoded = Encoding.encode(
      r.join(broadcast(ub), "user").join(broadcast(ib), "item"),
      userDim, itemDim)
      .select(col("u_id"), col("i_id"),
        (col("rating") - stats.meanRating - col("u_bias") - col("i_bias"))
          .cast("float").as("r_centered"))

    val als = new ALS()
      .setUserCol("u_id").setItemCol("i_id").setRatingCol("r_centered")
      .setRank(params.rank).setMaxIter(params.maxIter)
      .setRegParam(params.reg).setSeed(params.seed)
      .setNumUserBlocks(params.numBlocks).setNumItemBlocks(params.numBlocks)
      .setColdStartStrategy("nan")
    val model = als.fit(encoded) // materializes `encoded`: ALS caches
    // its internal block RDDs up front, so the source cache can go now
    r.unpersist()

    val toDouble = (c: String) =>
      transform(col("features"), f => f.cast("double")).as(c)
    val userState = model.userFactors
      .select(col("id").as("u_id"), toDouble("u_factors"))
      .join(userDim, "u_id").join(ub, "user")
      .select(col("user"), col("u_factors"), col("u_bias"))
    val itemState = model.itemFactors
      .select(col("id").as("i_id"), toDouble("i_factors"))
      .join(itemDim, "i_id").join(ib, "item")
      .select(col("item"), col("i_factors"), col("i_bias"))

    Model(userState, itemState, stats, userDim, itemDim, model,
      backing = Seq(userDimCp, itemDimCp, ubCp, ibCp))
  }
}
