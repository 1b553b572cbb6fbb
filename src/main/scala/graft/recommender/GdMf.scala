package graft.recommender

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.encode.{Encoding, RatingStats}

/** Full-batch gradient-descent matrix factorization with the reference's
  * exact semantics (reference `models/funk_svd.py:136-190`,
  * `models/als.py:139-188`) re-expressed relationally.
  *
  * The reference materializes a dense `n_users × n_items` error matrix
  * per epoch (`error = x - pred * x_mask`) and runs blocked dense
  * algebra over it — O(n_users·n_items) work on ~0.075 %-dense data,
  * which is why its distributed runs OOM'd (`report.pdf` §7.1.2). Here
  * the error is a *relation* on observed cells only (the inner join IS
  * the mask, SURVEY §1.3) and every update is join + groupBy +
  * scaled-vector-sum — O(nnz·k) work. Factor states broadcast when
  * they fit (exact size known from the stats pass), so the epoch loop
  * shuffles only post-combine gradient vectors, (n_users + n_items)·k
  * per epoch — never fact-sized rows; oversized dims degrade to
  * shuffle joins. This formulation scales to any nnz that fits a
  * cluster.
  *
  * Semantics traps preserved (SURVEY §7.1):
  *  1. the bias regularizer sums over the FULL dimension (reference
  *     `models/als.py:168` `da.sum(error - reg*u_biases, axis=1)` — the
  *     reg term is broadcast across all n_items columns, error is zero
  *     off-mask) → bias decay is `lr·reg·n_items·bias`, not
  *     `lr·reg·bias`;
  *  2. update ordering — FunkSVD's item-factor gradient uses the
  *     already-updated user factors within the epoch
  *     (`models/funk_svd.py:166-167`); ALS-GD recomputes the error
  *     between the user-side and item-side updates
  *     (`models/als.py:160-174`).
  */
object GdMf {

  final case class Config(
      nFactors: Int,
      epochs: Int,
      lr: Double = 0.001,
      reg: Double = 0.001,
      seed: Long = 42L,
      alternating: Boolean = false, // false = FunkSVD, true = ALS-GD
      collectErrors: Boolean = false,
      // localCheckpoint cadence. 1 (default) = cut lineage every epoch:
      // measured to dominate — Catalyst's analysis/optimization time on
      // the epoch plan (nested joins + lambda-bearing aggregates) grows
      // superlinearly with depth (sf0.1 k=30 6-epoch fit: 9.0 s at
      // interval=1, 16 s at 2, 40 s at 3), so letting plans grow even
      // a little costs far more driver time than the cut jobs save.
      checkpointInterval: Int = 1,
      // Fact-table partition count for the epoch loop. 0 (default) =
      // auto: size by bytes (~24 B/row against 32 MB partitions,
      // floored at 1) — local test scales get a handful of partitions
      // instead of inheriting the global shuffle width (32 tasks over
      // 2 MB is pure scheduler overhead), while 100 TB of facts gets
      // thousands, same rule as files.maxPartitionBytes.
      factsPartitions: Int = 0,
      // Factor-state joins broadcast when the estimated state size
      // (ids × (16 + 8k) bytes) fits under this cap, which removes every
      // fact-sized shuffle from the epoch loop. Above the cap (dims too
      // big for executor memory — the regime where MLlib ALS's block
      // formulation is the right tool anyway) the joins fall back to
      // shuffle hash/sort-merge automatically.
      autoBroadcastDimBytes: Long = 64L << 20,
      // Compile the epoch body ONCE and re-execute it with substituted
      // leaf RDDs each epoch (graftbridge.PlanTemplate) instead of
      // rebuilding the DataFrame graph per epoch: Catalyst
      // analyze+optimize on the lambda-bearing epoch plan measured
      // ~0.4 s/epoch at sf0.1 — ~40% of epoch wall — and the template
      // path pays it once per fit. Identical model to the legacy loop
      // (GdMfSpec asserts exact equality). Applies when
      // checkpointInterval == 1 (the measured-optimal default); other
      // intervals use the legacy loop.
      planTemplates: Boolean = true)

  /** Trained model: distributed per-id state, driver-side scalars, and
    * the optional per-epoch training-error history (reference
    * `collect_errors`, surfaced as data instead of a matplotlib PDF —
    * SURVEY §2.1 "plot sink").
    */
  final case class Model(
      userState: DataFrame, // user, u_factors ARRAY<DOUBLE>, u_bias
      itemState: DataFrame, // item, i_factors ARRAY<DOUBLE>, i_bias
      stats: RatingStats,
      trainErrors: Seq[(Int, Metrics)],
      // checkpoint handles backing userState/itemState (the final
      // generation's cuts, or the dim checkpoints when epochs == 0) —
      // private so release() is the only door
      private val backing: Seq[
        org.apache.spark.sql.graftbridge.DatasetBridge.FreshCheckpoint] = Nil) {

    def predict(test: DataFrame): DataFrame =
      Serving.predict(test, userState, itemState, stats)

    /** Drop the checkpoint blocks backing this model's states. Call when
      * the model is no longer needed — a session that fits many models
      * would otherwise accumulate one unreleasable block set per
      * retained Model (DataFrame.unpersist is a no-op on
      * checkpoint-backed frames). The states are unusable afterwards.
      */
    def release(): Unit = backing.foreach(_.release())

    def trainErrorsDf: DataFrame = {
      val spark = userState.sparkSession
      import spark.implicits._
      trainErrors.map { case (e, m) => (e, m.mae, m.mse, m.rmse) }
        .toDF("epoch", "mae", "mse", "rmse")
    }
  }

  // --- deterministic per-id initialization (SURVEY §4.3.4) -------------
  // The reference's dask RNG is chunking-dependent; ours is a pure
  // function of (id, factor index, seed), reproducible at any
  // parallelism. xxhash64 → U(0,1) → Box-Muller for the normal path.

  private def u01(id: Column, salt: Int, seed: Long): Column =
    xxhash64(id, lit(salt), lit(seed)).cast("double") / lit(1.8446744073709552e19) + lit(0.5)

  /** ALS init: uniform(0, 0.1) (reference `models/als.py:74-75`). */
  private def uniformFactors(id: Column, k: Int, seed: Long): Column =
    array((0 until k).map(f => u01(id, f, seed) * 0.1): _*)

  /** FunkSVD init: normal(0, 0.1) (reference `models/funk_svd.py:76-77`).
    * Shared with [[BprMf]] — same deterministic per-id init family.
    */
  private[recommender] def normalFactors(id: Column, k: Int, seed: Long): Column =
    array((0 until k).map { f =>
      val a = greatest(u01(id, 2 * f, seed), lit(1e-12))
      val b = u01(id, 2 * f + 1, seed)
      sqrt(lit(-2.0) * log(a)) * cos(lit(2.0 * math.Pi) * b) * 0.1
    }: _*)

  // --- plan-template cache ----------------------------------------------
  // The captured epoch-body templates depend only on the leaf schemas,
  // the hyper-parameters baked in as literals, and the broadcast
  // decisions — NOT on the data (facts bind as a leaf at instantiation).
  // Re-fitting with the same shape+config (benchmark reps,
  // cross-validation sweeps, scheduled retrains) therefore skips the
  // one-time Catalyst capture cost entirely.
  private final case class TemplateKey(
      sessionId: Int, factsSchema: String, uSchema: String, iSchema: String,
      k: Int, lr: Double, reg: Double, bcastU: Boolean, bcastI: Boolean,
      meanRating: Double, nUsers: Long, nItems: Long)
  private final case class Templates(
      uLeaf: DataFrame, iLeaf: DataFrame, errLeaf: DataFrame,
      factsLeaf: DataFrame,
      tErr: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      tMetrics: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      tU: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      tI: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
  private val templateCache =
    new java.util.concurrent.ConcurrentHashMap[TemplateKey, Templates]()

  // ---------------------------------------------------------------------

  def fit(ratings: DataFrame, cfg: Config): Model = {
    val spark = ratings.sparkSession
    val orderCol = if (ratings.columns.contains("time")) "time" else "rating"
    // ONE scan of the source: the raw ratings (often a parse-heavy scan)
    // feed both dimension builds and the fact encode — persist the
    // 4-column slice so the source is read once, not once per consumer.
    val ratingsP = ratings
      .select(Seq("user", "item", "rating", orderCol).distinct.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materializes ratingsP and sizes the fact partitioning (24 B/row
    // encoded facts vs 32 MB target); the approximate key counts in the
    // same pass drive the dimension-build scale switch below
    val probe = ratingsP.agg(
      count(lit(1)).as("nnz"),
      approx_count_distinct(col("user")).as("au"),
      approx_count_distinct(col("item")).as("ai"),
      // key widths feed the encode-join broadcast gates below
      avg(length(col("user").cast("string"))).as("ukb"),
      avg(length(col("item").cast("string"))).as("ikb")).head()
    val nnz = probe.getLong(0)
    def keyBytes(i: Int): Double = if (probe.isNullAt(i)) 0.0 else probe.getDouble(i)
    val factParts =
      if (cfg.factsPartitions > 0) cfg.factsPartitions
      else math.max(1L, nnz * 24L / (32L << 20)).toInt
    // Checkpoint the DIMENSIONS, not the derived factor states: every
    // broadcast of a dim (the fact encode below + each epoch's state
    // broadcasts) would otherwise re-run the dimension's groupBy+window
    // plan once per consumer — measured as the dominant setup cost.
    // Fresh checkpoints (not Dataset.localCheckpoint) so the blocks are
    // explicitly releasable — DataFrame.unpersist is a no-op on
    // checkpoint-backed frames. dimensionAuto: above ~50M keys the
    // single-partition window numbering would bottleneck on one core,
    // so the build switches to the zipWithIndex form (same mapping).
    import org.apache.spark.sql.graftbridge.DatasetBridge
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    // the two dimension builds are independent jobs over the shared
    // cache — run them concurrently (finite await: a hung job must
    // surface, not wedge the fit)
    val setupTimeout = Duration(3600L, "s")
    val (userDimCp, itemDimCp) = {
      val u = Future(DatasetBridge.localCheckpointFresh(
        Encoding.dimensionAuto(ratingsP, "user", orderCol, "u_id", probe.getLong(1))))
      val i = Future(DatasetBridge.localCheckpointFresh(
        Encoding.dimensionAuto(ratingsP, "item", orderCol, "i_id", probe.getLong(2))))
      (Await.result(u, setupTimeout), Await.result(i, setupTimeout))
    }
    val userDim = userDimCp.df
    val itemDim = itemDimCp.df

    // The fact table: encoded observed cells, hash-partitioned by u_id so
    // every user-side join/groupBy in the epoch loop reuses the
    // partitioning without a new exchange (reference chunk grid → §1.3).
    // Dim broadcasts size-gated on the exact probe counts + sampled key
    // widths (checkpointed dims have no planner estimates, so the gate
    // can't be left to auto-broadcast; an unconditional hint was the
    // SURVEY §1.3 driver-OOM class at 10⁹ keys).
    val facts = Encoding.encode(ratingsP, userDim, itemDim,
      Encoding.dimBytes(probe.getLong(1), keyBytes(3) + 8.0),
      Encoding.dimBytes(probe.getLong(2), keyBytes(4) + 8.0),
      cfg.autoBroadcastDimBytes)
      .select(col("u_id"), col("i_id"), col("rating"))
      .repartition(factParts, col("u_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Global statistics — same six values as
    // Encoding.ratingStats(ratings) (the encode joins are inner on
    // dimension tables derived from the same relation, so no row is
    // gained or lost). This agg is ALSO the action that materializes the
    // `facts` cache: one pass does both, no separate count() job.
    val stats = {
      val row = facts.agg(
        count(lit(1)).as("n_ratings"),
        countDistinct(col("u_id")).as("n_users"),
        countDistinct(col("i_id")).as("n_items"),
        min(col("rating")).as("min_rating"),
        max(col("rating")).as("max_rating"),
        avg(col("rating")).as("mean_rating")).head()
      graft.encode.RatingStats(row.getLong(0), row.getLong(1), row.getLong(2),
        row.getDouble(3), row.getDouble(4), row.getDouble(5))
    }
    ratingsP.unpersist()

    // Initial states stay LAZY plans over the checkpointed dims: the
    // init columns are pure per-id hash expressions (no shuffle, no
    // scan), so epoch-0 consumers recompute them for pennies — cheaper
    // than two more eager checkpoint jobs here.
    val init = if (cfg.alternating) uniformFactors _ else normalFactors _
    var uState = userDim
      .withColumn("u_factors", init(col("u_id"), cfg.nFactors, cfg.seed))
      .withColumn("u_bias", lit(0.0))
    var iState = itemDim
      .withColumn("i_factors", init(col("i_id"), cfg.nFactors, cfg.seed + 1))
      .withColumn("i_bias", lit(0.0))

    // Broadcast factor states when they fit (size known exactly from
    // the stats pass — no reliance on planner estimates, which are
    // unavailable for localCheckpoint'd frames): the epoch loop then
    // never shuffles fact-sized data for its joins, only the tiny
    // post-combine gradient vectors.
    def stateBytes(ids: Long): Long = ids * (16L + 8L * cfg.nFactors)
    val bcastU = stateBytes(stats.nUsers) <= cfg.autoBroadcastDimBytes
    val bcastI = stateBytes(stats.nItems) <= cfg.autoBroadcastDimBytes
    def bu(df: DataFrame): DataFrame = if (bcastU) broadcast(df) else df
    def bi(df: DataFrame): DataFrame = if (bcastI) broadcast(df) else df

    // err(u_id, i_id, e) on observed cells only — NARROW: the factor
    // vectors are re-joined where a consumer needs them, so the
    // per-epoch cache/shuffle rows are 24 bytes, not 2·k doubles wide.
    // The fact relation is a parameter so the template path can build
    // the same plan over a placeholder leaf.
    def errRelOn(f: DataFrame, u: DataFrame, i: DataFrame): DataFrame =
      f
        .join(bu(u.select("u_id", "u_factors", "u_bias")), "u_id")
        .join(bi(i.select("i_id", "i_factors", "i_bias")), "i_id")
        .withColumn("e",
          col("rating") - (lit(stats.meanRating) + col("u_bias") +
            col("i_bias") + Serving.dot(col("u_factors"), col("i_factors"))))
        .select("u_id", "i_id", "e")

    def metricsOf(err: DataFrame): Metrics = {
      val r = err.agg(
        sum(abs(col("e"))).as("sae"),
        sum(col("e") * col("e")).as("sse")).head()
      val mae = r.getDouble(0) / stats.nRatings
      val mse = r.getDouble(1) / stats.nRatings
      Metrics(mae, mse, math.sqrt(mse))
    }

    // Σᵢ e·Qᵢ and Σᵢ e per user (scaled-vector-sum UDAF: compiled
    // multiply-accumulate, map-side combine — one k-vector per
    // (partition, id) crosses the wire).
    import ScaledVectorSum.scaledVecSum
    def userGrad(err: DataFrame, i: DataFrame): DataFrame =
      err.join(bi(i.select("i_id", "i_factors")), "i_id")
        .groupBy("u_id")
        .agg(scaledVecSum(col("i_factors"), col("e")).as("fgrad"),
          sum(col("e")).as("esum"))

    def itemGrad(err: DataFrame, u: DataFrame): DataFrame =
      err.join(bu(u.select("u_id", "u_factors")), "u_id")
        .groupBy("i_id")
        .agg(scaledVecSum(col("u_factors"), col("e")).as("fgrad"),
          sum(col("e")).as("esum"))

    // The gradient relation is at most dim-sized (one row per id with
    // observations), so it broadcasts under the same policy as the
    // factor states — turning the state⋈grad update into a shuffle-free
    // broadcast join; above the cap both sides degrade to a shuffle
    // join, which is the right plan for dims that big.
    def updated(state: DataFrame, grad: DataFrame, idCol: String,
        factorsCol: String, biasCol: String, dimSize: Long,
        bcast: Boolean): DataFrame =
      state.join(if (bcast) broadcast(grad) else grad, Seq(idCol), "left_outer")
        .withColumn(factorsCol,
          zip_with(col(factorsCol),
            coalesce(col("fgrad"), array((0 until cfg.nFactors).map(_ => lit(0.0)): _*)),
            (p, g) => p + lit(cfg.lr) * (g - lit(cfg.reg) * p)))
        // trap 1: reg term scales with the FULL opposite-dimension size
        .withColumn(biasCol,
          col(biasCol) + lit(cfg.lr) *
            (coalesce(col("esum"), lit(0.0)) - lit(cfg.reg) * col(biasCol) * dimSize))
        .drop("fgrad", "esum")

    val history = scala.collection.mutable.ArrayBuffer.empty[(Int, Metrics)]

    // Lineage management (SURVEY §4.1): checkpoint every
    // checkpointInterval epochs (and on the final one); between cuts
    // the states stay lazy plans over the last checkpoint. Cuts use
    // DatasetBridge.localCheckpointFresh, NOT Dataset.localCheckpoint:
    // Spark 4's localCheckpoint copies the cut plan's ESTIMATED
    // STATISTICS into the replacement leaf, and in an iterative loop
    // that estimate compounds geometrically epoch over epoch (each
    // epoch's size estimate is a product involving the last epoch's) —
    // by ~epoch 16 Catalyst spends minutes in BigInteger.multiply
    // inside the stats visitor. Fresh leaves take default stats; every
    // join in the loop is explicitly broadcast-hinted, so the planner
    // loses nothing. Persisted error relations are unpersisted only AT
    // the next cut — the cut is the materialization barrier, and
    // dropping a cache before its consumers materialize would silently
    // void it and recompute.
    import org.apache.spark.sql.graftbridge.DatasetBridge
    val pendingErr = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var lastCpU: Option[DatasetBridge.FreshCheckpoint] = None
    var lastCpI: Option[DatasetBridge.FreshCheckpoint] = None
    var prevU: Option[DatasetBridge.FreshCheckpoint] = None
    def persistErr(df: DataFrame): DataFrame = {
      // released: drained by pendingErr.foreach(_.unpersist()) at the
      // checkpoint cuts and at trainer exit
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      pendingErr += p
      p
    }
    def cutting(epoch: Int): Boolean =
      (epoch + 1) % math.max(cfg.checkpointInterval, 1) == 0 ||
        epoch == cfg.epochs - 1
    // The ORDER of cuts matters: the item-side plan references the new
    // user state, so the user side is checkpointed FIRST and the item
    // side derived from the checkpointed frame — otherwise the item
    // cut's job silently re-executes the whole user-side update
    // (gradient aggregation + join) a second time (measured ~2× epoch
    // cost before this ordering).
    //
    // Releases are deferred to the END of cutI: until the item cut has
    // materialized, the (possibly uncut, interval > 1) item-side chain
    // and the persisted error relations can still recompute through the
    // PREVIOUS generation's checkpoint RDDs, whose lineage is truncated
    // — releasing them any earlier throws
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (hit at interval=2). After
    // cutI, both live states and the next epoch's errors reference only
    // the new generation.
    def cutU(epoch: Int, u: DataFrame): DataFrame =
      if (cutting(epoch)) {
        val cu = DatasetBridge.localCheckpointFresh(u) // eager cut
        prevU = lastCpU
        lastCpU = Some(cu)
        cu.df
      } else u
    def cutI(epoch: Int, i: DataFrame): DataFrame =
      if (cutting(epoch)) {
        val ci = DatasetBridge.localCheckpointFresh(i)
        prevU.foreach(_.release())
        prevU = None
        lastCpI.foreach(_.release())
        lastCpI = Some(ci)
        pendingErr.foreach(_.unpersist())
        pendingErr.clear()
        ci.df
      } else i

    val useTemplates =
      cfg.planTemplates && cfg.checkpointInterval <= 1 && cfg.epochs > 0
    if (useTemplates) {
      // Template loop: the epoch body is analyzed+optimized ONCE against
      // placeholder leaves; each epoch substitutes the current
      // generation's RDDs and pays physical planning only (codegen is
      // cached by source). Semantics identical to the legacy loop below
      // — GdMfSpec asserts exact state equality between the two paths.
      import org.apache.spark.rdd.RDD
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.graftbridge.PlanTemplate
      import org.apache.spark.sql.graftbridge.PlanTemplate.Bind

      // materialize the initial states once (the legacy loop does this
      // through epoch 0's cut instead) — two independent jobs, run
      // concurrently like the dim builds
      var (uCp, iCp) = {
        val u = Future(DatasetBridge.localCheckpointFresh(uState))
        val i = Future(DatasetBridge.localCheckpointFresh(iState))
        (Await.result(u, setupTimeout), Await.result(i, setupTimeout))
      }

      def nullable(s: org.apache.spark.sql.types.StructType) =
        org.apache.spark.sql.types.StructType(s.fields.map(_.copy(nullable = true)))
      val key = TemplateKey(
        System.identityHashCode(spark), nullable(facts.schema).json,
        nullable(uCp.df.schema).json, nullable(iCp.df.schema).json,
        cfg.nFactors, cfg.lr, cfg.reg, bcastU, bcastI,
        stats.meanRating, stats.nUsers, stats.nItems)
      val tpl = templateCache.computeIfAbsent(key, _ => {
        if (templateCache.size > 32) templateCache.clear() // bounded
        // placeholder leaves with nullable schemas: epoch outputs may be
        // nullable where the hash-init columns are not, and a nullable
        // leaf reading never-null rows is safe while the reverse breaks
        // codegen'd null checks
        val uLeaf = PlanTemplate.leafFrame(spark, nullable(uCp.df.schema))
        val iLeaf = PlanTemplate.leafFrame(spark, nullable(iCp.df.schema))
        val factsLeaf = PlanTemplate.leafFrame(spark, nullable(facts.schema))
        val errProto = errRelOn(factsLeaf, uLeaf, iLeaf)
        val errLeaf = PlanTemplate.leafFrame(spark, nullable(errProto.schema))
        // epoch outputs re-bind to the same state leaves next epoch —
        // normalize the column order to the leaf schema
        val uCols = uCp.df.columns.toSeq.map(col)
        val iCols = iCp.df.columns.toSeq.map(col)
        Templates(
          uLeaf, iLeaf, errLeaf, factsLeaf,
          tErr = PlanTemplate.template(errProto),
          tMetrics = PlanTemplate.template(
            errLeaf.agg(sum(abs(col("e"))).as("sae"),
              sum(col("e") * col("e")).as("sse"))),
          tU = PlanTemplate.template(
            updated(uLeaf, userGrad(errLeaf, iLeaf), "u_id", "u_factors",
              "u_bias", stats.nItems, bcastU).select(uCols: _*)),
          tI = PlanTemplate.template(
            updated(iLeaf, itemGrad(errLeaf, uLeaf), "i_id", "i_factors",
              "i_bias", stats.nUsers, bcastI).select(iCols: _*)))
      })
      import tpl.{errLeaf, factsLeaf, iLeaf, tErr, tI, tMetrics, tU, uLeaf}

      // the fact rows bind as a leaf, declared with the hash(u_id)
      // partitioning the repartition above gave them (read through the
      // cache; recomputed partitions would land identically)
      val factsBind =
        Bind(factsLeaf, facts.queryExecution.toRdd,
          hashPartCols = Seq("u_id"), numPartitions = factParts)

      def errOf(u: RDD[InternalRow], i: RDD[InternalRow]): RDD[InternalRow] =
        PlanTemplate.runToRdd(PlanTemplate.instantiate(spark, tErr,
          Seq(factsBind, Bind(uLeaf, u), Bind(iLeaf, i))))
          // released: every errOf result is unpersisted by the epoch loop below
          .persist(StorageLevel.MEMORY_AND_DISK)
      // the err rows inherit the facts' hash(u_id) partitioning
      // (broadcast joins preserve the streamed side); declaring it on
      // the bound leaf lets the user-side aggregation skip its exchange,
      // exactly like the legacy loop's persisted err frame does
      def bindErr(err: RDD[InternalRow]): Bind =
        Bind(errLeaf, err, hashPartCols = Seq("u_id"))
      def metricsOfRdd(err: RDD[InternalRow]): Metrics = {
        val row = PlanTemplate.collectRows(PlanTemplate.instantiate(
          spark, tMetrics, Seq(Bind(errLeaf, err)))).head
        val mae = row.getDouble(0) / stats.nRatings
        val mse = row.getDouble(1) / stats.nRatings
        Metrics(mae, mse, math.sqrt(mse))
      }
      def advance(uNew: RDD[InternalRow], iNew: RDD[InternalRow]): Unit = {
        uCp.release(); iCp.release()
        uCp = PlanTemplate.asFreshCheckpoint(spark, uNew, uLeaf.schema)
        iCp = PlanTemplate.asFreshCheckpoint(spark, iNew, iLeaf.schema)
      }

      if (cfg.alternating) {
        var err = errOf(uCp.rdd, iCp.rdd)
        for (epoch <- 0 until cfg.epochs) {
          if (cfg.collectErrors) history += ((epoch, metricsOfRdd(err)))
          val uNew = PlanTemplate.runToCheckpoint(PlanTemplate.instantiate(
            spark, tU, Seq(Bind(uLeaf, uCp.rdd), Bind(iLeaf, iCp.rdd), bindErr(err))))
          val err1 = errOf(uNew, iCp.rdd)
          val iNew = PlanTemplate.runToCheckpoint(PlanTemplate.instantiate(
            spark, tI, Seq(Bind(iLeaf, iCp.rdd), Bind(uLeaf, uNew), bindErr(err1))))
          val err2 = errOf(uNew, iNew) // lazy; consumed next epoch
          err.unpersist(blocking = false)
          err1.unpersist(blocking = false)
          advance(uNew, iNew)
          err = err2
        }
        err.unpersist(blocking = false)
      } else {
        for (epoch <- 0 until cfg.epochs) {
          val err = errOf(uCp.rdd, iCp.rdd)
          if (cfg.collectErrors) history += ((epoch, metricsOfRdd(err)))
          val uNew = PlanTemplate.runToCheckpoint(PlanTemplate.instantiate(
            spark, tU, Seq(Bind(uLeaf, uCp.rdd), Bind(iLeaf, iCp.rdd), bindErr(err))))
          // trap 2 holds: tI joins the epoch error against the NEW user
          // factors (uLeaf re-bound to the fresh checkpoint)
          val iNew = PlanTemplate.runToCheckpoint(PlanTemplate.instantiate(
            spark, tI, Seq(Bind(iLeaf, iCp.rdd), Bind(uLeaf, uNew), bindErr(err))))
          err.unpersist(blocking = false)
          advance(uNew, iNew)
        }
      }
      uState = uCp.df
      iState = iCp.df
      lastCpU = Some(uCp)
      lastCpI = Some(iCp)
    } else if (cfg.alternating) {
      // ALS-GD (reference models/als.py:158-174): error at epoch start is
      // the previous epoch's final error; metrics recorded pre-update.
      var err = persistErr(errRelOn(facts, uState, iState))
      for (epoch <- 0 until cfg.epochs) {
        if (cfg.collectErrors) history += ((epoch, metricsOf(err)))
        uState = cutU(epoch,
          updated(uState, userGrad(err, iState), "u_id", "u_factors", "u_bias", stats.nItems, bcastU))
        val err1 = persistErr(errRelOn(facts, uState, iState))
        iState = cutI(epoch,
          updated(iState, itemGrad(err1, uState), "i_id", "i_factors", "i_bias", stats.nUsers, bcastI))
        err = persistErr(errRelOn(facts, uState, iState))
      }
      err.unpersist()
    } else {
      // FunkSVD (reference models/funk_svd.py:157-170): ONE error per
      // epoch; item-side factor gradient uses the UPDATED user factors
      // (trap 2); biases both update from the shared epoch error.
      for (epoch <- 0 until cfg.epochs) {
        val err = persistErr(errRelOn(facts, uState, iState))
        if (cfg.collectErrors) history += ((epoch, metricsOf(err)))
        uState = cutU(epoch,
          updated(uState, userGrad(err, iState), "u_id", "u_factors", "u_bias", stats.nItems, bcastU))
        // trap 2: item grad joins the epoch error against the NEW user
        // factors (checkpointed, so this job doesn't redo the user side)
        iState = cutI(epoch,
          updated(iState, itemGrad(err, uState), "i_id", "i_factors", "i_bias", stats.nUsers, bcastI))
      }
    }
    pendingErr.foreach(_.unpersist())
    pendingErr.clear()

    facts.unpersist()
    if (cfg.epochs > 0) {
      // the final states are checkpointed by the last epoch's cut and no
      // longer reference the dims; with epochs=0 the lazy init states
      // still do, so the dims must stay resident for the Model's life.
      userDimCp.release()
      itemDimCp.release()
    }
    // what the Model's release() must drop: the last generation's cuts
    // when the loop ran, the dim checkpoints when it didn't
    val backing =
      if (cfg.epochs > 0) Seq(lastCpU, lastCpI).flatten
      else Seq(userDimCp, itemDimCp)
    Model(
      userState = uState.select(col("user"),
        col("u_factors"), col("u_bias")),
      itemState = iState.select(col("item"),
        col("i_factors"), col("i_bias")),
      stats = stats,
      trainErrors = history.toSeq,
      backing = backing)
  }
}
