package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unified ANN entry point — ONE call that picks the family
  * (brute / IVF / PQ / IVF-SQ8) from what actually drives the choice
  * at scale: corpus size `n`, vector `dim`, and the caller's memory
  * budget for the scoring tier. The decision table (documented in
  * SCALE.md §ANN and spec-locked by equivalence tests against the
  * direct calls):
  *
  *  | condition | family | why |
  *  |---|---|---|
  *  | n ≤ [[BruteMaxRows]] | brute | exact; a single broadcast-probe scan is cheaper than any index build at this size |
  *  | vectors fit the budget (n·dim·8 ≤ budget) | IVF | the recall-robust scale path: bounded-sample KMeans, ~nprobe/nlist of the corpus scanned per query |
  *  | vectors DON'T fit, dim divisible by a subspace count | PQ | compression path: m codes/row (~dim·8/m× less scan I/O), ADC scoring, exact re-rank of the shortlist |
  *  | vectors DON'T fit, dim not PQ-divisible | IVF-SQ8 | 8× scan compression (byte codes) with IVF list pruning; works at any dim |
  *
  * LSH stays reachable via the explicit `family` override only — its
  * recall is parameter-sensitive (the reason [[Ann.ivfTopK]] is the
  * documented scale default), but it is the right tool when the
  * corpus is append-heavy and retraining even a sampled quantizer
  * between rebuilds is unwanted.
  *
  * Parameter derivation (the FAISS guidelines, each documented on the
  * underlying operator): `nlist ≈ √n` clamped to [4, 4096], probing
  * `max(4, nlist/4)` lists; PQ uses the largest m ∈ {16,8,4,2}
  * dividing dim with ks=16 and overfetch=16 (the registered q78
  * recall-0.96 configuration class); quantizer training is always the
  * bounded [[Ann.boundedTrainFraction]] sample. Every family is
  * deterministic given `seed`.
  *
  * The returned frame is (query_id, neighbor_id, rank, score) with
  * the score column of the underlying family (`cos_sim` for
  * brute/LSH/IVF/PQ, `score_fp` for IVF-SQ8) — rank is the contract,
  * scores are family-native diagnostics. Results follow each
  * operator's caller-release contract (approximate paths return
  * persisted frames — `.unpersist()` when consumed).
  */
object AnnIndex {

  /** Below this corpus size the exact broadcast-probe scan wins: at
    * 100k rows × 64 dim × a benchmark-sized query set, brute force is
    * a sub-second single-stage scan, while any trained index pays a
    * KMeans fit first. Callers with huge STANDING query volume can
    * still force an index via `family`.
    */
  val BruteMaxRows: Long = 100000L

  sealed trait Family
  case object Brute extends Family
  case object Lsh extends Family
  case object Ivf extends Family
  case object Pq extends Family
  case object IvfSq8 extends Family
  /** Projected-shortlist + exact refine (`Projection.projTopKFixed`) —
    * explicit-override only, like [[Lsh]]: right when a quantizer
    * refit between rebuilds is unwanted AND the query volume justifies
    * the dOut-dim scoring scan, but recall needs the exact re-rank
    * (see the ProjectionSpec gap-vs-noise analysis for shortlist
    * sizing).
    */
  case object Proj extends Family

  /** The resolved execution plan: family + the derived parameters the
    * dispatch will pass to the direct call — exposed so callers (and
    * the equivalence specs) can see and replay exactly what will run.
    */
  final case class Plan(
      family: Family,
      nlist: Int = 0, nprobe: Int = 0,
      m: Int = 0, ks: Int = 0, overfetch: Int = 0,
      tables: Int = 0, planes: Int = 0,
      dOut: Int = 0, shortlist: Int = 0,
      reason: String)

  /** √n clamped to [4, 4096] — the FAISS nlist guideline. */
  private[similarity] def nlistFor(n: Long): Int =
    math.min(4096L, math.max(4L, math.round(math.sqrt(n.toDouble)))).toInt

  /** Largest PQ subspace count in {16, 8, 4, 2} dividing `dim`; 0 if
    * none (odd/prime dims → SQ8 is the compression path).
    */
  private[similarity] def pqMFor(dim: Int): Int =
    Seq(16, 8, 4, 2).find(m => dim % m == 0).getOrElse(0)

  /** Resolve the decision table for (n, dim, k, budget). Pure —
    * callable without data for planning/spec purposes.
    */
  def choose(n: Long, dim: Int, k: Int,
      memoryBudgetBytes: Long = Long.MaxValue,
      family: Option[Family] = None): Plan = {
    require(n >= 0, s"n must be >= 0, got $n")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(k >= 1, s"k must be >= 1, got $k")
    val nlist = nlistFor(n)
    val nprobe = math.min(nlist, math.max(4, nlist / 4))
    val m = pqMFor(dim)
    def plan(f: Family, reason: String): Plan = f match {
      case Brute => Plan(Brute, reason = reason)
      case Lsh => Plan(Lsh, tables = 32, planes = 4, reason = reason)
      case Ivf => Plan(Ivf, nlist = nlist, nprobe = nprobe, reason = reason)
      case Pq =>
        require(m > 0, s"dim $dim has no PQ subspace divisor in {16,8,4,2}")
        Plan(Pq, m = m, ks = 16, overfetch = 16, reason = reason)
      case IvfSq8 =>
        Plan(IvfSq8, nlist = nlist, nprobe = nprobe, reason = reason)
      case Proj =>
        // 2× compression; shortlist sized for the refine to matter —
        // generous because JL noise 1/√dOut competes with cosine gaps
        Plan(Proj, dOut = math.max(8, math.min(64, dim / 2)),
          shortlist = math.max(10 * k, 100), reason = reason)
    }
    family match {
      case Some(f) => plan(f, "caller override")
      case None =>
        if (n <= BruteMaxRows)
          plan(Brute, s"n=$n <= $BruteMaxRows: exact scan beats index build")
        else if (n * dim.toLong * 8L <= memoryBudgetBytes)
          plan(Ivf, s"vectors fit budget: IVF is the recall-robust default")
        else if (m > 0)
          plan(Pq, s"vectors exceed budget: PQ compresses the scoring scan")
        else
          plan(IvfSq8,
            s"vectors exceed budget, dim=$dim not PQ-divisible: SQ8 codes")
    }
  }

  /** One-call ANN top-k: resolve the [[Plan]] from the corpus itself
    * (one count + one head row for dim) and dispatch to the direct
    * operator with the derived parameters.
    */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      memoryBudgetBytes: Long = Long.MaxValue, seed: Long = 42L,
      family: Option[Family] = None): DataFrame = {
    val n = corpus.count()
    val dim = corpus.select(size(col(vecCol)).as("__d"))
      .filter(col("__d") > 0).head().getInt(0)
    run(choose(n, dim, k, memoryBudgetBytes, family),
      corpus, idCol, vecCol, queries, qIdCol, qVecCol, k, seed)
  }

  /** Execute a resolved [[Plan]] — exposed so the equivalence specs
    * (and callers that cache a Plan across batches) can drive the
    * dispatch deterministically.
    */
  def run(plan: Plan, corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      seed: Long = 42L): DataFrame = plan.family match {
    case Brute =>
      Ann.bruteForceTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
    case Lsh =>
      Ann.lshTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k,
        tables = plan.tables, planes = plan.planes)
    case Ivf =>
      Ann.ivfTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k,
        nlist = plan.nlist, nprobe = plan.nprobe, seed = seed)
    case Pq =>
      Ann.pqTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k,
        m = plan.m, ks = plan.ks, seed = seed, overfetch = plan.overfetch)
    case Proj =>
      val dim = corpus.select(size(col(vecCol)).as("__d"))
        .filter(col("__d") > 0).head().getInt(0)
      Projection.projTopKFixed(corpus, idCol, vecCol,
        queries, qIdCol, qVecCol, k,
        shortlist = plan.shortlist, dIn = dim, dOut = plan.dOut)
    case IvfSq8 =>
      // train the two frozen artifacts the composed operator needs —
      // centroids (bounded-sample KMeans over UNIT vectors, the
      // assignment kernel's space — the knnGraph pattern) and
      // per-dimension SQ8 bounds (one aggregate pass)
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val dim = corpus.select(size(col(vecCol)).as("__d"))
        .filter(col("__d") > 0).head().getInt(0)
      val c = Ann.normalized(corpus.select(
        transform(col(vecCol), x => x.cast("double")).as("v")))
        .select(array_to_vector(col("v")).as("__fv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val centroids = try {
        val frac = Ann.boundedTrainFraction(c.count(), plan.nlist)
        val trainSet =
          if (frac >= 1.0) c
          else c.sample(withReplacement = false, frac, seed)
        new KMeans().setK(plan.nlist).setSeed(seed).setFeaturesCol("__fv")
          .setPredictionCol("__cl").fit(trainSet)
          .clusterCenters.map(_.toArray.toSeq).toSeq
      } finally c.unpersist()
      val (mins, maxs) = Ann.sq8Bounds(corpus, idCol, vecCol, dim)
      Ann.ivfSq8TopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k,
        centroids, plan.nprobe, mins, maxs)
  }
}
