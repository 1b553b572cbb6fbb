package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: the wiring between `SparkEntry.queries`,
  * `SparkEntry.oracleSql` and `Bench.headline` is string-keyed, so a
  * typo'd name fails SILENTLY — a dead oracle entry is never compared,
  * and a query missing its oracle quietly demotes to rows-only. These
  * assertions turn both into loud failures, and pin the rows-only set
  * to the documented structurally-float/RNG list so dropping an oracle
  * by accident cannot pass.
  */
class RegistrySpec extends AnyFunSuite {

  /** The queries that are rows-only BY DESIGN (native RNG, float
    * training trajectories, implementation-defined sketches, trained
    * quantizers, media decode, GK quantiles) — each has an
    * oracle-green sibling; see COVERAGE.md.
    */
  private val structurallyRowsOnly = Set(
    "q107_fluency_buckets_scale",
    "q108_ann_ivf_index", "q109_ann_pq_index",
    "q114_quality_train", "q121_cluster_balance",
    "q27_random_split",
    "q30_mllib_als_eval", "q31_topn_recommend",
    "q32_funk_svd_train", "q33_als_gd_train",
    "q34_funk_svd_k30", "q35_als_gd_k30", "q150_bpr_train",
    "q36_approx_stats",
    "q48_ann_lsh", "q50_multimodal_features",
    "q52_ann_ivf", "q53_embed_neardup_lsh",
    "q78_ann_pq", "q80_stratified_split",
    "q193_knn_graph_trained", "q194_semantic_dedup_trained")

  test("every oracle key names a registered query (no dead oracles)") {
    val dead = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dead.isEmpty, s"oracle entries with no query: $dead")
  }

  test("rows-only queries are exactly the documented structural set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === structurallyRowsOnly,
      s"unexpected rows-only: ${rowsOnly -- structurallyRowsOnly}; " +
        s"missing: ${structurallyRowsOnly -- rowsOnly}")
  }

  test("every bench headliner is a registered query") {
    val missing = Bench.headline.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"headliners with no query: $missing")
  }

  test("query names are unique and well-formed") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size === names.size)
    assert(names.forall(_.matches("q[0-9]+b?_[a-z0-9_]+")), names.filterNot(
      _.matches("q[0-9]+b?_[a-z0-9_]+")))
  }
}
