package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Curation.semanticDedupFixed]] — SemDeDup under frozen centroids
  * (q168): greedy min-id-wins survivor policy, reserved −1 cluster for
  * null/short vectors, and the oversized-cluster LSH sub-bucket guard
  * (superset-of-exact + sound-drops contract).
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Two well-separated centroids along the first two axes. */
  private val centroids: Seq[Seq[Double]] = Seq(
    Seq(10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    Seq(0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("id", "v")

  test("exact copies collapse to the min-id representative; distinct docs survive") {
    val a = vec(9.0, 1.0, 0, 0, 0, 0, 0, 0)
    val b = vec(1.0, 9.0, 0, 0, 0, 0, 0, 0)
    val rows = df(Seq(1L -> a, 2L -> a, 3L -> a, 10L -> b))
    val got = Curation.semanticDedupFixed(rows, "id", "v", centroids,
      thresholdFp = 990000000000L, dim = dim)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 10L -> 1L))
  }

  test("cross-cluster identical vectors are NOT compared (SemDeDup semantics)") {
    // same direction but assigned to different clusters by raw distance:
    // near c0 and near c1 respectively, yet cosine-identical
    val u = vec(3.0, 4.0, 0, 0, 0, 0, 0, 0)
    val rows = df(Seq(
      1L -> vec(9.0, 0.5, 0, 0, 0, 0, 0, 0), // cluster 0
      2L -> vec(0.5, 9.0, 0, 0, 0, 0, 0, 0), // cluster 1
      3L -> u, 4L -> u))
    // ids 3/4 are duplicates; whichever cluster they share, only one
    // survives — but 1 and 2 always survive (different clusters)
    val got = Curation.semanticDedupFixed(rows, "id", "v", centroids,
      thresholdFp = 990000000000L, dim = dim)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet.intersect(Set(1L, 2L)) === Set(1L, 2L))
    assert(got.keySet.intersect(Set(3L, 4L)) === Set(3L))
  }

  test("null vectors land in cluster -1 and always survive") {
    val a = vec(9.0, 1.0, 0, 0, 0, 0, 0, 0)
    val rows = Seq(1L -> Option(a), 2L -> Option(a),
      3L -> Option.empty[Seq[Float]]).toDF("id", "v")
    val got = Curation.semanticDedupFixed(rows, "id", "v", centroids,
      thresholdFp = 990000000000L, dim = dim)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 3L -> -1L))
  }

  test("semanticPairsFixed edges: transitive component policy vs greedy min-id on a star") {
    // star 1~5, 3~5 with 1!~3 (angles 0°/50°/25°, cos25≈.906 ≥ .9 >
    // cos50≈.64) under ONE centroid: greedy keeps {1, 3} (3's only
    // neighbor is LARGER), components keep {1} (3 joins 1's component
    // through 5 even though 5 is dropped)
    val one: Seq[Seq[Double]] = Seq(Seq.fill(8)(0.0))
    def ang(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      vec(math.cos(r), math.sin(r), 0, 0, 0, 0, 0, 0)
    }
    val rows = df(Seq(1L -> ang(0), 3L -> ang(50), 5L -> ang(25)))
    val tFp = 900000000000L
    val pairs = Curation.semanticPairsFixed(rows, "id", "v", one, tFp,
      dim = dim)
    assert(pairs.as[(Long, Long)].collect().toSet ===
      Set((1L, 5L), (3L, 5L)))
    val componentSurvivors = graft.dedup.Dedup.clusterSurvivors(
      rows.select("id"), "id", pairs).as[Long].collect().toSet
    assert(componentSurvivors === Set(1L))
    val greedySurvivors = Curation.semanticDedupFixed(rows, "id", "v",
      one, tFp, dim = dim).select("id").as[Long].collect().toSet
    assert(greedySurvivors === Set(1L, 3L))
  }

  test("d4Select drops exact dups, then measured outliers; isolated survivors pass") {
    val one: Seq[Seq[Double]] = Seq(Seq.fill(8)(0.0))
    def ang(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      vec(math.cos(r), math.sin(r), 0, 0, 0, 0, 0, 0)
    }
    // 1,2 = exact copies (dedup drops 2); 3,4 = a coherent near pair;
    // 5 = far from everything (its best dots are negative → outlier)
    val rows = Seq(
      1L -> ang(0), 2L -> ang(0), 3L -> ang(10), 4L -> ang(30),
      5L -> ang(170)).toDF("id", "v")
    val got = Curation.d4Select(rows, "id", "v",
      rawCentroids = one, dedupThresholdFp = 990000000000L,
      unitCentroids = one, k = 2, outlierBelowFp = 500000000000L)
      .as[(Long, Option[Long])].collect().toMap
    // 2 deduped away; 5 measured far below 0.5 mean cosine → dropped;
    // 1/3/4 survive with real densities
    assert(got.keySet === Set(1L, 3L, 4L))
    assert(got.values.forall(_.exists(_ >= 500000000000L)))
    // isolated survivor: a second corpus where dedup leaves one vector
    // alone in its list → NULL density, still kept
    val iso = Seq(1L -> ang(0), 2L -> ang(0)).toDF("id", "v")
    val gotIso = Curation.d4Select(iso, "id", "v", one,
      990000000000L, one, 2, 500000000000L)
      .as[(Long, Option[Long])].collect().toMap
    assert(gotIso === Map(1L -> None))
  }

  test("semanticDedup (trained driver): planted copies collapse, distinct docs survive") {
    // two well-separated clouds + exact-copy plants. Whatever
    // clustering the sampled KMeans finds, an exact copy lands in its
    // original's cluster (same vector → same nearest centroid) and
    // scores cosine 1.0, so only the min-id representative of each
    // planted group may survive — the q168 semantics through the
    // TRAINED path, no caller-supplied centroids.
    val a = vec(9.0, 1.0, 0, 0, 0, 0, 0, 0)
    val b = vec(1.0, 9.0, 0, 0, 0, 0, 0, 0)
    val rows = df(Seq(
      1L -> a, 2L -> a, 3L -> a, // planted group: only 1 survives
      10L -> b, 11L -> b,        // planted group: only 10 survives
      20L -> vec(0, 0, 9.0, 0, 0, 0, 0, 0))) // distinct: survives
    val got = Curation.semanticDedup(rows, "id", "v",
      thresholdFp = 990000000000L, nClusters = 2, dim = dim)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(1L, 10L, 20L))
    // copies share their original's cluster under ANY trained centroids
    val survClusters = got.values.toSet
    assert(survClusters.size <= 2)
  }

  test("oversized-cluster guard: survivors are a superset of exact, drops are sound") {
    // 60 near-identical vectors in one cluster plus small jitter in a
    // trailing dimension — all pairwise cosine far above threshold
    val rows = df((0 until 60).map { i =>
      i.toLong -> vec(9.0, 0.0, 0.001 * i, 0, 0, 0, 0, 0)
    })
    val exact = Curation.semanticDedupFixed(rows, "id", "v", centroids,
      thresholdFp = 900000000000L, dim = dim)
      .as[(Long, Long)].collect().toMap
    val guarded = Curation.semanticDedupFixed(rows, "id", "v", centroids,
      thresholdFp = 900000000000L, maxClusterSize = 10L, subPlanes = 2,
      dim = dim).as[(Long, Long)].collect().toMap
    // sub-bucketing only MISSES pairs: guarded keeps at least the exact set
    assert(exact.keySet.subsetOf(guarded.keySet))
    // drop soundness: every guarded drop is a TRUE ≥threshold dup —
    // it appears as id_b in the EXACT (unguarded) pair set, i.e. has
    // a genuine smaller-id ≥threshold same-cluster partner
    val droppedByGuard = rows.select("id").as[Long].collect().toSet --
      guarded.keySet
    assert(droppedByGuard.nonEmpty) // the guard must actually trip here
    val exactDupTargets = Curation.semanticPairsFixed(rows, "id", "v",
      centroids, thresholdFp = 900000000000L, dim = dim)
      .select("id_b").as[Long].collect().toSet
    assert(droppedByGuard.subsetOf(exactDupTargets))
    // exact path on this corpus keeps exactly the min id
    assert(exact.keySet === Set(0L))
  }
}
