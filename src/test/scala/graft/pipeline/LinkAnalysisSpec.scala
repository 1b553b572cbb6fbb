package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank (q133): hand-checkable fixed points, ranking
  * order on an authority graph, and the documented dangling-mass
  * contract.
  */
class LinkAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iterations: Int = 5): Map[Long, Long] =
    LinkAnalysis.pageRankFixed(
      edges.toDF("src", "dst"), nodes.toDF("node"), iterations)
      .as[(Long, Long)].collect().toMap

  test("a 2-cycle is a fixed point at the initial rank") {
    // r' = 150000 + 85% of a full rank passed around the cycle = scale
    val r = ranksOf(Seq((0L, 1L), (1L, 0L)), Seq(0L, 1L))
    assert(r === Map(0L -> 1000000L, 1L -> 1000000L))
  }

  test("the authority of a star graph outranks its satellites") {
    // 1..4 all link to 0; 0 links back to 1
    val r = ranksOf(
      Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)),
      Seq(0L, 1L, 2L, 3L, 4L))
    assert(r(0L) > r(1L), s"hub must outrank its satellite: $r")
    assert(r(1L) > r(2L), s"linked-to satellite outranks unlinked: $r")
    assert(r(2L) === r(3L) && r(3L) === r(4L), s"symmetric satellites: $r")
    // satellites keep at least the damping floor
    assert(Seq(2L, 3L, 4L).forall(n => r(n) >= 150000L))
  }

  test("dangling nodes drop mass (documented divergence), never below the floor") {
    // 0 -> 1, and 1 has no out-links: 1's mass leaks each iteration
    val r = ranksOf(Seq((0L, 1L)), Seq(0L, 1L))
    assert(r(0L) === 150000L, "no in-links => exactly the damping floor")
    assert(r(1L) >= 150000L && r(1L) < 1000000L,
      s"sink keeps the floor but total mass shrinks: $r")
    assert(r.values.sum < 2L * 1000000L)
  }

  test("parallel edges weigh double") {
    // 0 links twice to 1 and once to 2: 1 gets 2/3 of 0's rank
    val r = ranksOf(Seq((0L, 1L), (0L, 1L), (0L, 2L)), Seq(0L, 1L, 2L),
      iterations = 1)
    val third = 1000000L / 3
    assert(r(1L) === 150000L + 85L * (2 * third) / 100, s"$r")
    assert(r(2L) === 150000L + 85L * third / 100, s"$r")
  }
}
