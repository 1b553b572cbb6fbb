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

  test("hitsFixed: hand-computed 1-iteration hubs/authorities on a planted bipartite graph") {
    // hubs u1,u2,u3 → {a1, a2}; u1 additionally → a3
    val edges = Seq(
      (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 11L), (2L, 12L),
      (3L, 11L), (3L, 12L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 11L, 12L, 13L).toDF("node")
    val got = LinkAnalysis.hitsFixed(edges, nodes, iterations = 1)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val s = 1000000L
    // auth raw: a1=a2=3s (max), a3=s → normalized s, s, s/3
    assert(got(11L)._1 === s && got(12L)._1 === s)
    assert(got(13L)._1 === s / 3)
    assert(got(1L)._1 === 0L && got(2L)._1 === 0L)
    // hub raw: u1 = s + s + s/3 (max), u2 = u3 = 2s, a* = 0
    val u1raw = s + s + s / 3
    assert(got(1L)._2 === s)
    assert(got(2L)._2 === (2 * s) * s / u1raw)
    assert(got(3L)._2 === got(2L)._2)
    assert(got(11L)._2 === 0L && got(13L)._2 === 0L)
  }

  test("hitsFixed: the best-pointed authority stays on top across iterations") {
    val edges = Seq(
      (1L, 11L), (1L, 12L), (2L, 11L), (2L, 12L), (3L, 11L), (3L, 13L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 11L, 12L, 13L).toDF("node")
    val got = LinkAnalysis.hitsFixed(edges, nodes, iterations = 5)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // a11 is pointed by all three hubs — the unique top authority
    assert(got(11L)._1 === 1000000L)
    assert(got(11L)._1 > got(12L)._1 && got(12L)._1 > got(13L)._1,
      s"$got")
  }

  test("hitsFixed: an edgeless graph yields zero scores, not a division crash") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("node")
    val got = LinkAnalysis.hitsFixed(edges, nodes, iterations = 2)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 2 && got.forall(t => t._2 === 0L && t._3 === 0L))
  }
}
