package graft.pipeline

import graft.SparkSpec

/** [[Curation.prototypicalityPrune]] — keep-hardest semantics, the
  * cross-multiplied ceil keep count, id tie-break, and the cluster −1
  * "unknown survives" contract.
  */
class PrototypicalitySpec extends SparkSpec {
  import spark.implicits._

  private val centroids = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0))

  private def prune(rows: Seq[(Long, Seq[Float])], num: Long, den: Long) =
    Curation.prototypicalityPrune(
      rows.toDF("id", "vec"), "id", "vec", centroids, num, den)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1 else r.getInt(3)))
      .toSet

  test("keeps the hardest ceil(n/2) per cluster, ranked by d2 desc") {
    val rows = Seq(
      (1L, Seq(0.1f, 0f)), (2L, Seq(0.2f, 0f)), (3L, Seq(0.3f, 0f)),
      (4L, Seq(10.5f, 0f)), (5L, Seq(10.1f, 0f)))
    // cluster 0: n=3, keep 2 → ids 3 (rank 1), 2 (rank 2); drop 1.
    // cluster 1: n=2, keep 1 → id 4 (rank 1); drop 5.
    assert(prune(rows, 1L, 2L) ===
      Set((3L, 0L, 1), (2L, 0L, 2), (4L, 1L, 1)))
  }

  test("cross-multiplied keep count is an exact ceil") {
    // n=4, keep 1/3 → ceil(4/3)=2
    val rows = (1L to 4L).map(i => (i, Seq(i * 0.1f, 0f)))
    val kept = prune(rows, 1L, 3L)
    assert(kept.map(_._1) === Set(4L, 3L))
    // n=4, keep 1/4 → exactly 1
    assert(prune(rows, 1L, 4L).map(_._1) === Set(4L))
    // keep 1/1 → everything, ranked
    assert(prune(rows, 1L, 1L).map(_._1) === Set(1L, 2L, 3L, 4L))
  }

  test("equal distances rank by id") {
    // (0.2, 0) and (-0.2, 0): identical d² to centroid 0
    val rows = Seq((7L, Seq(0.2f, 0f)), (3L, Seq(-0.2f, 0f)))
    val out = Curation.prototypicalityPrune(
      rows.toDF("id", "vec"), "id", "vec", centroids, 1L, 1L)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out(3L) === 1 && out(7L) === 2)
  }

  test("short vectors land in cluster -1 and survive unranked") {
    val rows = Seq((1L, Seq(0.1f, 0f)), (2L, Seq(0.5f)))
    val out = Curation.prototypicalityPrune(
      rows.toDF("id", "vec"), "id", "vec", centroids, 1L, 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(out(2L) === ((-1L, true, true)))
    assert(out(1L)._1 === 0L)
  }

  test("d2_fp is the exact fixed-point projection of the d2 chain") {
    val x = 0.3f.toDouble
    val expected = math.floor((x * x + 0.0) * 1e12).toLong
    val out = Curation.prototypicalityPrune(
      Seq((1L, Seq(0.3f, 0f))).toDF("id", "vec"), "id", "vec",
      centroids, 1L, 1L).collect()(0)
    assert(out.getLong(2) === expected)
  }

  test("rejects an empty or inverted keep fraction") {
    val df = Seq((1L, Seq(0.1f, 0f))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Curation.prototypicalityPrune(df, "id", "vec", centroids, 3L, 2L)
    }
    intercept[IllegalArgumentException] {
      Curation.prototypicalityPrune(df, "id", "vec", centroids, 0L, 2L)
    }
  }
}
