package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AnnIndex]] — the unified ANN facade: the decision table resolves
  * the family a caller would pick by hand, and dispatch is
  * EQUIVALENT to the direct operator call with the derived params
  * (same seed → same rows), so the facade adds a choice, never a
  * semantic fork.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def q = emb.filter($"vec_id" < 5)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet

  test("choose: the decision table picks the documented family per regime") {
    // small corpus → brute, whatever the budget
    assert(AnnIndex.choose(1000L, 64, 10).family === AnnIndex.Brute)
    assert(AnnIndex.choose(AnnIndex.BruteMaxRows, 64, 10).family
      === AnnIndex.Brute)
    // big corpus, vectors fit → IVF with √n lists
    val ivf = AnnIndex.choose(1000000L, 64, 10)
    assert(ivf.family === AnnIndex.Ivf)
    assert(ivf.nlist === 1000)
    assert(ivf.nprobe === 250)
    // big corpus, vectors exceed the budget, PQ-divisible dim → PQ
    val pq = AnnIndex.choose(1000000L, 64, 10,
      memoryBudgetBytes = 1000000L)
    assert(pq.family === AnnIndex.Pq)
    assert(pq.m === 16 && pq.ks === 16 && pq.overfetch === 16)
    // ... non-divisible dim → IVF-SQ8
    val sq = AnnIndex.choose(1000000L, 63, 10,
      memoryBudgetBytes = 1000000L)
    assert(sq.family === AnnIndex.IvfSq8)
    assert(sq.nlist === 1000)
    // explicit override beats the table
    assert(AnnIndex.choose(10L, 64, 10,
      family = Some(AnnIndex.Lsh)).family === AnnIndex.Lsh)
    // nlist clamps: tiny n → 4 (KMeans needs k >= 2), huge n → 4096
    assert(AnnIndex.nlistFor(1L) === 4)
    assert(AnnIndex.nlistFor(1L << 60) === 4096)
    // PQ m: largest divisor in {16,8,4,2}; primes get none
    assert(AnnIndex.pqMFor(64) === 16)
    assert(AnnIndex.pqMFor(24) === 8)
    assert(AnnIndex.pqMFor(7) === 0)
  }

  test("facade default on a small corpus IS brute force (row-identical)") {
    val got = rows(AnnIndex.topK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10))
    val direct = rows(Ann.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", 10))
    assert(got === direct)
  }

  test("forced IVF dispatch equals the direct ivfTopK call (same derived params)") {
    val plan = AnnIndex.choose(emb.count(), 64, 10,
      family = Some(AnnIndex.Ivf))
    val got = AnnIndex.run(plan, emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, seed = 7L)
    val direct = Ann.ivfTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", 10,
      nlist = plan.nlist, nprobe = plan.nprobe, seed = 7L)
    try assert(rows(got) === rows(direct))
    finally { got.unpersist(); direct.unpersist() }
  }

  test("forced PQ dispatch equals the direct pqTopK call") {
    val plan = AnnIndex.choose(emb.count(), 64, 10,
      family = Some(AnnIndex.Pq))
    val got = AnnIndex.run(plan, emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, seed = 7L)
    val direct = Ann.pqTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", 10,
      m = plan.m, ks = plan.ks, seed = 7L, overfetch = plan.overfetch)
    try assert(rows(got) === rows(direct))
    finally { got.unpersist(); direct.unpersist() }
  }

  test("forced IVF-SQ8 dispatch: valid shape, deterministic, sane recall") {
    val plan = AnnIndex.choose(emb.count(), 64, 10,
      family = Some(AnnIndex.IvfSq8))
    def once() = AnnIndex.run(plan, emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, seed = 7L)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val a = once()
    assert(a === once()) // same seed → same trained artifacts → same rows
    // ranks dense 1..10 per query
    a.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._3).toSeq.sorted === (1 to rs.size))
    }
    // probing + quantization can miss, but must overlap brute heavily
    val brute = rows(Ann.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", 10)).map(r => (r._1, r._2))
    val recall = (brute & a.map(r => (r._1, r._2))).size.toDouble / brute.size
    assert(recall >= 0.5, s"facade IVF-SQ8 recall: $recall")
  }

  test("forced Proj dispatch == direct projTopKFixed with the plan's params") {
    val plan = AnnIndex.choose(2000L, 64, 10, family = Some(AnnIndex.Proj))
    assert(plan.family === AnnIndex.Proj)
    assert(plan.dOut === 32 && plan.shortlist === 100)
    val viaFacade = AnnIndex.run(plan, emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10)
      .as[(Long, Long, Int, Long)].collect().toSet
    val direct = Projection.projTopKFixed(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, shortlist = 100,
      dIn = 64, dOut = 32)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(viaFacade === direct)
    assert(viaFacade.nonEmpty)
  }

  test("dim inference skips null/empty vectors") {
    val withEmpty = emb.select($"vec_id", $"embedding")
      .unionByName(Seq((900000L, Array.empty[Float]))
        .toDF("vec_id", "embedding"))
    val got = AnnIndex.topK(withEmpty, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5)
    assert(rows(got).nonEmpty)
  }
}
