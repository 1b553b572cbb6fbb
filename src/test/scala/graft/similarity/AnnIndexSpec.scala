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

  test("empty / all-empty corpus: topK falls back to brute instead of " +
    "crashing the dim probe") {
    val empty = emb.filter($"vec_id" < 0)
    val got = AnnIndex.topK(empty, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5)
    assert(got.columns.toSeq
      === Seq("query_id", "neighbor_id", "rank", "cos_sim"))
    assert(got.count() === 0L)
    // all-empty vectors: no dim to infer — the brute fallback scores
    // them as degenerate zero-cosine rows (bruteForceTopK's existing
    // contract) rather than throwing NoSuchElementException
    val allEmpty = Seq((1L, Array.empty[Float]), (2L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    val degenerate = AnnIndex.topK(allEmpty, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5)
    assert(degenerate.columns.toSeq
      === Seq("query_id", "neighbor_id", "rank", "cos_sim"))
    assert(degenerate.count() >= 0L) // materializes without throwing
  }

  test("statsHint skips the count scan but resolves the identical plan") {
    val n = emb.count()
    val hinted = rows(AnnIndex.topK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, statsHint = n))
    val counted = rows(AnnIndex.topK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10))
    assert(hinted === counted)
  }

  test("persistent lifecycle: roomy budget builds IVF; probe == IvfIndex.probe") {
    val name = "graft_annix_ivf_t"
    AnnIndex.dropIndex(spark, name)
    try {
      val plan = AnnIndex.build(emb, "vec_id", "embedding", name, seed = 7L)
      assert(plan.family === AnnIndex.Ivf)
      val loaded = AnnIndex.planOf(spark, name)
      assert(loaded.family === AnnIndex.Ivf)
      assert(loaded.nlist === plan.nlist && loaded.nprobe === plan.nprobe)
      val viaFacade = rows(AnnIndex.probe(spark, name,
        q, "vec_id", "embedding", k = 10))
      val direct = rows(IvfIndex.probe(spark, name,
        q, "vec_id", "embedding", 10, nprobe = plan.nprobe))
      assert(viaFacade === direct)
      assert(viaFacade.nonEmpty)
    } finally AnnIndex.dropIndex(spark, name)
  }

  test("persistent lifecycle: tight budget builds PQ; refresh folds new vectors in") {
    val name = "graft_annix_pq_t"
    AnnIndex.dropIndex(spark, name)
    try {
      val base = emb.filter($"vec_id" % 2 === 0)
      val plan = AnnIndex.build(base, "vec_id", "embedding", name,
        memoryBudgetBytes = 8L, seed = 7L)
      assert(plan.family === AnnIndex.Pq)
      val before = rows(AnnIndex.probe(spark, name,
        q, "vec_id", "embedding", k = 10))
      assert(before.nonEmpty)
      // probe-many is frozen-artifact: no odd id can appear yet
      assert(before.forall(_._2 % 2 == 0))
      AnnIndex.refresh(emb.filter($"vec_id" % 2 === 1),
        "vec_id", "embedding", name)
      val after = rows(AnnIndex.probe(spark, name,
        q, "vec_id", "embedding", k = 10))
      // the folded half is now retrievable under the frozen codebooks
      assert(after.exists(_._2 % 2 == 1))
    } finally AnnIndex.dropIndex(spark, name)
  }
}
