package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The hash-gateable fixed ANN twins (q48b/q52b/q53b/q78b): recall
  * against the exact verifier, planted-duplicate sanity, and the
  * driver-side/SQL xxhash64 parity the Rademacher planes rest on.
  */
class FixedAnnSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def bruteSet(k: Int) = {
    val e = emb
    Ann.bruteForceTopK(e, "vec_id", "embedding",
      e.filter($"vec_id" < 10), "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
  }

  test("radSign matches the distributed xxhash64 expression bit") {
    val keys = for (t <- 0 until 2; p <- 0 until 2; d <- 0 until 8)
      yield (t, p, d)
    val viaSql = keys.map { case (t, p, d) =>
      spark.range(1).select(xxhash64(lit(s"$t:$p:$d"))).as[Long].head()
    }
    keys.zip(viaSql).foreach { case ((t, p, d), h) =>
      val want = if ((h & 1L) == 0L) 1L else -1L
      assert(Ann.radSign(t, p, d) === want, s"($t,$p,$d)")
    }
  }

  test("lshTopKFixed: high recall@10 vs brute force on real embeddings") {
    val e = emb
    val got = Ann.lshTopKFixed(e, "vec_id", "embedding",
      e.filter($"vec_id" < 10), "vec_id", "embedding",
      k = 10, tables = 32, planes = 4, dim = 64)
    val approx = got.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    got.unpersist()
    val brute = bruteSet(10)
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.8, s"fixed-LSH recall@10 too low: $recall")
  }

  test("ivfTopKFixed: high recall@10 under frozen first-16 centroids") {
    val e = emb
    val cents = unitHead(16)
    val got = Ann.ivfTopKFixed(e, "vec_id", "embedding",
      e.filter($"vec_id" < 10), "vec_id", "embedding",
      k = 10, centroids = cents, nprobe = 4)
    val approx = got.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    got.unpersist()
    val brute = bruteSet(10)
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.5, s"fixed-IVF recall@10 too low: $recall")
  }

  test("pqTopKFixed: high recall@10 under frozen first-16 codebooks") {
    val e = emb
    val src = unitHead(16)
    val codebooks = (0 until 16).map(j => src.map(_.slice(j * 4, j * 4 + 4)))
    val got = Ann.pqTopKFixed(e, "vec_id", "embedding",
      e.filter($"vec_id" < 10), "vec_id", "embedding",
      k = 10, codebooks = codebooks)
    val approx = got.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    got.unpersist()
    val brute = bruteSet(10)
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.3, s"fixed-PQ recall@10 too low: $recall")
  }

  private def unitHead(n: Int): Seq[Seq[Double]] =
    emb.filter($"vec_id" < n).orderBy("vec_id")
      .select("embedding").collect()
      .map { r =>
        val raw = r.getSeq[Float](0).map(_.toDouble)
        val nn = math.sqrt(raw.foldLeft(0.0)((a, x) => a + x * x))
        (if (nn > 0) raw.map(_ / nn) else raw).toSeq
      }.toSeq

  test("IvfIndex fixed lifecycle (build+refresh+probe) equals one-shot ivfTopKFixed") {
    val e = emb
    val cents = unitHead(16)
    val name = s"graft_ivf_fixed_${System.nanoTime()}"
    try {
      IvfIndex.buildFixed(e.filter($"vec_id" % 2 === 0), "vec_id",
        "embedding", name, cents)
      IvfIndex.refreshFixed(e.filter($"vec_id" % 2 === 1), "vec_id",
        "embedding", name)
      val got = IvfIndex.probeFixed(spark, name, e.filter($"vec_id" < 10),
        "vec_id", "embedding", k = 10, nprobe = 4)
        .select("query_id", "neighbor_id", "rank", "score_fp")
        .as[(Long, Long, Int, Long)].collect().toSet
      val direct = Ann.ivfTopKFixed(e, "vec_id", "embedding",
        e.filter($"vec_id" < 10), "vec_id", "embedding",
        k = 10, centroids = cents, nprobe = 4)
      val want = direct.select("query_id", "neighbor_id", "rank", "score_fp")
        .as[(Long, Long, Int, Long)].collect().toSet
      direct.unpersist()
      assert(got === want)
    } finally IvfIndex.drop(spark, name)
  }

  test("PqIndex fixed lifecycle (build+refresh+probe) equals one-shot pqTopKFixed") {
    val e = emb
    val src = unitHead(16)
    val codebooks = (0 until 16).map(j => src.map(_.slice(j * 4, j * 4 + 4)))
    val name = s"graft_pq_fixed_${System.nanoTime()}"
    try {
      PqIndex.buildFixed(e.filter($"vec_id" % 2 === 0), "vec_id",
        "embedding", name, codebooks)
      PqIndex.refreshFixed(e.filter($"vec_id" % 2 === 1), "vec_id",
        "embedding", name)
      val got = PqIndex.probeFixed(spark, name, e.filter($"vec_id" < 10),
        "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id", "rank", "score_fp")
        .as[(Long, Long, Int, Long)].collect().toSet
      val direct = Ann.pqTopKFixed(e, "vec_id", "embedding",
        e.filter($"vec_id" < 10), "vec_id", "embedding",
        k = 10, codebooks = codebooks)
      val want = direct.select("query_id", "neighbor_id", "rank", "score_fp")
        .as[(Long, Long, Int, Long)].collect().toSet
      direct.unpersist()
      assert(got === want)
    } finally PqIndex.drop(spark, name)
  }

  test("fixed twins are partitioning-invariant (exact scores and ranks)") {
    // the cross-engine determinism claim implies cross-PARTITIONING
    // determinism: integer sums and fixed fold orders cannot depend on
    // how rows are split across tasks
    val e = emb
    val e7 = emb.repartition(7)
    def run(c: org.apache.spark.sql.DataFrame) = {
      val got = Ann.lshTopKFixed(c, "vec_id", "embedding",
        c.filter($"vec_id" < 10), "vec_id", "embedding",
        k = 10, tables = 32, planes = 4, dim = 64)
      val rows = got.select("query_id", "neighbor_id", "rank", "score_fp")
        .as[(Long, Long, Int, Long)].collect().toSet
      got.unpersist()
      rows
    }
    assert(run(e) === run(e7))
  }

  test("fixed-twin queries stay inside whole-stage codegen (no silent fallback)") {
    // Round 10's regression: the unrolled Column kernels blew Janino's
    // 64 KB method limit and the whole stage SILENTLY fell back to
    // interpreted eval — found only in test logs. With the fallback
    // escape hatch disabled, any future constant-size bump that
    // re-trips the limit fails HERE instead of shipping a 3× slower
    // plan. (q53b is the pairs form of the same kernels; the index
    // lifecycles q108b/q109b reuse q52b/q78b's scoring plans.)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      for (q <- Seq("q48b_ann_lsh_fixed", "q52b_ann_ivf_fixed",
          "q78b_ann_pq_fixed")) {
        val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        try assert(df.count() > 0, s"$q returned no rows")
        finally df.unpersist()
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("fixed kernels reject integral-element arrays at analysis time") {
    import graft.functions._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "v")
    // the HOF forms these replaced would cast; the native kernels read
    // fixed-width slots, so an ARRAY<BIGINT> vector must fail analysis
    // loudly, never read garbage at the wrong width
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ColumnBridge.column(UnitVector(
        ColumnBridge.expression(col("v"))))).collect()
    }
    assert(e.getMessage.contains("ARRAY<FLOAT>") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("embeddingPairsLshFixed finds every planted scaled copy at cos ≈ 1") {
    val e = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("embedding"))
    val planted = e.unionAll(e.select($"vec_id" + 100000,
      transform($"embedding", x => x * 2.0)))
    val got = Ann.embeddingPairsLshFixed(planted, "vec_id", "embedding",
      thresholdFp = 450000000000L, tables = 32, planes = 4, dim = 64)
    val pairs = got.select("id_a", "id_b", "score_fp")
      .as[(Long, Long, Long)].collect()
    got.unpersist()
    val n = e.count()
    val plantedPairs = pairs.filter { case (a, b, _) => b == a + 100000 }
    // a ×2 copy has the IDENTICAL unit vector: same buckets (always a
    // candidate) and a score within fixed-point truncation of 1e12
    assert(plantedPairs.length === n)
    plantedPairs.foreach { case (_, _, s) =>
      assert(s > 999000000000L, s"planted pair score too low: $s")
    }
  }
}
