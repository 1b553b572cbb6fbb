package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BM25 retrieval (q153): hand-computed fixture parity, self-match
  * exclusion, the empty-token and id-type-mismatch traps from the r11
  * advice, and the WindowGroupLimit plan shape.
  */
class RetrievalSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "Apple banana  APPLE"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry date")).toDF("doc_id", "text")
  }

  /** The exact per-(doc, term) weight chain of Retrieval.bm25TopK,
    * mirrored op for op (same IEEE association) on driver doubles.
    */
  private def wFp(tf: Long, dl: Long, df: Long, nDocs: Long,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Long = {
    val idf = math.log(1.0 + (nDocs.toDouble - df + 0.5) / (df + 0.5))
    math.floor(idf * ((tf * (k1 + 1.0)) /
      (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))) * 1e6).toLong
  }

  test("scores match the hand-computed BM25 fixture, ranked and k-capped") {
    import spark.implicits._
    val docs = fixture
    val queries = Seq((99L, "apple cherry")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "doc_id", "text", k = 2)
      .orderBy("rank")
      .as[(Long, Long, Int, Long)].collect().toSeq
    // corpus: d1 dl=3, d2 dl=2, d3 dl=4; avgdl = 9/3; df(apple)=2,
    // df(cherry)=2, N=3
    val avgdl = 9.toDouble / 3.toDouble
    val d1 = wFp(2, 3, 2, 3, avgdl)
    val d2 = wFp(1, 2, 2, 3, avgdl)
    val d3 = wFp(1, 4, 2, 3, avgdl) + wFp(2, 4, 2, 3, avgdl)
    assert(d3 > d1 && d1 > d2) // sanity on the fixture itself
    assert(got === Seq((99L, 3L, 1, d3), (99L, 1L, 2, d1)))
  }

  test("a query drawn from the corpus retrieves neighbors, never itself") {
    val docs = fixture
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      docs.filter(col("doc_id") === 3), "doc_id", "text", k = 5)
    assert(out.filter(col("doc_id") === col("query_id")).count() === 0)
    assert(out.count() > 0)
  }

  test("mismatched id types skip the self-exclusion instead of dropping all rows") {
    import spark.implicits._
    val docs = fixture
    // string-typed query ids: a different key space — the cross-type
    // self-filter would cast to null and silently return ZERO rows
    val queries = Seq(("3", "apple cherry cherry date"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "doc_id", "text", k = 5).collect()
    assert(out.nonEmpty, "cross-type self-filter dropped every row")
    // with no exclusion, the best match for d3's own text is d3
    assert(out.map(r => (r.getInt(2), r.getLong(1))).min === (1, 3L))
  }

  test("empty and whitespace-only docs contribute no tokens; empty query retrieves nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana"), (2L, ""), (3L, "   \t ")).toDF("doc_id", "text")
    val q = Seq((9L, "apple"), (8L, "  ")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      q, "doc_id", "text", k = 5).collect()
    // the empty query matches nothing (no "" term); the empty docs are
    // never retrieved (tf has no rows for them)
    assert(out.forall(_.getLong(0) == 9L))
    assert(out.map(_.getLong(1)).toSet === Set(1L))
    // dl/avgdl must not be inflated by phantom "" tokens: d1's score
    // equals the 1-real-doc computation (avgdl = 2/3 over 3 docs)
    val avgdl = 2.toDouble / 3.toDouble
    assert(out.head.getLong(3) === wFp(1, 2, 1, 3, avgdl))
  }

  test("q153 plan: per-query top-k applies WindowGroupLimit; query side broadcasts") {
    val p = graft.SparkEntry.queries("q153_bm25_topk")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"top-k not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"query side not broadcast:\n$p")
  }

  test("maxDfFraction drops stopword-class terms from scoring") {
    import spark.implicits._
    // "the" appears in all 3 docs (df = N); "apple" in one
    val docs = Seq(
      (1L, "the apple pie"), (2L, "the banana split"), (3L, "the cherry cake"))
      .toDF("doc_id", "text")
    val q = Seq((9L, "the apple")).toDF("doc_id", "text")
    val pruned = Retrieval.bm25TopK(docs, "doc_id", "text",
      q, "doc_id", "text", k = 3, maxDfFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // with "the" pruned (df = 3 > 1.5), only the apple doc matches
    assert(pruned === Set(1L))
    val exact = Retrieval.bm25TopK(docs, "doc_id", "text",
      q, "doc_id", "text", k = 3)
      .select("doc_id").as[Long].collect().toSet
    // exact BM25 keeps all three ("the" matches everything)
    assert(exact === Set(1L, 2L, 3L))
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(fixture, "doc_id", "text",
        fixture, "doc_id", "text", k = 0)
    }
  }
}
