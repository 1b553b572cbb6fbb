package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val numPerm = 64

  private def docs = Seq(
    (1L, Seq("the quick", "quick brown", "brown fox")),
    (2L, Seq("brown fox", "the quick", "jumps over")), // overlap with 1
    (3L, Seq("совершенно", "другой", "текст")),
    (4L, Seq.empty[String])).toDF("id", "shingles")

  test("MinHashSig matches the explode+MinHashAgg aggregation exactly") {
    val mask = (1L << 31) - 1L
    val viaAgg = docs
      .select($"id", explode($"shingles").as("s"))
      .select($"id", xxhash64($"s").bitwiseAND(lit(mask)).as("h"))
      .groupBy("id")
      .agg(graft.recommender.MinHashAgg.minhash(numPerm)($"h").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaExpr = docs
      .select($"id", MinHashExpressions.minhashSig($"shingles", numPerm).as("sig"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr.keySet === Set(1L, 2L, 3L)) // empty doc -> null, dropped
    assert(viaExpr === viaAgg)
  }

  test("MinHashWords (fused kernel) == staged shingle pipeline, bit for bit") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "δ", "e")
    val textGen = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val texts = (0 until 4).flatMap(i =>
      Gen.listOfN(25, textGen)(Gen.Parameters.default, Seed(4200L + i)).get)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val k = 3
    val staged = df.select($"id",
        graft.dedup.Dedup.shinglesFromWords(
          graft.text.TextAnalysis.words(
            graft.text.TextAnalysis.normalizeText($"text")), k).as("sh"))
      .filter(size($"sh") > 0)
      .select($"id", MinHashExpressions.minhashSig($"sh", numPerm).as("sig"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    val fused = df.select($"id",
        MinHashExpressions.minhashWords(
          graft.text.TextAnalysis.words(
            graft.text.TextAnalysis.normalizeText($"text")), k, numPerm).as("sig"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused === staged)
  }

  test("permA/permB closed forms match the permutationArray expression") {
    // the generated DuckDB oracles (graft.oracle.MinHashOracles) inline
    // Dedup.permA/permB as literals; this pins them to the engine's
    // expression-side constants so oracle and engine cannot drift
    val mask = (1L << 31) - 1L
    val hs = Seq(0L, 1L, 12345L, mask, 987654321L)
    val viaExpr = hs.toDF("h")
      .select($"h", graft.dedup.Dedup.permutationArray($"h", numPerm).as("p"))
      .as[(Long, Seq[Long])].collect().toMap
    for (h <- hs; j <- 0 until numPerm) {
      val expect = (h * graft.dedup.Dedup.permA(j) + graft.dedup.Dedup.permB(j)) & mask
      assert(viaExpr(h)(j) === expect, s"h=$h j=$j")
    }
  }

  test("SimHashSig matches the HOF simHashFromHashes formulation exactly") {
    val words = Seq(
      (1L, Seq("the", "quick", "brown", "fox")),
      (2L, Seq("the", "quick", "brown", "fax")),
      (3L, Seq("völlig", "anderer", "text", "ここ")),
      (4L, Seq("x"))).toDF("id", "words")
    val viaHof = words.select($"id",
      graft.dedup.Dedup.simHashFromHashes(
        transform($"words", w => xxhash64(w))).as("sig"))
      .as[(Long, Long)].collect().toMap
    val viaExpr = words.select($"id",
      MinHashExpressions.simhashSig($"words").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr === viaHof)
    val empty = Seq((5L, Seq.empty[String])).toDF("id", "words")
      .select(MinHashExpressions.simhashSig($"words")).collect()
    assert(empty.head.isNullAt(0))
  }

  test("signature is a real MinHash: overlap lowers distance, empty is null") {
    val sigs = docs
      .select($"id", MinHashExpressions.minhashSig($"shingles", numPerm).as("sig"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(sigs(4L).isEmpty)
    def agree(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).count { case (x, y) => x == y }
    val overlapping = agree(sigs(1L).get, sigs(2L).get)
    val disjoint = agree(sigs(1L).get, sigs(3L).get)
    assert(overlapping > disjoint)
  }
}
