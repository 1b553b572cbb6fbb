package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val train = (1L to 50L)
    .map(i => (i, "the cat sat on the mat and the dog sat on the rug"))
    .toDF("doc_id", "text")

  test("train: caps hold; <unk> folds OOV; counts are mapped totals") {
    val m = BigramLm.train(train, "text", vocabSize = 5, maxBigrams = 8)
    assert(m.unigrams.map(_._1).contains(BigramLm.Unk))
    assert(m.unigrams.map(_._1).toSet.size <= 6) // 5 vocab + unk
    assert(m.bigrams.size <= 8)
    assert(m.total === 50L * 13) // every occurrence counted
    assert(m.vSize === 6)
    // mapped unigram counts sum to the total
    assert(m.unigrams.map(_._2).sum === m.total)
  }

  test("perplexity: fluent (seen) text scores below scrambled text") {
    val m = BigramLm.train(train, "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),          // seen bigrams
      (2L, "mat the on cat the sat"),          // same words, unseen order
      (3L, "completely novel zebra words here"), // OOV
      (4L, "single"),                           // 1 word -> unscored
      (5L, ""))                                 // empty -> unscored
      .toDF("doc_id", "text")
    val got = BigramLm.perplexity(docs, "doc_id", "text", m,
        headBelowFp = 1000000L, midBelowFp = 5000000L)
      .as[(Long, Long, Long, Option[Long], String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._4.get < got(2L)._4.get,
      s"fluent ${got(1L)._4} !< scrambled ${got(2L)._4}")
    assert(got(2L)._4.get < got(3L)._4.get,
      s"scrambled ${got(2L)._4} !< OOV ${got(3L)._4}")
    assert(got(4L)._5 === "unscored" && got(4L)._2 === 0L)
    assert(got(5L)._5 === "unscored" && got(5L)._3 === 0L)
    // n_scored = words - 1
    assert(got(1L)._2 === 5L)
  }

  test("collocations: hand-computed PMI; min-count and <unk> filters") {
    // "new york" always adjacent (strong collocation); "the" everywhere
    val docs = (1L to 20L)
      .map(i => (i, s"the new york office of the w$i group"))
      .toDF("doc_id", "text")
    val m = BigramLm.train(docs, "text", vocabSize = 6, maxBigrams = 64)
    val got = BigramLm.collocations(spark, m, minCount = 5L)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // no <unk> bigrams; all pairs meet the count floor
    got.keys.foreach { case (a, b) =>
      assert(a != BigramLm.Unk && b != BigramLm.Unk)
    }
    assert(got.values.forall(_._3 >= 5L))
    // hand-check: pmi(new,york) = ln(c_ab*N/(c_a*c_b)), c=20, N=160
    val uni = m.unigrams.toMap
    val expect = math.floor(math.log(
      20.0 * m.total / (uni("new").toDouble * uni("york").toDouble)) * 1e6)
      .toLong
    assert(got(("new", "york"))._4 === expect)
    // the adjacent-always pair outranks the promiscuous "the"-pairs
    val ranks = got.map { case (k, v) => k -> v._5 }
    assert(ranks(("new", "york")) < ranks(("of", "the")))
  }

  test("kneserNeyPerplexity: fluent beats scrambled and OOV; degenerate " +
    "docs unscored; continuation beats raw frequency on a trapped word") {
    val m = BigramLm.train(train, "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "mat the on cat the sat"),
      (3L, "completely novel zebra words here"),
      (4L, "single"), (5L, ""))
      .toDF("doc_id", "text")
    val got = BigramLm.kneserNeyPerplexity(docs, "doc_id", "text", m,
        headBelowFp = 1000000L, midBelowFp = 5000000L)
      .as[(Long, Long, Long, Option[Long], String)].collect()
      .map(r => r._1 -> r).toMap
    // fluent dominates both corruptions; scrambled-vs-OOV order is NOT
    // asserted — under KN an all-OOV doc is pure backoff (λ guard ×
    // continuation floor), and whether that beats known-word bigrams
    // with low continuation fan-outs is parameter-dependent, unlike
    // q211's uniform interpolation where OOV always loses
    assert(got(1L)._4.get < got(2L)._4.get)
    assert(got(1L)._4.get < got(3L)._4.get)
    assert(got(4L)._5 === "unscored" && got(5L)._5 === "unscored")
    // the KN signature: a word that appears often but ONLY after one
    // context ("francisco" after "san") must score WORSE in a novel
    // context than an equally frequent versatile word — uniform-prior
    // interpolation (q211's perplexity) cannot see the difference
    // francisco: 40 occurrences, ONE left context (san); area: 40
    // occurrences, FORTY left contexts (w$i) — equal raw frequency,
    // maximally different continuation fan-in
    val kn = (1L to 40L)
      .map(i => (i, s"san francisco and w$i area and"))
      .toDF("doc_id", "text")
    val mk = BigramLm.train(kn, "text")
    val probe = Seq(
      (1L, "nice francisco"), // trapped word, novel context
      (2L, "nice area"))      // versatile word, same frequency class
      .toDF("doc_id", "text")
    val scored = BigramLm.kneserNeyPerplexity(probe, "doc_id", "text",
        mk, 100L, 200L)
      .as[(Long, Long, Long, Option[Long], String)].collect()
      .map(r => r._1 -> r._4.get).toMap
    assert(scored(1L) > scored(2L),
      s"KN should punish the single-context word: ${scored(1L)} !> ${scored(2L)}")
  }

  test("kneserNeyPerplexity: deterministic under repartition") {
    val m = BigramLm.train(train, "text")
    val docs = (1L to 30L).map(i => (i, s"the cat sat token$i on the mat"))
      .toDF("doc_id", "text")
    val a = BigramLm.kneserNeyPerplexity(docs, "doc_id", "text", m, 100L, 200L)
      .as[(Long, Long, Long, Option[Long], String)].collect().sorted.toSeq
    val b = BigramLm.kneserNeyPerplexity(docs.repartition(7), "doc_id",
        "text", m, 100L, 200L)
      .as[(Long, Long, Long, Option[Long], String)].collect().sorted.toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      BigramLm.kneserNeyPerplexity(docs, "doc_id", "text", m, 200L, 100L)
    }
  }

  test("perplexity: deterministic under repartition; thresholds validated") {
    val m = BigramLm.train(train, "text")
    val docs = (1L to 30L).map(i => (i, s"the cat sat token$i on the mat"))
      .toDF("doc_id", "text")
    val a = BigramLm.perplexity(docs, "doc_id", "text", m, 100L, 200L)
      .as[(Long, Long, Long, Option[Long], String)].collect().sorted.toSeq
    val b = BigramLm.perplexity(docs.repartition(7), "doc_id", "text",
        m, 100L, 200L)
      .as[(Long, Long, Long, Option[Long], String)].collect().sorted.toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      BigramLm.perplexity(docs, "doc_id", "text", m, 200L, 100L)
    }
  }
}
