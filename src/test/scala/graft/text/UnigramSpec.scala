package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unigram-LM tokenizer (q159): Viterbi optimality (including the case
  * greedy gets wrong), the deterministic tie-break, UNK collapse, a
  * kernel-vs-naive DP property, train coverage, and the artifact
  * round-trip.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def enc(v: Seq[(String, Long)], words: String*): Seq[Seq[String]] = {
    val df = words.toSeq.toDF("w")
    df.select(graft.functions.UnigramEncode.pieces(col("w"), v, 6).as("p"))
      .as[Seq[String]].collect().toSeq
  }

  test("Viterbi picks the globally-optimal segmentation greedy misses") {
    // greedy longest-match from the left takes abc|d = -15;
    // the optimum is ab|cd = -2
    val v = Seq("abc" -> -10L, "ab" -> -1L, "cd" -> -1L, "d" -> -5L,
      "a" -> -8L, "b" -> -8L, "c" -> -8L)
    assert(enc(v, "abcd").head === Seq("ab", "cd"))
  }

  test("equal path scores prefer the longer piece (the SQL replay order)") {
    // [aa] = -2 and [a, a] = -2: the l DESC tie-break keeps "aa"
    val v = Seq("aa" -> -2L, "a" -> -1L)
    assert(enc(v, "aa").head === Seq("aa"))
  }

  test("a word with an uncovered character collapses to [UNK]; empty word to []") {
    val v = Seq("a" -> -1L, "b" -> -1L)
    assert(enc(v, "axb").head === Seq("[UNK]"))
    assert(enc(v, "").head === Seq.empty[String])
    assert(enc(v, "ab").head === Seq("a", "b"))
  }

  test("property: kernel equals a naive driver-side Viterbi on random inputs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    def randPiece(len: Int): String =
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 1 to 20) {
      val vocab = (alphabet.map(_.toString) ++
        (1 to 6).map(_ => randPiece(2 + rnd.nextInt(4)))).distinct
        .map(p => p -> -(1L + rnd.nextInt(1000))).toSeq
      val scores = vocab.toMap
      val words = (1 to 10).map(_ => randPiece(1 + rnd.nextInt(12)))
      def naive(w: String): Seq[String] = {
        val n = w.length
        val best = Array.fill(n + 1)(Long.MinValue / 4)
        val bl = new Array[Int](n + 1)
        best(0) = 0
        for (i <- 1 to n; l <- math.min(6, i) to 1 by -1) {
          val p = w.substring(i - l, i)
          if (best(i - l) > Long.MinValue / 4 && scores.contains(p)) {
            val c = best(i - l) + scores(p)
            if (c > best(i)) { best(i) = c; bl(i) = l }
          }
        }
        if (best(n) <= Long.MinValue / 4) Seq("[UNK]")
        else {
          var cur = n
          val out = scala.collection.mutable.ListBuffer.empty[String]
          while (cur > 0) { out.prepend(w.substring(cur - bl(cur), cur)); cur -= bl(cur) }
          out.toSeq
        }
      }
      val got = enc(vocab, words: _*)
      words.zip(got).foreach { case (w, g) =>
        assert(g === naive(w), s"round $round word $w vocab $vocab")
      }
    }
  }

  test("trainFrozen covers every observed character and respects topK") {
    val docs = Seq((1L, "spark scala spark"), (2L, "scala plans"))
      .toDF("doc_id", "text")
    val v = Unigram.trainFrozen(docs, "text", topK = 3)
    val pieces = v.pieces.map(_._1).toSet
    "sparkcln".foreach(c =>
      assert(pieces.contains(c.toString), s"missing single '$c'"))
    assert(v.pieces.count(_._1.length >= 2) <= 3)
    assert(v.pieces.forall(_._2 <= 0L))
    // a trained vocab tokenizes its own corpus with zero UNK
    val stats = Unigram.tokenStats(docs, "doc_id", "text", v)
      .as[(Long, Long, Long, Long)].collect()
    assert(stats.forall(t => t._2 > 0 && t._3 > 0))
  }

  test("tokenStats: occurrence weighting and zero rows for wordless docs") {
    val v = Unigram.trainFrozen(
      Seq((1L, "aa ab")).toDF("doc_id", "text"), "text", topK = 8)
    val docs = Seq((1L, "aa aa ab"), (2L, "   "), (3L, null: String))
      .toDF("doc_id", "text")
    val got = Unigram.tokenStats(docs, "doc_id", "text", v)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L)._1 === 3L) // n_words counts occurrences
    assert(got(2L) === ((0L, 0L, 0L)))
    assert(got(3L) === ((0L, 0L, 0L)))
  }

  test("tokenStatsMapOnly equals the dictionary-encoded form, incl. null/blank docs") {
    val train = Seq((1L, "spark scala spark plans")).toDF("doc_id", "text")
    val v = Unigram.trainFrozen(train, "text", topK = 32)
    val docs = Seq(
      (1L, "spark spark scala"), (2L, "plans λ unknown"), (3L, "   "),
      (4L, null: String)).toDF("doc_id", "text")
    val a = Unigram.tokenStats(docs, "doc_id", "text", v)
      .orderBy("doc_id").collect().toSeq
    val b = Unigram.tokenStatsMapOnly(docs, "doc_id", "text", v)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("perplexity: NLL sums Viterbi piece scores, UNK charges the OOV penalty, buckets split") {
    // hand vocab: "ab" -> -2, "a" -> -3, "b" -> -4 (+ chars). Doc A
    // "ab ab" → pieces [ab][ab], nll = 4, np = 2, avg = 2.
    // Doc B "a b" → [a][b], nll = 7, np = 2, avg = floor(7/2) = 3.
    // Doc C "az" → z uncovered → [UNK], nll = 10 (penalty), avg = 10.
    // Doc D "" → unscored.
    val v = Unigram.Vocab(Seq("ab" -> -2L, "a" -> -3L, "b" -> -4L))
    val docs = Seq(
      (1L, "ab ab"), (2L, "a b"), (3L, "az"), (4L, ""))
      .toDF("doc_id", "text")
    val got = Unigram.perplexity(docs, "doc_id", "text", v,
      unkScoreFp = -10L, headBelowFp = 3L, midBelowFp = 5L)
      .as[(Long, Long, Long, Option[Long], String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === ((2L, 4L, Some(2L), "head")))   // avg 2 < 3
    assert(got(2L) === ((2L, 7L, Some(3L), "middle"))) // 3 in [3, 5)
    assert(got(3L) === ((1L, 10L, Some(10L), "tail"))) // 10 >= 5
    assert(got(4L) === ((0L, 0L, None, "unscored")))
    // boundary: avg exactly at midBelowFp is tail (strict <)
    val b = Unigram.perplexity(
      Seq((9L, "b")).toDF("doc_id", "text"), "doc_id", "text", v,
      unkScoreFp = -10L, headBelowFp = 2L, midBelowFp = 4L)
      .select("ppl_bucket").as[String].head()
    assert(b === "tail") // avg 4, strict < 4 fails
  }

  test("vocabulary artifact round-trips and tokenizes identically") {
    val docs = Seq((1L, "spark catalyst tungsten spark"))
      .toDF("doc_id", "text")
    val v = Unigram.trainFrozen(docs, "text", topK = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ug_").toString
    Unigram.saveVocab(spark, v, dir)
    val back = Unigram.loadVocab(spark, dir)
    assert(back === v)
    val a = Unigram.tokenStats(docs, "doc_id", "text", v).collect().toSeq
    val b = Unigram.tokenStats(docs, "doc_id", "text", back).collect().toSeq
    assert(a === b)
  }
}
