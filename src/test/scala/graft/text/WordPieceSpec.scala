package graft.text

import graft.SparkSpec
import graft.functions.WordPieceKernel
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val singles = ('a' to 'z').map(_.toString)

  private def kernel(i: Seq[String], c: Seq[String]) =
    new WordPieceKernel(i.toArray, c.toArray,
      WordPiece.MaxInitLen, WordPiece.MaxContLen)

  private def enc(k: WordPieceKernel, w: String): Seq[String] =
    k.encode(org.apache.spark.unsafe.types.UTF8String.fromString(w))
      .array.map(_.toString).toSeq

  test("greedy longest-match with role-split vocabularies") {
    val k = kernel(Seq("a", "b", "c", "ab", "abc"), Seq("a", "b", "c", "bc"))
    assert(enc(k, "abcabc") === Seq("abc", "##a", "##bc"))
    // init prefers the longest initial piece even when shorter exists
    assert(enc(k, "abc") === Seq("abc"))
    assert(enc(k, "a") === Seq("a"))
    // continuation role: "ab" is initial-only, so pos>0 matches "a"
    assert(enc(k, "cab") === Seq("c", "##a", "##b"))
  }

  test("unmatchable position collapses the whole word to [UNK]") {
    val k = kernel(Seq("a", "b", "ab"), Seq("a", "b"))
    assert(enc(k, "abd") === Seq("[UNK]"))
    assert(enc(k, "dab") === Seq("[UNK]"))
    assert(enc(k, "ab") === Seq("ab"))
  }

  test("kernel matches a naive reference on random words") {
    val iv = singles ++ Seq("th", "the", "ing", "qu", "ab", "abc")
    val cv = singles ++ Seq("ing", "ed", "er", "bc")
    val k = kernel(iv, cv)
    val iSet = iv.toSet
    val cSet = cv.toSet
    def naive(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val init = pos == 0
        val max = math.min(
          if (init) WordPiece.MaxInitLen else WordPiece.MaxContLen,
          w.length - pos)
        val hit = (max to 1 by -1).map(l => w.substring(pos, pos + l))
          .find(p => if (init) iSet(p) else cSet(p))
        hit match {
          case None => return Seq("[UNK]")
          case Some(p) =>
            out += (if (init) p else "##" + p)
            pos += p.length
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      assert(enc(k, w) === naive(w), s"word $w")
    }
  }

  test("multi-byte codepoints index like DuckDB substr") {
    val k = kernel(Seq("д", "о", "м", "до"), Seq("о", "м", "ом"))
    assert(enc(k, "дом") === Seq("до", "##м"))
    assert(enc(k, "мом") === Seq("м", "##ом"))
  }

  test("trainFrozen derives singles plus frequency-ranked pieces") {
    val docs = Seq(
      (0L, "the then the"),
      (2L, "then there"),
      (4L, "xyz")).toDF("doc_id", "text")
    val v = WordPiece.trainFrozen(docs, "text", topK = 3)
    for (ch <- Seq("t", "h", "e", "n", "r", "x", "y", "z")) {
      assert(v.initial.contains(ch), s"single $ch in initial")
      assert(v.cont.contains(ch), s"single $ch in cont")
    }
    // prefix weights: "th" appears in every word of freq 2+1+1... the
    // top-3 initial multi pieces are the highest-weight prefixes
    assert(v.initial.contains("th"))
    // interior pieces come from positions >= 2 only: "he" (weight 5)
    // ranks in, word-initial "th" never appears as a continuation
    assert(v.cont.contains("he"))
    assert(!v.cont.contains("th"))
    // deterministic: same input -> same vocab
    val v2 = WordPiece.trainFrozen(docs, "text", topK = 3)
    assert(v === v2)
  }

  test("tokenStats totals and hash on a hand fixture") {
    val docs = Seq(
      (0L, "abc abc cab"),
      (1L, "abd"),
      (2L, " ")).toDF("doc_id", "text")
    val v = WordPiece.Vocab(
      initial = Seq("a", "b", "c", "ab", "abc").sorted,
      cont = Seq("a", "b", "c", "bc").sorted)
    val out = WordPiece.tokenStats(docs, "doc_id", "text", v)
      .orderBy("doc_id").collect()
    def h(pieces: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(("|" + pieces.mkString("|")).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16)
    }
    // doc0: abc -> [abc] (x2), cab -> [c,##a,##b]
    assert(out(0).getLong(1) === 3L) // n_words
    assert(out(0).getLong(2) === 2L * 1 + 3L) // n_pieces
    assert(out(0).getLong(3) ===
      2L * h(Seq("abc")) + h(Seq("c", "##a", "##b")))
    // doc1: abd -> [UNK] ('d' unmatchable)
    assert(out(1).getLong(1) === 1L)
    assert(out(1).getLong(2) === 1L)
    assert(out(1).getLong(3) === h(Seq("[UNK]")))
    // doc2: no words -> zeros
    assert(out(2).getLong(1) === 0L && out(2).getLong(2) === 0L &&
      out(2).getLong(3) === 0L)
  }

  test("tokenStatsMapOnly matches the dictionary-encoded form") {
    val rnd = new scala.util.Random(13)
    val docs = ((0L until 40L).map { i =>
      val words = (0 until rnd.nextInt(30))
        .map(_ => (1 to (1 + rnd.nextInt(10)))
          .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
      (i, words.mkString(" "))
    } ++ Seq((98L, null.asInstanceOf[String]), (99L, "  ")))
      .toDF("doc_id", "text")
    val v = WordPiece.trainFrozen(docs.filter(col("doc_id") % 2 === 0), "text",
      topK = 32)
    val a = WordPiece.tokenStats(docs, "doc_id", "text", v)
      .orderBy("doc_id").collect().toSeq
    val b = WordPiece.tokenStatsMapOnly(docs, "doc_id", "text", v)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("coverageReport counts occurrence-weighted UNK words per source") {
    val docs = Seq(("web", "ab ab cd"), ("web", "zz"), ("books", "ab"))
      .toDF("source", "text")
    val v = WordPiece.Vocab(
      initial = Seq("a", "b", "c", "d", "ab", "cd").sorted,
      cont = Seq("a", "b", "c", "d").sorted)
    val got = WordPiece.coverageReport(docs, "source", "text", v)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // web: ab ab cd zz → 4 words, zz is UNK (1 piece), ab/cd one piece
    assert(got("web") === (("web", 4L, 1L, 4L)))
    assert(got("books") === (("books", 1L, 0L, 1L)))
  }

  test("vocab artifact round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("wp_vocab").toString
    val v = WordPiece.Vocab(Seq("a", "ab", "b"), Seq("a", "b", "bc"))
    WordPiece.saveVocab(spark, v, s"$dir/v")
    assert(WordPiece.loadVocab(spark, s"$dir/v") === v)
  }

  test("expression evaluates under codegen over a DataFrame") {
    val v = WordPiece.Vocab(
      initial = (singles ++ Seq("ab", "abc")).sorted,
      cont = (singles ++ Seq("bc")).sorted)
    val df = (0 until 64).map(i => ("abcabc", i)).toDF("w", "i")
      .select(WordPiece.pieces(col("w"), v).as("p"))
    val rows = df.collect()
    assert(rows.forall(_.getSeq[String](0) == Seq("abc", "##a", "##bc")))
  }
}
