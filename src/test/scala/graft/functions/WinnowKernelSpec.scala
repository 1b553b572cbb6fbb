package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** [[WinnowKernel]] vs a brute-force reference of the ORIGINAL HOF
  * semantics (per-window left-to-right fold with `<=` replacement →
  * rightmost min; global `array_distinct`): the O(n) monotonic deque
  * must reproduce it exactly on randomized inputs — the kernel-level
  * twin of the DuckDB oracle gate (q230), cheap enough to sweep
  * hundreds of (text, k, w) combinations. Plus the codegen path
  * staying compiled (the NfcNormalize discipline).
  */
class WinnowKernelSpec extends SparkSpec {

  /** The HOF pipeline's semantics, transcribed literally. */
  private def reference(text: String, k: Int, w: Int): Seq[(Long, Long)] = {
    val t = UTF8String.fromString(text)
    val n = t.numChars() - (k - 1)
    if (n < 1) return Seq.empty
    val hs = (1 to n).map { i =>
      XXH64.hashUTF8String(
        UTF8String.concat(UTF8String.fromString("wfp:"),
          t.substring(i - 1, i - 1 + k)), 42L)
    }
    val lastStart = math.max(n - w + 1, 1)
    val sel = (1 to lastStart).map { s =>
      val hi = math.min(s + w - 1, n)
      var best = (Long.MaxValue, -1L)
      (s to hi).foreach { j =>
        if (hs(j - 1) <= best._1) best = (hs(j - 1), j.toLong)
      }
      best
    }
    sel.distinct
  }

  private def kernel(text: String, k: Int, w: Int): Seq[(Long, Long)] = {
    val out = WinnowKernel.select(UTF8String.fromString(text), k, w)
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2)
      (r.getLong(0), r.getLong(1))
    }
  }

  test("deque kernel == brute-force HOF semantics on randomized inputs") {
    val rnd = new scala.util.Random(4242)
    // small alphabets force hash ties and repeated grams — the
    // tie-break and dedup paths get exercised, not just the happy path
    val alphabets = Seq("ab", "abc", "abcdefgh", "the quick brown fox ")
    for (trial <- 1 to 400) {
      val alpha = alphabets(trial % alphabets.length)
      val len = rnd.nextInt(60)
      val text = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      val k = 1 + rnd.nextInt(7)
      val w = 1 + rnd.nextInt(6)
      assert(kernel(text, k, w) === reference(text, k, w),
        s"mismatch at trial $trial: text='$text' k=$k w=$w")
    }
  }

  test("WinnowSelect stays compiled with codegen fallback disabled") {
    import spark.implicits._
    val old = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val text = "the quick brown fox jumps"
      val got = Seq(text).toDF("t")
        .select(org.apache.spark.sql.functions.explode(
          WinnowExpressions.winnowSelect($"t", 5, 4)).as("s"))
        .select($"s.h", $"s.p").as[(Long, Long)].collect().toSeq
      assert(got === reference(text, 5, 4))
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("edges: empty, shorter than k, exactly k, k..k+w-1 clamped window") {
    assert(kernel("", 5, 4) === Seq.empty)
    assert(kernel("abcd", 5, 4) === Seq.empty)
    assert(kernel("abcde", 5, 4) === reference("abcde", 5, 4))
    assert(kernel("abcdef", 5, 4) === reference("abcdef", 5, 4))
    // non-ASCII chars: positions are CHARACTER positions in both
    val s = "café café déjà vu encore"
    assert(kernel(s, 5, 4) === reference(s, 5, 4))
  }
}
