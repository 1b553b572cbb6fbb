package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Whole-signature MinHash as ONE codegen'd expression.
  *
  * The relational formulation (explode shingles → xxhash64 → per-doc
  * elementwise-min UDAF) is the right *distributed* shape when the
  * signature must be an aggregation, but it pays explode row blow-up, a
  * hash-aggregate probe per shingle, and a shuffle. A document's
  * signature is really a scalar function of its shingle array —
  * `sig[j] = min over shingles of ((xxh64(s) & M) · a_j + b_j) & M` —
  * so this expression computes all `numPerm` mins in a tight generated
  * loop at the scan, no explode, no aggregation, no shuffle at all.
  *
  * Exact-parity contract with [[graft.recommender.MinHashAgg]] /
  * `Dedup.minHashSignature`: same 31-bit mask (ANSI-safe products),
  * same affine constants, same xxhash64 seed (42, Spark's default).
  * Empty shingle arrays yield NULL (the aggregate formulation simply
  * has no row for them) so empty docs never band-collide with each
  * other.
  */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private val mask = (1L << 31) - 1L
  private lazy val as: Array[Long] =
    Array.tabulate(numPerm)(j => ((j * 0x9E3779B1L) & mask) | 1L)
  private lazy val bs: Array[Long] =
    Array.tabulate(numPerm)(j => (j * 0x85EBCA77L + 0xC2B2AE3DL) & mask)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L) & mask
      var j = 0
      while (j < numPerm) {
        val x = (h * as(j) + bs(j)) & mask
        if (x < mins(j)) mins(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numPerm];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($a.getUTF8String($i), 42L) & ${mask}L;
         |    for (int $j = 0; $j < $numPerm; $j++) {
         |      long $x = ($h * $aRef[$j] + $bRef[$j]) & ${mask}L;
         |      if ($x < $mins[$j]) $mins[$j] = $x;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Fused words→MinHash-signature expression: computes the signature of
  * a document's k-word shingles DIRECTLY from the words array — no
  * shingle strings are ever materialized as column values. The HOF
  * pipeline (`transform`+`slice`+`concat_ws`+`array_distinct` → kernel)
  * allocates one string and several arrays per shingle per row before
  * hashing; this kernel joins each window's word bytes into one
  * REUSABLE buffer and hashes it in place. Signatures are
  * BIT-IDENTICAL to the staged pipeline (same " "-joined bytes, same
  * xxh64 seed, same affine permutations — parity property in
  * MinHashSpec; `array_distinct` is dropped because duplicate shingles
  * cannot change a minimum). NULL when the doc has fewer than k words
  * (the staged pipeline's empty-shingles filter).
  */
case class MinHashWords(child: Expression, k: Int, numPerm: Int)
    extends UnaryExpression {
  require(k >= 1 && numPerm >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private val mask = (1L << 31) - 1L
  private lazy val as: Array[Long] =
    Array.tabulate(numPerm)(j => ((j * 0x9E3779B1L) & mask) | 1L)
  private lazy val bs: Array[Long] =
    Array.tabulate(numPerm)(j => (j * 0x85EBCA77L + 0xC2B2AE3DL) & mask)

  @transient private lazy val kernel = new MinHashWordsKernel(k, as, bs)

  override protected def nullSafeEval(input: Any): Any =
    kernel.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("minhashWordsKernel", kernel,
        classOf[MinHashWordsKernel].getName)
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.sig($a);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    (org.apache.spark.sql.catalyst.util.GenericArrayData) $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashWords =
    copy(child = newChild)
}

/** Interpreted/codegen-shared fused minhash kernel. */
final class MinHashWordsKernel(k: Int, as: Array[Long], bs: Array[Long])
    extends Serializable {
  private val mask = (1L << 31) - 1L

  def sig(words: ArrayData): GenericArrayData = {
    val n = words.numElements()
    if (n < k) return null
    val numPerm = as.length
    // word byte snapshots (UTF8String.getBytes may return the backing
    // array — read-only here) + the widest window for the join buffer
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { wb(i) = words.getUTF8String(i).getBytes; i += 1 }
    var maxLen = 0
    i = 0
    while (i <= n - k) {
      var len = k - 1
      var j = i
      while (j < i + k) { len += wb(j).length; j += 1 }
      if (len > maxLen) maxLen = len
      i += 1
    }
    val buf = new Array[Byte](maxLen)
    val mins = Array.fill(numPerm)(Long.MaxValue)
    i = 0
    while (i <= n - k) {
      var off = 0
      var j = i
      while (j < i + k) {
        if (j > i) { buf(off) = ' '; off += 1 }
        val b = wb(j)
        System.arraycopy(b, 0, buf, off, b.length)
        off += b.length
        j += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, off, 42L) & mask
      var p = 0
      while (p < numPerm) {
        val x = (h * as(p) + bs(p)) & mask
        if (x < mins(p)) mins(p) = x
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash of a word array as ONE codegen'd expression.
  *
  * Parity contract with `Dedup.simHashFromHashes`: bit b of the
  * signature is set iff Σ_words (bit b of xxh64(word) ? +1 : -1) > 0.
  * The HOF formulation builds a 64-element array per word and reduces
  * interpreted; this is a words×64 tight loop at the scan. Empty word
  * arrays yield NULL (the explode+aggregate form has no row for them).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val bits = new Array[Long](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        bits(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (bits(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val bits = ctx.freshName("bits")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $bits = new long[64];
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $bits[$b] += ((($h >>> $b) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($bits[$b] > 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object MinHashExpressions {

  /** Codegen'd MinHash signature of an ARRAY<STRING> shingle column. */
  def minhashSig(shingles: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numPerm))

  /** Fused words→signature form (no shingle materialization). */
  def minhashWords(words: Column, k: Int, numPerm: Int): Column =
    ColumnBridge.column(
      MinHashWords(ColumnBridge.expression(words), k, numPerm))

  /** Codegen'd 64-bit SimHash of an ARRAY<STRING> word column. */
  def simhashSig(words: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(words)))
}
