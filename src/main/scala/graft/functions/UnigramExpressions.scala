package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style, Kudo 2018) tokenization under a
  * FROZEN integer-scored vocabulary, as one codegen kernel: exact
  * Viterbi over the word's codepoints maximizing the SUM of piece
  * scores (scores are fixed-point longs — `floor(ln(p)·10⁶)` derived
  * at train time — so the DP compares exact integers and the chosen
  * segmentation replays bit-identically cross-engine, unlike the
  * float log-prob DP of the reference implementations). Deterministic
  * tie-break: equal path scores prefer the LONGER piece ending at the
  * position (SQL replay: `ORDER BY best DESC, l DESC`). A position
  * whose character matches no piece makes the word unreachable → the
  * whole word collapses to `[UNK]` (the WordPiece convention).
  *
  * Packaging per [[WordPieceEncode]]: the scored vocabulary is plan
  * metadata (one reference object, analysis cost O(1) in |vocab|);
  * per-word cost is O(|word| × maxPieceLen) hash probes.
  */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Long)],
    maxPieceLen: Int) extends UnaryExpression {
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
  require(pieces.nonEmpty, "vocabulary must be non-empty")

  @transient private lazy val kernel =
    new UnigramKernel(pieces.map(_._1).toArray, pieces.map(_._2).toArray,
      maxPieceLen)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugKernel", kernel,
      classOf[UnigramKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {
  /** Column form: Viterbi-optimal pieces of `word` (unreachable words
    * `["[UNK]"]`, empty words `[]`).
    */
  def pieces(word: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int): Column =
    ColumnBridge.column(UnigramEncode(ColumnBridge.expression(word),
      vocab, maxPieceLen))
}

/** Interpreted/codegen-shared Viterbi matcher. Codepoint-indexed like
  * [[WordPieceKernel]] (parity with DuckDB's character `substr`).
  */
final class UnigramKernel(pieceArr: Array[String], scoreArr: Array[Long],
    maxPieceLen: Int) extends Serializable {

  @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieceArr.length * 2)
    var i = 0
    while (i < pieceArr.length) { m.put(pieceArr(i), scoreArr(i)); i += 1 }
    m
  }

  private val Unk = UTF8String.fromString("[UNK]")
  // any real path score is far above this (scores are ≥ ln(1/Σw)·1e6
  // per piece over ≤ WordCap pieces); used as the unreachable marker
  private val Neg = java.lang.Long.MIN_VALUE / 4

  def encode(word: UTF8String): GenericArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](s.length + 1)
    var n = 0
    var j = 0
    while (j < s.length) {
      offs(n) = j; n += 1
      j += Character.charCount(s.codePointAt(j))
    }
    offs(n) = s.length
    val best = new Array[Long](n + 1)
    val bl = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Neg)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      // l descending: on equal path scores the LONGEST piece wins
      // (strict > keeps the first maximum seen)
      var l = math.min(maxPieceLen, i)
      while (l >= 1) {
        if (best(i - l) > Neg) {
          val sc = scores.get(s.substring(offs(i - l), offs(i)))
          if (sc != null) {
            val cand = best(i - l) + sc.longValue()
            if (cand > best(i)) { best(i) = cand; bl(i) = l }
          }
        }
        l -= 1
      }
      i += 1
    }
    if (best(n) <= Neg) return new GenericArrayData(Array[Any](Unk))
    // backtrack; pieces come out reversed, then flip in place
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var cur = n
    while (cur > 0) {
      val l = bl(cur)
      out += UTF8String.fromString(s.substring(offs(cur - l), offs(cur)))
      cur -= l
    }
    val arr = out.toArray
    var a = 0
    var b = arr.length - 1
    while (a < b) { val t = arr(a); arr(a) = arr(b); arr(b) = t; a += 1; b -= 1 }
    new GenericArrayData(arr)
  }
}
