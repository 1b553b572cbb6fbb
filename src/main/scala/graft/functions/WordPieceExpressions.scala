package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece-style greedy longest-match tokenization under a FROZEN
  * vocabulary, as one codegen kernel (reference: `models/als.py` has
  * no tokenizer — pipeline surface beyond the reference; algorithm per
  * Wu et al. 2016 / the BERT tokenizer): scan the word left to right,
  * at each position emit the LONGEST vocabulary piece that matches —
  * word-initial positions match against the initial-piece vocabulary,
  * later positions against the continuation vocabulary (labelled with
  * the conventional `##` prefix in the output) — and if any position
  * matches nothing, the WHOLE word collapses to `[UNK]`.
  *
  * Same packaging rationale as [[BpeReplay]]: the vocabulary is plan
  * metadata (one broadcast-with-the-task reference object, analysis
  * cost O(1) in |vocab|), the match loop is straight-line JVM code
  * inside WholeStageCodegen, and per-word cost is O(|word| × maxLen)
  * hash probes — independent of vocabulary size, so a real 30k-piece
  * vocab costs the same as the test fixtures'.
  *
  * Vocab fields are `Seq` (not `Array`) so case-class equality — which
  * Catalyst canonicalization relies on — is structural.
  */
case class WordPieceEncode(child: Expression, initial: Seq[String],
    cont: Seq[String], maxInitLen: Int, maxContLen: Int)
    extends UnaryExpression {
  require(maxInitLen >= 1 && maxContLen >= 1, "max piece lengths must be >= 1")

  @transient private lazy val kernel =
    new WordPieceKernel(initial.toArray, cont.toArray, maxInitLen, maxContLen)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpKernel", kernel,
      classOf[WordPieceKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPieceEncode {
  /** Column form: labelled pieces of `word` (first piece bare, later
    * pieces `##`-prefixed, unmatchable words `["[UNK]"]`).
    */
  def pieces(word: Column, initial: Seq[String], cont: Seq[String],
      maxInitLen: Int, maxContLen: Int): Column =
    ColumnBridge.column(WordPieceEncode(ColumnBridge.expression(word),
      initial, cont, maxInitLen, maxContLen))
}

/** Interpreted/codegen-shared greedy matcher. Operates on CODEPOINTS
  * (`split("")` parity with [[BpeReplayKernel]] and DuckDB's
  * character-indexed `substr` — the proven-green char model of the BPE
  * oracles), so multi-byte text indexes identically in both engines.
  */
final class WordPieceKernel(initial: Array[String], cont: Array[String],
    maxInitLen: Int, maxContLen: Int) extends Serializable {

  @transient private lazy val iSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](initial.length * 2)
    initial.foreach(s.add); s
  }
  @transient private lazy val cSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](cont.length * 2)
    cont.foreach(s.add); s
  }

  private val Unk = UTF8String.fromString("[UNK]")

  def encode(word: UTF8String): GenericArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // codepoint boundary offsets: positions index CODEPOINTS (the char
    // model of BpeReplayKernel's split("") and DuckDB's substr — never
    // splits inside a surrogate pair), pieces are substring slices
    val offs = new Array[Int](s.length + 1)
    var n = 0
    var j = 0
    while (j < s.length) {
      offs(n) = j; n += 1
      j += Character.charCount(s.codePointAt(j))
    }
    offs(n) = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var pos = 0
    while (pos < n) {
      val init = pos == 0
      val set = if (init) iSet else cSet
      var l = math.min(if (init) maxInitLen else maxContLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val piece = s.substring(offs(pos), offs(pos + l))
        if (set.contains(piece)) hit = piece else l -= 1
      }
      if (hit == null) return new GenericArrayData(Array[Any](Unk))
      out += UTF8String.fromString(if (init) hit else "##" + hit)
      pos += l
    }
    new GenericArrayData(out.toArray)
  }
}
