package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge replay as ONE codegen expression (reference:
  * `models/als.py` has no tokenizer — this is pipeline surface beyond
  * the reference): encode a word by replaying the trained merge list
  * in training order, each merge a greedy left-to-right
  * non-reentrant pass — exactly [[graft.text.Bpe.applyMerge]]'s fold
  * semantics, moved from a per-merge chained Catalyst `aggregate`
  * into a flat JVM loop behind a static kernel call.
  *
  * Why: the column-fold form ([[graft.text.Bpe.applyMerges]]) builds
  * an expression tree O(|merges|) deep — at a real tokenizer's 32k
  * merges Catalyst ANALYSIS chokes long before execution, and each
  * interpreted `aggregate` re-enters the HOF machinery per element.
  * Here the merge table is plan metadata (one broadcast-with-the-task
  * reference object), analysis cost is O(1) in |merges|, the replay
  * loop is O(|merges| × |word|) straight-line JVM code, and the call
  * stays inside WholeStageCodegen like the other kernels in this
  * package ([[RepetitionKernel]]).
  *
  * Merge lists are `Seq` (not `Array`) fields so case-class equality
  * — which Catalyst canonicalization relies on — is structural.
  */
case class BpeReplay(child: Expression, lhs: Seq[String], rhs: Seq[String])
    extends UnaryExpression {
  require(lhs.length == rhs.length, "lhs/rhs merge columns must align")

  @transient private lazy val kernel =
    new BpeReplayKernel(lhs.toArray, rhs.toArray)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    kernel.replay(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel,
      classOf[BpeReplayKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.replay($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeReplay =
    copy(child = newChild)
}

object BpeReplay {
  /** Column form: symbols of `word` under the trained merges (training
    * order). For a word the trainer saw, this equals its trained
    * decomposition (replay is the same composition of passes training
    * performed); for OOV words it is the real tokenizer's encoding.
    */
  def replaySymbols(word: Column, lhs: Seq[String], rhs: Seq[String]): Column =
    ColumnBridge.column(BpeReplay(ColumnBridge.expression(word), lhs, rhs))
}

/** Interpreted/codegen-shared replay kernel. One `String[]` pass per
  * merge, early exit once the word is a single symbol; a merged pair
  * is consumed and does not re-merge within its pass ("aaa" + (a,a) →
  * ["aa","a"]) — byte-parity with [[graft.text.Bpe.applyMerge]],
  * property-tested in BpeSpec.
  */
final class BpeReplayKernel(lhs: Array[String], rhs: Array[String])
    extends Serializable {

  def replay(word: UTF8String): GenericArrayData = {
    // split("") parity with the trainer's `split(col("word"), "")`
    var syms: Array[String] = word.toString.split("")
    var k = 0
    while (k < lhs.length && syms.length > 1) {
      syms = onePass(syms, lhs(k), rhs(k))
      k += 1
    }
    val out = new Array[Any](syms.length)
    var i = 0
    while (i < syms.length) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }

  private def onePass(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new Array[String](syms.length)
    var n = 0
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out(n) = l + r; n += 1; i += 2
      } else {
        out(n) = syms(i); n += 1; i += 1
      }
    }
    if (n == syms.length) syms else java.util.Arrays.copyOf(out, n)
  }
}
