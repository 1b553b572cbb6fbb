package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a native codegen kernel —
  * the first cleanup pass of a crawl pipeline: the same user-visible
  * text arrives from the web in composed (`é` = U+00E9) and decomposed
  * (`e` + U+0301) byte forms, and every downstream content key
  * (fingerprints, dedup lines, shingles, tokenizer merges) silently
  * treats them as different documents unless the corpus is normalized
  * first. Spark ships no normalizer; a Scala UDF would break
  * whole-stage codegen on the hottest map pass in the pipeline, so
  * this is a [[UnaryExpression]] with `doGenCode` — one static kernel
  * call, stays inside the generated loop (the RepetitionCounts
  * pattern).
  *
  * The kernel is the JDK's `java.text.Normalizer` (Unicode-conformant
  * NFC); DuckDB's `nfc_normalize` implements the same standard, so the
  * normalized corpus hash-gates cross-engine (q237). Cost: NFC
  * quick-check inside the JDK makes already-composed (e.g. pure ASCII)
  * text a near-no-op scan; only strings that actually recompose pay
  * the rebuild.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"NfcNormalize requires STRING, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    UnicodeKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UnicodeKernel.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Interpreted/codegen-shared kernel for [[NfcNormalize]]. */
object UnicodeKernel {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object UnicodeExpressions {

  /** NFC-normalize a string column (codegen kernel; NULL passes through). */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
