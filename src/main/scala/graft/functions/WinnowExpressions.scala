package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken 2003) as
  * a native codegen kernel: per window of `w` consecutive k-gram
  * hashes, the RIGHTMOST minimal hash, deduplicated — the array of
  * `(h, p)` structs the HOF pipeline in
  * [[graft.text.TextAnalysis.winnowFingerprints]] used to build.
  *
  * Why native: the HOF formulation re-folds each window from scratch —
  * O(n·w) interpreted lambda steps per document (and it needed a
  * `PlanBarrier` to stop CollapseProject making it O(n²·w)). This
  * kernel computes the same selection with a monotonic deque in ONE
  * O(n) pass of tight JVM code — measured ~20× on the sf0.1 corpus —
  * and `doGenCode` keeps it inside the whole-stage-generated loop.
  *
  * Exact-parity contract (the DuckDB oracle depends on it): gram hash
  * = Spark's `xxhash64('wfp:' || substr(t, i, k))` (seed 42, UTF-8
  * bytes — [[XXH64.hashUTF8String]], the MinHashSig precedent); window
  * tie-break = rightmost (the fold's `hj <= acc.h` replacement);
  * dedup = `array_distinct` (selections are monotone non-decreasing in
  * the window start — the winnowing self-synchronization property — so
  * distinct-by-last-emitted is exactly global distinct); docs shorter
  * than k chars yield an EMPTY array (the HOF's `n >= 1` guard).
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  require(w >= 1, s"w must be >= 1, got $w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("p", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"WinnowSelect requires STRING, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.WinnowKernel.select($s, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

/** Interpreted/codegen-shared kernel for [[WinnowSelect]]. */
object WinnowKernel {

  private val Prefix = UTF8String.fromString("wfp:")

  def select(t: UTF8String, k: Int, w: Int): ArrayData = {
    val len = t.numChars()
    val n = len - (k - 1)
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    // k-gram hashes, 1-based positions (the oracle's coordinate space)
    val hs = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      hs(i) = XXH64.hashUTF8String(
        UTF8String.concat(Prefix, t.substring(i - 1, i - 1 + k)), 42L)
      i += 1
    }
    // sliding rightmost-min via a monotonic deque: positions with
    // strictly increasing hash front→back; a new hash pops every tail
    // >= itself (ties resolve to the later position — the fold's
    // `<=` replacement rule)
    val lastStart = math.max(n - w + 1, 1)
    val dq = new Array[Int](n + 1)
    var head = 0
    var tail = 0
    val out = new java.util.ArrayList[InternalRow]()
    var lastSel = -1
    var j = 1
    var s = 1
    while (s <= lastStart) {
      val hi = math.min(s + w - 1, n)
      while (j <= hi) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j
        tail += 1
        j += 1
      }
      while (dq(head) < s) head += 1
      val sel = dq(head)
      if (sel != lastSel) {
        out.add(InternalRow(hs(sel), sel.toLong))
        lastSel = sel
      }
      s += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object WinnowExpressions {

  /** The winnow selection of a (already normalized) text column as
    * `array<struct<h: bigint, p: bigint>>` (codegen kernel; NULL
    * passes through, sub-k-length text yields an empty array).
    */
  def winnowSelect(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(c), k, w))
}
