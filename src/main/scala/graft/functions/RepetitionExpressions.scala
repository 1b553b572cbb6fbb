package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document repetition counters — the Gopher/C4-family
  * "repetitious document" quality signals (most-frequent-word share,
  * duplicate-word mass, most-frequent-bigram share) that gate LLM
  * training corpora before any expensive processing.
  *
  * The relational formulation (explode words → two groupBys → max) pays
  * an explode blow-up plus two shuffles *per metric*; but every metric
  * is a scalar function of one document's word array, so this computes
  * all counters in one open-addressing pass at the scan — map-only, no
  * shuffle, stays inside WholeStageCodegen via a static kernel call.
  * At 100 TB this is the difference between a pure scan and three
  * corpus-sized shuffles.
  *
  * Counters (all exact integers; callers derive ratios with one
  * division so cross-engine float drift cannot accumulate):
  *   - `n_words`     — total words
  *   - `n_distinct`  — distinct words
  *   - `top_word`    — occurrences of the most frequent word
  *   - `top_bigram`  — occurrences of the most frequent adjacent pair
  *                     (of the n-1 overlapping bigrams)
  *
  * Empty word arrays yield NULL (no words → no ratios; mirrors
  * MinHashSig's empty-doc contract).
  */
case class RepetitionCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_word", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    RepetitionKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.RepetitionKernel.compute($a);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
    copy(child = newChild)
}

/** Interpreted/codegen-shared kernel for [[RepetitionCounts]]. A plain
  * JVM HashMap beats any per-row generated open addressing here: the
  * map is small (distinct words per doc), escape analysis keeps the
  * boxing cheap, and the static call keeps the operator inside the
  * whole-stage-generated loop.
  */
object RepetitionKernel {

  def compute(words: ArrayData): InternalRow = {
    val n = words.numElements()
    if (n == 0) return null
    val wordCounts = new java.util.HashMap[UTF8String, Int](n * 2)
    val bigramCounts = new java.util.HashMap[Long, Int](n * 2)
    var topWord = 0
    var topBigram = 0
    var prevHash = 0L
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      val c = wordCounts.merge(w, 1, (a, b) => a + b)
      if (c > topWord) topWord = c
      // Bigram identity via a 128->64-bit mix of the two word hashes;
      // collisions only inflate a *count* of an already-counted pair and
      // need both 64-bit mixes equal within one doc — vanishing odds,
      // and the metric is a heuristic threshold, not an exact key.
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(w, 42L)
      if (i > 0) {
        val bg = prevHash * 0x9E3779B97F4A7C15L + h
        val cb = bigramCounts.merge(bg, 1, (a, b) => a + b)
        if (cb > topBigram) topBigram = cb
      }
      prevHash = h
      i += 1
    }
    new GenericInternalRow(Array[Any](n, wordCounts.size(), topWord, topBigram))
  }
}

object RepetitionExpressions {

  /** Codegen'd repetition counters of an ARRAY<STRING> word column. */
  def repetitionCounts(words: Column): Column =
    ColumnBridge.column(RepetitionCounts(ColumnBridge.expression(words)))
}
