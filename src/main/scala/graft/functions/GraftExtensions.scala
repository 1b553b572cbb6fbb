package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` (cluster
  *    config / `SparkSession.builder().withExtensions`);
  *  - [[GraftFunctions.register]] for an existing session.
  *
  * After either, `spark.sql("SELECT graft_dot(a, b)")` and
  * `graft_cosine(a, b)` plan to the codegen'd Catalyst expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.specs.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // the collapse-barrier planner (graft.plans.ProjectBarrier)
    ext.injectPlannerStrategy(_ => graft.plans.BarrierStrategy)
  }
}

object GraftFunctions {

  /** PQ kernel shape parameters (m, ks) arrive as SQL literal
    * arguments; they parameterize generated code, so they must fold at
    * plan time.
    */
  private def intArg(e: Expression, name: String): Int = {
    require(e.foldable, s"$name: argument must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long =>
        require(l.isValidInt, s"$name: $l out of Int range")
        l.toInt
      case other => throw new IllegalArgumentException(
        s"$name: expected integer literal, got $other")
    }
  }

  private def arity(es: Seq[Expression], n: Int, name: String): Seq[Expression] = {
    require(es.length == n, s"$name expects $n arguments, got ${es.length}")
    es
  }

  private[functions] val specs: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    ("graft_pq_encode",
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (es0: Seq[Expression]) => { val es = arity(es0, 4, "graft_pq_encode")
        PqEncode(es(0), es(1),
          intArg(es(2), "graft_pq_encode(m)"), intArg(es(3), "graft_pq_encode(ks)")) }),
    ("graft_pq_adc_table",
      new ExpressionInfo(classOf[PqAdcTable].getName, "graft_pq_adc_table"),
      (es0: Seq[Expression]) => { val es = arity(es0, 4, "graft_pq_adc_table")
        PqAdcTable(es(0), es(1),
          intArg(es(2), "graft_pq_adc_table(m)"), intArg(es(3), "graft_pq_adc_table(ks)")) }),
    ("graft_pq_adc_score",
      new ExpressionInfo(classOf[PqAdcScore].getName, "graft_pq_adc_score"),
      (es0: Seq[Expression]) => { val es = arity(es0, 3, "graft_pq_adc_score")
        PqAdcScore(es(0), es(1), intArg(es(2), "graft_pq_adc_score(ks)")) }),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (es0: Seq[Expression]) => { val es = arity(es0, 2, "graft_minhash")
        MinHashSig(es(0), intArg(es(1), "graft_minhash(numPerm)")) }),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhash"),
      (es0: Seq[Expression]) => { val es = arity(es0, 1, "graft_simhash")
        SimHashSig(es(0)) }),
    ("graft_repetition",
      new ExpressionInfo(classOf[RepetitionCounts].getName, "graft_repetition"),
      (es0: Seq[Expression]) => { val es = arity(es0, 1, "graft_repetition")
        RepetitionCounts(es(0)) }),
    ("graft_nfc",
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (es0: Seq[Expression]) => { val es = arity(es0, 1, "graft_nfc")
        NfcNormalize(es(0)) }))

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    specs.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
