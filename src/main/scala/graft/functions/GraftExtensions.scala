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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.specs.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private[functions] val specs: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    specs.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
