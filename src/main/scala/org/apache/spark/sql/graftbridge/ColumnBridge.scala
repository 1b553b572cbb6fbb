package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin accessor for the `private[sql]` Column↔Expression converters —
  * the supported way for third-party Catalyst expressions to surface as
  * `Column`s on Spark 4's ColumnNode-based API (the pre-4.0
  * `new Column(expr)` constructor is gone).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
