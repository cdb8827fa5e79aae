package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Expression converters —
  * the supported pattern for libraries that add native Catalyst
  * expressions on Spark 4 (where `new Column(expr)` is no longer
  * public). Lives under org.apache.spark.sql to satisfy the package-
  * private access; keep it to these two calls.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
