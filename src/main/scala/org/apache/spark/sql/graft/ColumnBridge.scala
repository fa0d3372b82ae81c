package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst [[Expression]] to a user-facing [[Column]].
  *
  * Spark 4 made `Column` backend-agnostic (ColumnNode), so the classic
  * `new Column(expr)` constructor is gone; the supported conversion,
  * `classic.ExpressionUtils.column`, is `private[sql]` — hence this shim
  * lives under `org.apache.spark.sql`. This is the standard extension
  * idiom for libraries shipping custom codegen expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
