package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for this library's custom Catalyst
  * expressions. Spark 4 made the converters `private[sql]`
  * (`classic.ExpressionUtils`), so the bridge lives under the sql
  * package — the established pattern for third-party expression
  * libraries. */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
