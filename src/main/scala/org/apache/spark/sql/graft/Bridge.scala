package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4 made the converters
  * `private[sql]` (Column wraps a ColumnNode, not an Expression), so
  * custom Catalyst expressions need this one-hop package-escalation —
  * the same pattern Spark extension libraries use. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
