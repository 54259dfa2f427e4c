/*
 * Lives in org.apache.spark.sql because the Spark 4 "classic" Column ⇄
 * catalyst Expression bridge (ExpressionColumnNode / ColumnConversions) is
 * private[sql]. This is the only sanctioned way for a library to expose a
 * custom Catalyst Expression as a user-facing Column without going through
 * FunctionRegistry; everything else of ours stays in the graft namespace.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

object GraftBridge {
  def columnOf(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expressionOf(c: Column): Expression = ColumnConversions.expression(c)
}
