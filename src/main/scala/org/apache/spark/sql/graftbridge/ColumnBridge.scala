package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters, needed
  * to expose custom Catalyst Expressions through the public Column API
  * (Spark 4 removed the public `new Column(expr)` constructor). Lives under
  * the org.apache.spark.sql package tree solely for access; contains no
  * Spark internals of its own. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
