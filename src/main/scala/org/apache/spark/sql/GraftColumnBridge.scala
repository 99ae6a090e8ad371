package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters of Spark 4
  * (pre-4.0 code used `new Column(expr)` / `col.expr` directly; the classic
  * module hides them behind ExpressionUtils now). Needed to expose custom
  * Catalyst expressions (graft.functions) as user-facing Columns. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
