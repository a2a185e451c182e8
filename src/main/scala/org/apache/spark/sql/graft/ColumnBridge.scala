package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard extension-library pattern for constructing a Column around a
  * custom Catalyst expression that cannot go through the SQL function
  * registry (here: [[graft.functions.BloomMightContainExpr]], whose
  * broadcast handle has no SQL-text spelling). Lives under
  * `org.apache.spark.sql` solely for access; contains no Spark code. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
