package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters so graft's
  * native Catalyst expressions ([[graft.functions.MinHashSigs]] etc.) can
  * be used from the DataFrame DSL without registering a session function
  * per coefficient set. Classic (non-Connect) sessions only — which is the
  * only mode this engine targets.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
