package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column ⇄ Catalyst Expression converters,
  * which are `private[sql]` in Spark 4 (the Column API is backed by
  * ColumnNode; `ExpressionUtils` does the conversion). Needed to use
  * internal codegen'd expressions that have no public `functions._` or
  * FunctionRegistry surface — e.g. `BloomFilterMightContain`, whose
  * only upstream consumer is the optimizer's runtime-filter injection
  * — and the engine's own expressions (graft.functions.FrameAggExpr).
  * Kept to exactly these two converters; the serving-template
  * internals live in [[org.apache.spark.sql.GraftServe]].
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
