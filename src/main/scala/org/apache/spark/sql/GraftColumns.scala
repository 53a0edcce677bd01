package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API: Spark 4 routes Column through ColumnNodes and keeps the
  * Expression constructors `private[sql]`, so the engine's native
  * expressions (e.g. [[graft.functions.FrameAggExpr]]) convert here.
  * Standard extension-library idiom — no Spark internals are modified,
  * only the sanctioned ExpressionColumnNode wrapping is exposed.
  */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
