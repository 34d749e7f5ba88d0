package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made Column↔Expression conversion (`classic.ExpressionUtils`)
  * private[sql]; this bridge re-exports the two calls graft's custom
  * Catalyst expressions need to surface as Columns. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
