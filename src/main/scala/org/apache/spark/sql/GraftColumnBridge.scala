package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and catalyst Expressions for
  * graft's custom expressions. Spark 4 moved Column onto ColumnNode and
  * made the Expression constructors private[sql]; extension libraries
  * access them via a same-package shim (a widely used public pattern for
  * Spark-native extension projects).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
