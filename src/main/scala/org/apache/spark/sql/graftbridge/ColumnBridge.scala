package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split Column from Expression (ColumnNode API); the
  * converters live in `private[sql]` ExpressionUtils. This shim sits
  * inside the org.apache.spark.sql package purely to re-export them to
  * graft's custom-Expression code — the standard extension-library
  * pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
