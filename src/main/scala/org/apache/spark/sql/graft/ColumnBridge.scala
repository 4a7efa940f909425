package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed public Column <-> Expression conversion (Column moved to
  * sql-api, backed by ColumnNode); the supported path,
  * `classic.ExpressionUtils`, is private[sql]. This bridge lives in the
  * org.apache.spark.sql namespace solely to re-export those two
  * conversions for graft's native expressions.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
