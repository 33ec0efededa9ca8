package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x removed the public Column(Expression) constructor; the
  * supported conversion lives in `private[sql]` ExpressionUtils. This
  * bridge (inside the sql package namespace, the standard extension
  * pattern) exposes exactly the two conversions our custom expressions
  * need. */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
