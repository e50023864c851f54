package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge — `classic.ExpressionUtils` is private[sql]
  * in Spark 4, so custom-Expression libraries expose it from inside the
  * package namespace (standard extension-library pattern).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
