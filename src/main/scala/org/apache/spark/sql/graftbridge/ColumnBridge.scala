package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column↔Expression
  * conversions `private[sql]` (columnNodeSupport.scala); custom
  * Catalyst expressions still need them to expose a Column API, so
  * this forwarder lives under the org.apache.spark.sql package. Only
  * these two calls cross the boundary.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
