package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column↔Expression
  * conversions `private[sql]` (columnNodeSupport.scala); custom
  * Catalyst expressions still need them to expose a Column API, so
  * this forwarder lives under the org.apache.spark.sql package. Only
  * these calls cross the boundary.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** LAZY lowering: wraps the Column's node tree; fine as input to
    * DataFrame operators (analysis converts it), but NOT inside a
    * FunctionRegistry builder — the wrapper is Unevaluable and
    * survives to codegen there. Use [[resolvedExpression]] in that
    * case. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER lowering through the session's ColumnNode converter:
    * returns a plain catalyst tree (function names as
    * UnresolvedFunction, resolved by the analyzer in place). */
  def resolvedExpression(spark: org.apache.spark.sql.SparkSession,
      c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .expression(c)
}
