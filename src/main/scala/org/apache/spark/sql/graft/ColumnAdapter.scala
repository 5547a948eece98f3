package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 routes Column through ColumnNode (the Connect-compatible
  * representation); the classic converter lives behind `private[sql]`
  * `ExpressionUtils` (sql/core columnNodeSupport.scala), so the package
  * of this one file opts into that scope — the standard technique for
  * libraries that ship custom Catalyst expressions without a
  * SparkSessionExtensions registration step.
  */
object ColumnAdapter {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic converter). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
