package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Tiny bridge into the package-private Column<->Expression converters of the
  * classic backend (the standard pattern for third-party Catalyst
  * extensions on Spark 4.x). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
