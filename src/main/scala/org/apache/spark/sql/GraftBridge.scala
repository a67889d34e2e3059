package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression conversion —
  * Spark 4's Connect refactor hid `ExpressionUtils`; wrapping a custom
  * Catalyst expression into a `Column` requires being inside the sql
  * package (the standard pattern for Spark-native extension libraries). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
