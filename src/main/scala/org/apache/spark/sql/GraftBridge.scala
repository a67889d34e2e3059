package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.CosineSimilarity

/** Minimal bridge into `private[sql]` surface — Spark 4's Connect refactor
  * hid `ExpressionUtils` and `sessionState`; wrapping a custom Catalyst
  * expression into a `Column` (and registering it on a live session)
  * requires being inside the sql package (the standard pattern for
  * Spark-native extension libraries). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register graft's SQL functions on an already-created session (the
    * config-time path is `spark.sql.extensions=graft.GraftExtensions`). */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))
  }
}
