package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.CosineSimilarity

/** SparkSessionExtensions injector: registers graft's native expressions as
  * SQL functions, so `spark.sql("SELECT cosine_similarity(a, b) ...")` works
  * in any session created with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * (The Column API in [[graft.functions.VectorFunctions]] needs no
  * registration.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
  }
}
