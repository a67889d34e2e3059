package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.graft.CosineSimilarity

/** Column-API facade over the native Catalyst vector expressions. */
object VectorFunctions {
  /** Cosine similarity of two `array<float>` embedding columns —
    * whole-stage-codegen'd fused loop (see [[CosineSimilarity]]). */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
