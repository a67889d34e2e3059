package graft

import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}

/** SparkSessionExtensions injector: registers graft's native expressions
  * (cosine_similarity, minhash_signature, simhash64) as SQL functions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works in any session
  * created with `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * (The Column API in [[graft.functions.VectorFunctions]] needs no
  * registration.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftBridge.functions.foreach(ext.injectFunction)
}
