package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, Md5SimHash60, MinHashSignature, PqAdc, ShingleSet, SimHash64, SrpSignature, VecNorm}

/** Minimal bridge into `private[sql]` surface — Spark 4's Connect refactor
  * hid `ExpressionUtils` and `sessionState`; wrapping a custom Catalyst
  * expression into a `Column` (and registering it on a live session)
  * requires being inside the sql package (the standard pattern for
  * Spark-native extension libraries). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Nullability-and-case-insensitive type equality (`DataType.sameType`
    * is `private[spark]`) — strict schema enforcement must not reject an
    * array<string> batch because its `containsNull` is narrower than the
    * snapshot's. */
  def sameType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)

  /** The FULLY CONVERTED catalyst expression of a Column: Spark 4's
    * `ExpressionUtils.expression` returns a lazy `ColumnNodeExpression`
    * wrapper; unwrap it through the classic converter so callers see the
    * real (possibly still analysis-stage) expression tree. */
  def catalystExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c) match {
      case classic.ColumnNodeExpression(node) =>
        classic.ColumnNodeToExpressionConverter(node)
      case e => e
    }

  /** Every graft native expression as a SQL function, one definition shared
    * by the live-session path below and the config-time injector
    * ([[graft.GraftExtensions]]). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => MinHashSignature(children(0))),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children(0))),
    (new FunctionIdentifier("md5_simhash60"),
      new ExpressionInfo(classOf[Md5SimHash60].getName, "md5_simhash60"),
      (children: Seq[Expression]) => Md5SimHash60(children(0))),
    (new FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (children: Seq[Expression]) => ShingleSet(children(0))),
    (new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (children: Seq[Expression]) => VecNorm(children(0))),
    // m and k ride as foldable INT literals from SQL: pq_adc(codes, lut, 8, 16)
    (new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"pq_adc(codes, lut, m, k) takes 4 arguments, got ${children.length}")
        def foldedInt(e: Expression, name: String): Int = {
          require(e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType,
            s"pq_adc: $name must be a foldable INT literal, got ${e.sql}")
          val v = e.eval()
          require(v != null, s"pq_adc: $name must not be NULL")
          v.asInstanceOf[Int]
        }
        PqAdc(children(0), children(1),
          foldedInt(children(2), "m"), foldedInt(children(3), "k"))
      }),
    // bands/bits/dim ride as foldable INT literals: srp_signature(v, 16, 8, 64)
    (new FunctionIdentifier("srp_signature"),
      new ExpressionInfo(classOf[SrpSignature].getName, "srp_signature"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 4,
          s"srp_signature(vec[, bands, bits, dim]) takes 1 or 4 arguments, got ${children.length}")
        def foldedInt(e: Expression, name: String): Int = {
          require(e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType,
            s"srp_signature: $name must be a foldable INT literal, got ${e.sql}")
          val v = e.eval()
          require(v != null, s"srp_signature: $name must not be NULL")
          v.asInstanceOf[Int]
        }
        if (children.length == 1) SrpSignature(children(0))
        else SrpSignature(children(0), foldedInt(children(1), "bands"),
          foldedInt(children(2), "bits"), foldedInt(children(3), "dim"))
      }))

  /** Register graft's SQL functions on an already-created session (the
    * config-time path is `spark.sql.extensions=graft.GraftExtensions`). */
  def registerFunctions(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
