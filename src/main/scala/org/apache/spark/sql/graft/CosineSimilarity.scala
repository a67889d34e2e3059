package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: fused one-pass cosine similarity over two
  * `array<float>` embedding columns (SURVEY §2.11 [EXT]).
  *
  * `zip_with`/`aggregate` higher-order functions are interpreted (no
  * codegen), which made brute-force cosine the bench bottleneck. This is a
  * single fused loop with full whole-stage codegen — the preferred "custom
  * operator" tier from the build brief: a native `Expression` with
  * `doGenCode`, not a UDF. Lives under o.a.s.sql because the expression
  * API surface (`AbstractDataType` etc.) is `private[sql]` in Spark 4.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch FAILS, never truncates: the cosine of prefixes
    // is a plausible-looking but wrong score (two encoder versions
    // joined by accident would silently mis-rank every pair) — the same
    // loud stance SrpSignature takes for the same reason
    if (x.numElements() != y.numElements()) throw new IllegalArgumentException(
      s"cosine_similarity: dimension mismatch (${x.numElements()} vs " +
        s"${y.numElements()}) — truncating to the common prefix would " +
        "return plausible but wrong scores")
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_similarity: dimension mismatch (" + $x.numElements() +
         |    " vs " + $y.numElements() + ") — truncating to the common " +
         |    "prefix would return plausible but wrong scores");
         |}
         |int $n = $x.numElements();
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
