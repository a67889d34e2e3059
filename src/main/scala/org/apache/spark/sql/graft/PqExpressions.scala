package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives (SURVEY §2.11 [EXT]) — the memory-bound
  * ANN scale path: a 64-dim float vector (256 bytes) compresses to `m`
  * 4-bit codes (one int), and query-candidate scoring becomes `m` lookups
  * into a per-query table instead of a full dot product. At 100 TB the
  * pair-scoring scan carries ~12 bytes per candidate instead of the
  * embedding column — that compression, not FLOPs, is what PQ buys.
  *
  * Codebooks ride inside the expression as a flat literal float array
  * (`m` subspaces × `k` codes × `subDim` floats — a few KB serialized with
  * the plan to every executor, FAISS's driver-resident-quantizer shape).
  * All loops are fused JVM (CodegenFallback — called once per row, the
  * eval IS the tight loop; see SketchExpressions for the rationale).
  */

/** Encode an array<float> vector as `m` packed 4-bit codes (k must be 16):
  * per subspace, the code of the L2-nearest codebook centroid; strict `<`
  * keeps the LOWEST minimal code — deterministic. */
case class PqEncode(child: Expression, codebooks: Seq[Float], m: Int, k: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k == 16, "4-bit packing requires exactly 16 codes per subspace")
  require(m >= 1 && m <= 8,
    "packed codes must fit one int (1..8 subspaces x 4 bits)")
  // a truncating layout division would silently ignore trailing floats
  // (or degenerate to subDim = 0 and accept only empty vectors)
  require(codebooks.nonEmpty && codebooks.length % (m * k) == 0,
    s"codebook length ${codebooks.length} is not a positive multiple of " +
      s"m*k (${m * k})")
  // Seq field: content-based equality/canonicalization (an Array field
  // compares by reference, defeating common-subexpression elimination
  // for two loads of the same index); hot loops index a private array
  @transient private lazy val cb: Array[Float] = codebooks.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val subDim = cb.length / (m * k)
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${v.numElements()} != m*subDim (${m * subDim}) " +
          "implied by the codebook layout")
    var packed = 0
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val base = (mi * k + ki) * subDim
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val diff = v.getFloat(mi * subDim + d).toDouble - cb(base + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = ki }
        ki += 1
      }
      packed |= best << (4 * mi)
      mi += 1
    }
    packed
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: lut[mi*k + ki] = dot(query_sub_mi, c_{mi,ki})
  * as double — computed ONCE per query row, amortized over every candidate
  * it scores. */
case class PqLut(child: Expression, codebooks: Seq[Float], m: Int, k: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k == 16 && m >= 1 && m <= 8,
    s"pq_lut layout must match pq_encode's (1..8 subspaces x 16 codes), got m=$m k=$k")
  require(codebooks.nonEmpty && codebooks.length % (m * k) == 0,
    s"codebook length ${codebooks.length} is not a positive multiple of " +
      s"m*k (${m * k})")
  @transient private lazy val cb: Array[Float] = codebooks.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val subDim = cb.length / (m * k)
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_lut: vector length ${v.numElements()} != m*subDim (${m * subDim}) " +
          "implied by the codebook layout")
    val lut = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      var ki = 0
      while (ki < k) {
        val base = (mi * k + ki) * subDim
        var dot = 0.0
        var d = 0
        while (d < subDim) {
          dot += v.getFloat(mi * subDim + d).toDouble * cb(base + d)
          d += 1
        }
        lut(mi * k + ki) = dot
        ki += 1
      }
      mi += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Asymmetric-distance score of one (packed codes, query LUT) pair:
  * sum over subspaces of lut[mi*k + code_mi] ≈ dot(query, candidate).
  * Unlike the per-row encode/LUT expressions, this one sits in the
  * query×candidate PAIR scan — the hot path — so it has real `doGenCode`
  * (a CodegenFallback here would break the whole-stage-codegen span of
  * the scoring stage and pay interpreted dispatch per pair). */
case class PqAdc(left: Expression, right: Expression, m: Int, k: Int)
  extends BinaryExpression with ExpectsInputTypes {
  // pq_adc is SQL-exposed with user-supplied m/k: for m > 8 the 4*mi
  // shift distance wraps mod 32 on the JVM and silently RE-READS low
  // nibbles (subspace 8 scoring with subspace 0's code); k != 16
  // mis-strides the LUT. Reject at construction like pq_encode does.
  require(k == 16 && m >= 1 && m <= 8,
    s"pq_adc layout must match pq_encode's (1..8 subspaces x 16 codes), got m=$m k=$k")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codes: Any, lutAny: Any): Any = {
    val packed = codes.asInstanceOf[Int]
    val lut = lutAny.asInstanceOf[ArrayData]
    var sum = 0.0
    var mi = 0
    while (mi < m) {
      sum += lut.getDouble(mi * k + ((packed >>> (4 * mi)) & 15))
      mi += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val sum = ctx.freshName("sum")
      val mi = ctx.freshName("mi")
      s"""
         |double $sum = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $sum += $lut.getDouble($mi * $k + (($codes >>> (4 * $mi)) & 15));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an array<float> vector (sequential float→double squares —
  * the same accumulation shape as [[CosineSimilarity]], with the same
  * whole-stage codegen). */
case class VecNorm(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < v.numElements()) {
      val x = v.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  double $x = (double) $v.getFloat($i);
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}
