package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives (SURVEY §2.11 [EXT]) — the memory-bound
  * ANN scale path: a 64-dim float vector (256 bytes) compresses to `m`
  * ceil(log2(k))-bit codes in one packed word (an int for the default
  * m=8/k=16 4-bit layout, a long past 32 bits — see [[PqLayout]]), and
  * query-candidate scoring becomes `m` lookups into a per-query table
  * instead of a full dot product. At 100 TB the pair-scoring scan carries
  * ~12-16 bytes per candidate instead of the embedding column — that
  * compression, not FLOPs, is what PQ buys.
  *
  * Codebooks ride inside the expression as a flat literal float array
  * (`m` subspaces × `k` codes × `subDim` floats — a few KB serialized with
  * the plan to every executor, FAISS's driver-resident-quantizer shape).
  * All loops are fused JVM (CodegenFallback — called once per row, the
  * eval IS the tight loop; see SketchExpressions for the rationale).
  */

/** Shared code-packing layout: `k` codes per subspace pack as
  * ceil(log2(k))-bit fields, subspace `mi` at bit offset bits·mi. The
  * packed word is an INT when every field fits 32 bits (the legacy — and
  * registered — m=8/k=16 4-bit shape is bit-identical to the historical
  * int packing) and a LONG past that, which is what admits the r14
  * codebook-resolution sweep (k=32 → 5-bit fields) without touching the
  * k=16 layout or any saved index. */
object PqLayout {
  def bitsPerCode(k: Int): Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(k - 1))
  def fitsInt(m: Int, k: Int): Boolean = m * bitsPerCode(k) <= 32
  def validate(name: String, m: Int, k: Int): Unit = {
    require(k >= 2 && k <= 256,
      s"$name: codes per subspace must be in [2, 256], got k=$k")
    require(m >= 1 && m * bitsPerCode(k) <= 64,
      s"$name: m x ceil(log2(k)) bits must fit one packed long " +
        s"(got m=$m x ${bitsPerCode(k)} bits)")
  }
}

/** Encode an array<float> vector as `m` packed ceil(log2(k))-bit codes
  * (see [[PqLayout]]): per subspace, the code of the L2-nearest codebook
  * centroid; strict `<` keeps the LOWEST minimal code — deterministic. */
case class PqEncode(child: Expression, codebooks: Seq[Float], m: Int, k: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  PqLayout.validate("pq_encode", m, k)
  private val bits = PqLayout.bitsPerCode(k)
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
  override def dataType: DataType =
    if (PqLayout.fitsInt(m, k)) IntegerType else LongType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val subDim = cb.length / (m * k)
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${v.numElements()} != m*subDim (${m * subDim}) " +
          "implied by the codebook layout")
    var packed = 0L
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
      packed |= best.toLong << (bits * mi)
      mi += 1
    }
    if (PqLayout.fitsInt(m, k)) packed.toInt else packed
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: lut[mi*k + ki] = dot(query_sub_mi, c_{mi,ki})
  * as double — computed ONCE per query row, amortized over every candidate
  * it scores. */
case class PqLut(child: Expression, codebooks: Seq[Float], m: Int, k: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  PqLayout.validate("pq_lut", m, k)
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
  // pq_adc is SQL-exposed with user-supplied m/k: a layout that doesn't
  // fit the packed word would silently RE-READ low fields (shift wrap)
  // and k mismatches mis-stride the LUT — reject at construction like
  // pq_encode does. All shift arithmetic is LONG (no mod-32/64 wrap
  // within the validated m x bits <= 64 envelope).
  PqLayout.validate("pq_adc", m, k)
  private val bits = PqLayout.bitsPerCode(k)
  private val mask = (1L << bits) - 1

  override def inputTypes: Seq[AbstractDataType] =
    Seq(if (PqLayout.fitsInt(m, k)) IntegerType else LongType,
      ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codes: Any, lutAny: Any): Any = {
    val packed: Long = codes match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case other => other.asInstanceOf[Long]
    }
    val lut = lutAny.asInstanceOf[ArrayData]
    var sum = 0.0
    var mi = 0
    while (mi < m) {
      sum += lut.getDouble(mi * k + ((packed >>> (bits * mi)) & mask).toInt)
      mi += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val sum = ctx.freshName("sum")
      val mi = ctx.freshName("mi")
      // (long) cast: for int-packed codes the sign extension only touches
      // bits >= 32, and every field the loop reads sits below 32 within
      // the validated layout, so int and long inputs share one body
      s"""
         |double $sum = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $sum += $lut.getDouble($mi * $k +
         |    (int) ((((long) $codes) >>> ($bits * $mi)) & ${mask}L));
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
