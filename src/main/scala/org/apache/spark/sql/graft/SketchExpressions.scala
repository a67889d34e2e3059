package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions (SURVEY §2.11 [EXT]).
  *
  * The higher-order-function formulations (`transform`/`aggregate` lambdas)
  * paid ~1µs of interpreted-eval overhead per lambda call — 64 perms × ~100
  * shingles × N docs dominated the bench. These are single fused JVM loops
  * over the raw UTF8String bytes (no per-element expression dispatch, no
  * intermediate arrays). `CodegenFallback` is fine here: the expression is
  * called once per row and its eval is already a tight loop, so codegen
  * would only inline the call site.
  */

/** 64-perm MinHash signature of an array<string> shingle set:
  * sig[p] = min over shingles of murmur3_32(bytes, seed = p). */
case class MinHashSignature(child: Expression, numPerms: Int = 64)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Int](numPerms)
    java.util.Arrays.fill(sig, Int.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var p = 0
        while (p < numPerms) {
          val h = Murmur3_x86_32.hashUnsafeBytes(base, off, len, p)
          if (h < sig(p)) sig(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string> token list: bit i of the signature is
  * set iff the sum over tokens of ±1 (per bit i of xxh64(token)) is positive. */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
