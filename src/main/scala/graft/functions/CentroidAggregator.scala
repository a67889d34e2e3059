package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY §2.11 [EXT]): element-wise mean of
  * `array<float>` embeddings — the centroid computation an IVF coarse
  * quantizer needs. Demonstrates the `Aggregator[IN, BUF, OUT]` tier of
  * custom aggregation: a mutable sums buffer merged associatively, so
  * Spark runs it partial+final like any built-in agg (map-side combine,
  * one shuffle of 64 doubles per group instead of all vectors).
  */
object CentroidAggregator {

  case class Buf(var sums: Array[Double], var n: Long)

  val agg: Aggregator[Array[Float], Buf, Array[Float]] =
    new Aggregator[Array[Float], Buf, Array[Float]] {
      override def zero: Buf = Buf(Array.empty[Double], 0L)

      override def reduce(b: Buf, v: Array[Float]): Buf = {
        if (b.sums.length == 0) b.sums = new Array[Double](v.length)
        require(v.length == b.sums.length,
          s"ragged embedding dims: ${v.length} vs ${b.sums.length}")
        var i = 0
        while (i < v.length) { b.sums(i) += v(i); i += 1 }
        b.n += 1
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        if (a.sums.length == 0) b
        else if (b.sums.length == 0) a
        else {
          require(a.sums.length == b.sums.length,
            s"ragged embedding dims: ${a.sums.length} vs ${b.sums.length}")
          var i = 0
          while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
          a.n += b.n
          a
        }
      }

      override def finish(b: Buf): Array[Float] =
        if (b.n == 0) Array.empty[Float]
        else b.sums.map(s => (s / b.n).toFloat)

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Array[Float]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
    }
}
