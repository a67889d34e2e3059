package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregate (SURVEY §2.11 [EXT]): keeps the `k`
  * best `(score, id)` pairs per group, ordered by (score desc, id asc).
  *
  * This is the aggregation core of the exact k-NN join
  * ([[graft.ext.Similarity.knnJoin]]): because the buffer is HARD-BOUNDED
  * at `k` entries, Spark runs it partial+final like any built-in agg —
  * each map task combines its local candidates down to ≤ k per group
  * before the exchange, so the shuffle carries O(groups × tasks × k)
  * tiny buffers instead of the O(n²) scored-pair stream. A
  * collect_list+sort formulation would instead buffer EVERY candidate
  * per group (unbounded at corpus scale); this aggregator is why the
  * k-NN join's reduce side never sees more than k rows per (group,
  * upstream-task) pair.
  *
  * reduce = O(k) sorted insertion, merge = O(k) sorted merge — both
  * associative and commutative, so partial aggregation is sound.
  *
  * Both are also IDEMPOTENT on identical `(score, id)` pairs: a
  * duplicate of an entry already banked is dropped instead of occupying
  * a second slot. That lets candidate generators that surface the same
  * pair through several routes (multi-table LSH banding, multi-probe
  * IVF) feed the aggregation DIRECTLY — no `dropDuplicates` pre-pass,
  * which at scale is a full extra shuffle of the candidate stream.
  */
object TopKAggregator {

  /** One scored candidate; `score` ranks desc, `id` breaks ties asc. */
  case class Entry(score: Double, id: Long)

  case class Buf(var items: Seq[Entry])

  /** Order-preserving long key for a score, with two deliberate NaN
    * properties: all NaNs collapse to ONE key (so a NaN duplicate
    * dedups — raw `==` is false for NaN against itself) and that key is
    * the MINIMUM (so garbage scores rank strictly below every real
    * score, -Inf included, and are the first evicted — a total order
    * that put NaN first would hand rank #1 to a corrupt embedding).
    * Non-NaN doubles use the standard sign-fold bit trick, which
    * matches numeric order exactly. */
  private def rank(s: Double): Long =
    if (java.lang.Double.isNaN(s)) Long.MinValue
    else {
      val b = java.lang.Double.doubleToLongBits(s)
      b ^ ((b >> 63) & 0x7fffffffffffffffL)
    }

  /** true iff a ranks strictly before b: (score desc, id asc). */
  private def before(a: Entry, b: Entry): Boolean = {
    val (ra, rb) = (rank(a.score), rank(b.score))
    ra > rb || (ra == rb && a.id < b.id)
  }

  /** Total-order equality: same id and same score key. */
  private def same(a: Entry, b: Entry): Boolean =
    a.id == b.id && rank(a.score) == rank(b.score)

  def agg(k: Int): Aggregator[Entry, Buf, Seq[Entry]] = {
    require(k > 0, s"top-k needs k > 0, got $k")
    new Aggregator[Entry, Buf, Seq[Entry]] {
      override def zero: Buf = Buf(Vector.empty)

      override def reduce(b: Buf, e: Entry): Buf = {
        if (b.items.size < k || before(e, b.items.last)) {
          val (hd, tl) = b.items.span(before(_, e))
          // idempotent: an entry equal to the one at its insertion point
          // is already banked (equal pairs are adjacent in sort order)
          if (tl.headOption.exists(same(_, e))) b
          else { b.items = ((hd :+ e) ++ tl).take(k); b }
        } else b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        // sorted merge of two ≤k-element runs, truncated at k; an entry
        // present in BOTH runs is emitted once (idempotent on duplicates)
        val out = Vector.newBuilder[Entry]
        var (i, j, n) = (0, 0, 0)
        val (x, y) = (a.items, b.items)
        while (n < k && (i < x.size || j < y.size)) {
          if (i < x.size && j < y.size && same(x(i), y(j))) {
            out += x(i); i += 1; j += 1
          } else if (j >= y.size || (i < x.size && before(x(i), y(j)))) {
            out += x(i); i += 1
          } else { out += y(j); j += 1 }
          n += 1
        }
        a.items = out.result()
        a
      }

      override def finish(b: Buf): Seq[Entry] = b.items

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }
  }
}
