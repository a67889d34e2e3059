package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded frequent-items candidate summary (Misra–Gries, in its
  * MERGEABLE form — Agarwal et al., "Mergeable Summaries", PODS 2012; the
  * same public algorithm behind DataFrameStatFunctions.freqItems).
  *
  * The buffer is HARD-BOUNDED at `capacity` counters, so Spark runs it
  * partial+final like any built-in agg: each map task summarizes its
  * token stream down to ≤ `capacity` (token, count) pairs before the
  * exchange, and the final merge sees one tiny summary per task —
  * O(tasks × capacity) rows shuffle, never the corpus's distinct-token
  * set. That is the whole point at 100 TB: the exact `groupBy(token)`
  * formulation shuffles every distinct token; this shuffles a few KB per
  * task regardless of vocabulary size.
  *
  * Guarantee (the reason a 2-pass EXACT heavy-hitters query can be built
  * on it, [[graft.ext.TextAnalysis.heavyHitters]]): for any merge tree
  * over any partitioning of an N-item stream, every summary count
  * undercounts its item's true frequency by at most N/(capacity+1) — so
  * every item with true frequency > N/(capacity+1) SURVIVES the summary.
  * The candidate set is a guaranteed superset of the φ-heavy hitters
  * whenever capacity+1 > 1/φ; an exact recount of just the candidates
  * (second pass, broadcast semi-filter) then makes the final answer
  * exact, independent of partitioning — which is why the operator is
  * oracle-checkable even though the intermediate summaries are not
  * deterministic across partitionings.
  *
  * reduce: O(1) amortized (each decrement-all step is O(capacity) but
  * destroys capacity+1 units of counter mass, and only N units ever
  * enter). merge: O(capacity log capacity) for the pivot sort.
  */
object MisraGriesAggregator {

  case class MgBuf(var counts: Map[String, Long])

  def agg(capacity: Int): Aggregator[String, MgBuf, Seq[String]] = {
    require(capacity > 0, s"Misra-Gries needs capacity > 0, got $capacity")
    new Aggregator[String, MgBuf, Seq[String]] {
      override def zero: MgBuf = MgBuf(Map.empty)

      override def reduce(b: MgBuf, tok: String): MgBuf = {
        val m = b.counts
        m.get(tok) match {
          case Some(c) => b.counts = m.updated(tok, c + 1)
          case None if m.size < capacity => b.counts = m.updated(tok, 1L)
          case None =>
            // decrement-all: the classic MG step — one unit off every
            // counter (the incoming item's unit is the one discarded)
            b.counts = m.iterator
              .filter(_._2 > 1).map { case (k, v) => (k, v - 1) }.toMap
        }
        b
      }

      override def merge(a: MgBuf, b: MgBuf): MgBuf = {
        val summed = b.counts.foldLeft(a.counts) { case (m, (k, v)) =>
          m.updated(k, m.getOrElse(k, 0L) + v)
        }
        a.counts =
          if (summed.size <= capacity) summed
          else {
            // mergeable-summaries step: subtract the (capacity+1)-th
            // largest count from all, keep the strictly positive
            val pivot = summed.valuesIterator.toArray
              .sortBy(-_).apply(capacity)
            summed.iterator.filter(_._2 > pivot)
              .map { case (k, v) => (k, v - pivot) }.toMap
          }
        a
      }

      override def finish(b: MgBuf): Seq[String] =
        b.counts.keysIterator.toSeq.sorted

      override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
      override def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }
  }
}
