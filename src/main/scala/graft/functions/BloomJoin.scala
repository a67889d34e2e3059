package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction (SURVEY §2.11 [EXT]) — the manual
  * runtime-filter: when a huge fact joins a SELECTIVELY FILTERED dim that
  * is too big to broadcast-join outright, build a bloom filter over the
  * dim's join keys (one distributed aggregation; the serialized filter is
  * `numBits/8` bytes regardless of dim row count) and pre-filter the fact
  * with it BEFORE the shuffle. No false negatives — the bloom pass drops
  * only rows the join would drop anyway, so the result is byte-identical
  * to the plain join (the oracle) — and false positives die in the join
  * itself. At 100 TB this converts "shuffle every fact row that might
  * match" into "shuffle the ~selectivity fraction that can match": the
  * exchange, not the scan, is what the filter is protecting.
  *
  * Spark's own `InjectRuntimeFilter` plants exactly this shape
  * automatically when its cost heuristics fire; this is the explicit,
  * always-on form for when the planner's creation constraints (no
  * shuffle-reusable build side, DPP overlap, size thresholds) decline —
  * built on the same catalyst primitives (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, both keyed through `xxhash64`), so the
  * probe side stays codegen'd.
  *
  * Driver path: the built filter collects to the driver (bounded:
  * `numBits/8` bytes, 1 MiB at the 2^23 default — the same order as
  * Spark's runtime-filter cap) and ships to probe tasks as a literal in
  * the task binary, exactly like a broadcast of the filter.
  */
object BloomJoin {

  /** One distributed aggregation over `build`'s `key` → serialized bloom
    * filter bytes; null when the build side is empty. `expectedItems`
    * sizes the hash count, `numBits` the bitmap (defaults: 1M items in
    * 1 MiB → ~3% fpp; at 100 TB size `numBits` to the post-filter dim
    * cardinality, the filter stays KB–MB either way). */
  def buildFilter(build: DataFrame, key: Column,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    build.select(GraftBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Codegen'd probe: `might_contain(xxhash64(key))` against a built
    * filter. A null `filter` (empty build side) rejects every row — the
    * correct semi-join-with-empty-side answer. */
  def mightContain(key: Column, filter: Array[Byte]): Column =
    if (filter == null) lit(false)
    else GraftBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(key)))))

  /** The composed pattern: equi-join `fact` to `dim`, pre-filtering the
    * fact through a bloom of the dim keys so the fact-side exchange only
    * carries rows that can match. Result identical to the plain join. */
  def reduceJoin(fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    val bf = buildFilter(dim, dimKey, expectedItems, numBits)
    fact.filter(mightContain(factKey, bf))
      .join(dim, factKey === dimKey)
  }
}
