package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance over a [[Versioned]] table — the
  * materialized-view-refresh pattern a 100 TB warehouse lives on: the
  * raw fact stream is APPEND-ONLY and enormous, the rollup is
  * (partitions × keys) and small, so each batch folds its ADDITIVE
  * partial states into the rollup and the raw history is NEVER rescanned.
  *
  * Shape per batch:
  * 1. Pre-aggregate the batch to partial states per (partitionKey,
  *    subKeys) — the only pass over raw rows, proportional to the BATCH.
  * 2. Split the current rollup on the batch's touched partition values
  *    (broadcast — bounded by the batch's distinct partitions): untouched
  *    rollup rows pass through untouched; touched rows union the batch
  *    partials and re-aggregate (states are additive sums, so
  *    merge == sum).
  * 3. Publish atomically as the next version, with the batch id in the
  *    COMMIT METADATA — the same atomic rename that makes the data
  *    visible records the ingestion, so replays are batch-level
  *    exactly-once: a re-delivered batch id is a no-op, a crash before
  *    the rename left nothing visible and nothing recorded.
  *
  * Measures must be ADDITIVE (counts, integer-cents sums, any
  * sum-mergeable state). AVG-like outputs derive downstream from
  * (sum, cnt) pairs, the same discipline as the engine's exact-money
  * policy. Concurrent refreshes: the copy-on-write `expectedHead` guard
  * aborts the loser, which re-reads and retries — lost updates are
  * structurally impossible.
  *
  * Replay-guard horizon: the guard's memory IS the retained manifest
  * history (one tiny read per retained version at upsert time), so size
  * [[Versioned.vacuum]]'s `keepVersions`/`minAgeMs` to exceed the
  * maximum redelivery window — a batch replayed after its manifest was
  * vacuumed re-applies. This is the same transaction-retention trade
  * the public lakehouse formats document for their txn/idempotency ids.
  */
object Incremental {

  /** Fold one batch into the rollup at `basePath`. `batch` carries
    * `partitionKey`, `subKeys`, and numeric `measures` columns (one row
    * per raw event; pre-projected — e.g. `lit(1L).as("cnt")`,
    * `cents(col("value")).as("val_cents")`). Returns the committed (or,
    * for a replayed batch id, the already-current) version. */
  def upsertRollup(spark: SparkSession, basePath: String, batch: DataFrame,
      batchId: String, partitionKey: String, subKeys: Seq[String],
      measures: Seq[String]): Long = {
    require(measures.nonEmpty, "upsertRollup needs at least one measure")
    val keys = (partitionKey +: subKeys).map(col)
    def reAgg(df: DataFrame): DataFrame =
      df.groupBy(keys: _*).agg(
        sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)

    val partials = reAgg(batch)
    val vs = Versioned.versions(spark, basePath)
    // batch-level exactly-once: the id was committed atomically WITH its
    // data, so presence in any manifest means the batch is fully applied
    if (vs.exists(v => Versioned.commitMeta(spark, basePath, v)
        .get("batch_id").contains(batchId)))
      return vs.last
    if (vs.isEmpty)
      return Versioned.commit(partials, basePath,
        meta = Map("batch_id" -> batchId))

    val head = vs.last
    val cur = Versioned.readVersion(spark, basePath, head)
      .select(partials.columns.map(col): _*)
    val touchedParts = partials.select(col(partitionKey)).distinct()
    val untouched = cur.join(broadcast(touchedParts),
      Seq(partitionKey), "left_anti")
    val merged = reAgg(
      cur.join(broadcast(touchedParts), Seq(partitionKey), "left_semi")
        .unionByName(partials))
    Versioned.commit(untouched.unionByName(merged), basePath,
      expectedHead = Some(head), meta = Map("batch_id" -> batchId))
  }

  /** Continuous refresh: [[upsertRollup]] per micro-batch, keyed by the
    * STREAMING batch id — after a restart from checkpoint, Structured
    * Streaming redelivers the same epoch under the same id, the replay
    * guard no-ops it, and the rollup is EXACTLY-ONCE end to end without
    * Spark's state store (aggregation state lives in the versioned
    * table itself, which is also what makes it queryable mid-stream and
    * durable across stream restarts). `options` should carry
    * `checkpointLocation` in production. */
  def rollupStream(stream: DataFrame, basePath: String,
      partitionKey: String, subKeys: Seq[String], measures: Seq[String],
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .options(options)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          upsertRollup(batch.sparkSession, basePath, batch,
            s"stream-epoch-$epochId", partitionKey, subKeys, measures)
          ()
        }
      }
      .start()
}
