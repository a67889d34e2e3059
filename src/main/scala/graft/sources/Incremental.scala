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
  * 2. Split the current rollup's DATA DIRECTORIES on the batch's touched
  *    partition values: every directory whose [[ManifestEntry]] partition
  *    tag is disjoint from the touched set is carried forward BY
  *    REFERENCE (zero bytes rewritten); only the intersecting
  *    directories are read, their touched rows merged with the batch
  *    partials (states are additive sums, so merge == sum) and their
  *    untouched remainder re-staged. Steady state converges to
  *    per-partition-group directories, so an upsert costs the touched
  *    partitions, not the rollup.
  * 3. Publish atomically as the next version, with the batch id in the
  *    COMMIT METADATA — the same atomic rename that makes the data
  *    visible records the ingestion, so replays are batch-level
  *    exactly-once: a re-delivered batch id is a no-op, a crash before
  *    the rename left nothing visible and nothing recorded.
  *
  * Measures must be ADDITIVE (counts, integer-cents sums, any
  * sum-mergeable state). AVG-like outputs derive downstream from
  * (sum, cnt) pairs, the same discipline as the engine's exact-money
  * policy. Concurrent refreshes: every commit (including the bootstrap
  * on an empty table, pinned to expectedHead 0) is CAS-guarded; a loser
  * aborts with ConcurrentModificationException and THIS MODULE retries
  * it — re-reading the head, re-checking the replay guard, re-deriving
  * the merge — up to a bounded attempt count, after which the exception
  * propagates (inside [[rollupStream]]'s foreachBatch that fails the
  * query; the batch replays on restart, and the guard keeps the
  * eventual outcome exactly-once).
  *
  * Replay-guard horizon: the guard is ONE head-manifest read against the
  * applied-batch ledger ([[Versioned.appliedBatchIds]]), which every
  * commit carries forward — it survives [[Versioned.vacuum]] and costs
  * the same at any retained-history depth. Its memory is the ledger cap
  * ([[Versioned.AppliedCap]] most recent batch ids): a batch redelivered
  * later than that re-applies, so size redelivery windows under the cap.
  */
object Incremental {

  /** Partition tags are strings; NULL and EMPTY-STRING partition values
    * map to NUL-prefixed sentinels (URL-encoding-safe, and NUL cannot
    * appear in a real toString) so both degenerate groups get tag
    * semantics. A raw "" tag would vanish in the manifest encoding
    * (enc("") is empty, the decoder drops empty tokens) and the dir
    * would falsely claim disjointness from everything. (The null
    * sentinel was briefly " null" within r9 before release — no
    * persisted manifest ever carried that form, so no migration path
    * exists or is needed; a REAL " null" string value collides with
    * nothing now because NUL cannot appear in a toString.) */
  private val NullPart = "\u0000null"
  private val EmptyPart = "\u0000empty"

  private def partTag(v: Any): String =
    if (v == null) NullPart
    else { val s = v.toString; if (s.isEmpty) EmptyPart else s }

  /** Fold one batch into the rollup at `basePath`. `batch` carries
    * `partitionKey`, `subKeys`, and numeric `measures` columns (one row
    * per raw event; pre-projected — e.g. `lit(1L).as("cnt")`,
    * `cents(col("value")).as("val_cents")`). `maxEntries`: when the
    * rollup has accreted this many data directories, the upsert
    * consolidates them all into one (self-compaction) instead of adding
    * more — bounding both manifest size and per-read file listing.
    * Returns the committed (or, for a replayed batch id, the
    * already-current) version. */
  def upsertRollup(spark: SparkSession, basePath: String, batch: DataFrame,
      batchId: String, partitionKey: String, subKeys: Seq[String],
      measures: Seq[String], maxEntries: Int = 64): Long = {
    require(measures.nonEmpty, "upsertRollup needs at least one measure")
    val keys = (partitionKey +: subKeys).map(col)
    def reAgg(df: DataFrame): DataFrame =
      df.groupBy(keys: _*).agg(
        sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)

    val partials = reAgg(batch).cache()
    try {
      val touchedSet: Set[String] = partials
        .select(col(partitionKey)).distinct()
        .collect().map(r => partTag(r.get(0))).toSet
      var attempts = 0
      while (true) {
        attempts += 1
        require(attempts <= 50,
          s"upsertRollup($batchId) lost $attempts consecutive commit races " +
            s"under $basePath — giving up")
        try {
          return attemptUpsert(spark, basePath, partials, batchId,
            partitionKey, touchedSet, reAgg, maxEntries)
        } catch {
          case _: java.util.ConcurrentModificationException =>
            // randomized exponential backoff: the merge derivation spans
            // several jobs, so under hot contention a bare retry loop
            // livelocks (every slow derivation loses to a faster writer)
            // — jittered spacing de-synchronizes the writers, the same
            // answer the public lakehouse commit services use
            val capMs = math.min(100L << math.min(attempts, 6), 5000L)
            Thread.sleep((capMs * math.random()).toLong)
        }
      }
      throw new IllegalStateException("unreachable")
    } finally partials.unpersist()
  }

  private def attemptUpsert(spark: SparkSession, basePath: String,
      partials: DataFrame, batchId: String, partitionKey: String,
      touchedSet: Set[String], reAgg: DataFrame => DataFrame,
      maxEntries: Int): Long = {
    val vs = Versioned.versions(spark, basePath)
    // batch-level exactly-once: ONE head-manifest ledger read; the id was
    // committed atomically WITH its data, so presence means fully applied
    if (Versioned.appliedBatchIds(spark, basePath).contains(batchId))
      return vs.last
    if (vs.isEmpty)
      // CAS-pinned bootstrap: two racing first batches must NOT both see
      // an empty table and Overwrite — the loser aborts here and retries
      // through the non-empty merge path above
      return Versioned.commit(partials, basePath,
        expectedHead = Some(0L), meta = Map("batch_id" -> batchId),
        parts = Some(touchedSet))

    val head = vs.last
    val ents = Versioned.entries(spark, basePath, head)
    val dels = Versioned.delPaths(ents)
    val dataEnts = Versioned.dataEntries(ents)
    // directory-level pruning: a tagged dir disjoint from the touched
    // partitions is carried by reference; untagged dirs (legacy or
    // post-update) make no claim and must be treated as intersecting.
    // Past maxEntries, fold everything — self-compaction (which also
    // materializes any outstanding deletion vectors away).
    val foldAll = dataEnts.size >= maxEntries
    val (carried, intersecting) =
      if (foldAll) (Seq.empty[ManifestEntry], dataEnts)
      else dataEnts.partition(_.parts.exists(_.intersect(touchedSet).isEmpty))
    // tombstone entries ride along unless this upsert folds every data
    // dir (then the fold below applies them and they can drop)
    val delEnts =
      if (foldAll || carried.isEmpty) Seq.empty[ManifestEntry]
      else ents.filter(_.tombstone)
    if (intersecting.isEmpty)
      // every existing dir is provably disjoint (a brand-new partition):
      // the batch partials ARE the merged state — nothing to read at all
      return Versioned.publishEntries(spark, basePath, head,
        delEnts ++ carried :+ ManifestEntry(
          Versioned.stage(partials, basePath), Some(touchedSet)),
        Map("batch_id" -> batchId))
    val cur = Versioned.applyDels(spark,
        spark.read.option("mergeSchema", "true")
          .parquet(intersecting.map(_.path): _*), dels)
      .select(partials.columns.map(col): _*)
    // null-safe membership: a NULL partition value must merge with the
    // batch's NULL group, not duplicate into remainder AND merged
    val tp = partials.select(col(partitionKey).as("__tp")).distinct()
    val remainder = cur.join(broadcast(tp),
      cur(partitionKey) <=> col("__tp"), "left_anti")
    val merged = reAgg(
      cur.join(broadcast(tp), cur(partitionKey) <=> col("__tp"), "left_semi")
        .drop("__tp")
        .unionByName(partials))

    val mergedEntry =
      ManifestEntry(Versioned.stage(merged, basePath), Some(touchedSet))
    // the remainder keeps the intersecting dirs' confinement minus the
    // touched values — but only if EVERY intersecting dir was tagged
    val remTag = {
      if (intersecting.forall(_.parts.isDefined)) {
        val u = intersecting.flatMap(_.parts.get).toSet -- touchedSet
        if (u.nonEmpty) Some(u) else None
      } else None
    }
    val remEntries =
      if (remainder.isEmpty) Seq.empty
      else Seq(ManifestEntry(Versioned.stage(remainder, basePath), remTag))
    // a lost CAS leaves the freshly staged dirs orphaned — vacuumable
    // garbage, never visible
    Versioned.publishEntries(spark, basePath, head,
      delEnts ++ carried ++ remEntries :+ mergedEntry,
      Map("batch_id" -> batchId))
  }

  /** Continuous refresh: [[upsertRollup]] per micro-batch, keyed by
    * `(streamName, epochId)` — after a restart from checkpoint,
    * Structured Streaming redelivers the same epoch under the same id,
    * the replay guard no-ops it, and the rollup is EXACTLY-ONCE end to
    * end without Spark's state store (aggregation state lives in the
    * versioned table itself, which is also what makes it queryable
    * mid-stream and durable across stream restarts). `streamName` must
    * be stable across restarts of the same logical stream: epoch ids are
    * per-checkpoint (a fresh checkpoint restarts them at 0), and two
    * streams feeding one rollup must not share a name — either would
    * make a genuinely new batch collide with a recorded id and silently
    * no-op. `options` should carry `checkpointLocation` in production. */
  def rollupStream(stream: DataFrame, basePath: String, streamName: String,
      partitionKey: String, subKeys: Seq[String], measures: Seq[String],
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .options(options)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          upsertRollup(batch.sparkSession, basePath, batch,
            s"stream-$streamName-epoch-$epochId", partitionKey, subKeys,
            measures)
          ()
        }
      }
      .start()
}
