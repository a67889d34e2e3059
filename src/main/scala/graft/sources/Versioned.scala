package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned parquet tables: an atomic-manifest snapshot protocol (the
  * public Delta/Iceberg commit shape, reduced to its load-bearing core) —
  * the piece that turns SURVEY §2.9's "transactions are a no-op under the
  * recompute model" into a real capability: writers never mutate what
  * readers see mid-flight, every commit is all-or-nothing, and any past
  * snapshot stays readable until vacuumed.
  *
  * Layout under `basePath`:
  * {{{
  *   data-<uuid>/part-*.parquet     immutable staged data directories
  *   _manifests/v<N>                one line per data directory in snapshot N
  *   _manifests/.tmp-<uuid>         in-flight manifest (invisible: readers
  *                                  only follow v<N> names)
  * }}}
  *
  * The commit protocol: (1) stage the batch into a fresh `data-<uuid>`
  * directory — readers never list data dirs, so half-written files are
  * unreachable, not just unlikely; (2) write the new file list to a `.tmp`
  * manifest; (3) RENAME it to `v<N+1>` — the one atomic step. A crash
  * before (3) leaves only unreferenced garbage (cleaned by [[vacuum]]);
  * after (3) the commit is complete. Concurrent writers: the rename-if-
  * absent is a compare-and-swap on HDFS (rename fails when the target
  * exists), and a loser RE-DERIVES its manifest against the new head
  * before retrying — an append folds the winner's files in rather than
  * clobbering them, and the copy-on-write ops (delete/update/compact)
  * abort with ConcurrentModificationException because their rewrite was
  * derived from a snapshot that is no longer current. On a raw local FS
  * or an object store the rename can clobber, so multi-writer
  * deployments put step (3) behind a conditional put / lock service
  * exactly as the public lakehouse formats do — the on-disk protocol is
  * unchanged.
  *
  * Snapshot isolation falls out of immutability: data directories are
  * never rewritten (append commits add NEW dirs; overwrite commits just
  * reference fewer), so a reader that resolved version N keeps reading
  * exactly N's files however many commits land after it.
  */
object Versioned {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    FsUtil.fs(spark, p)

  private def manifestDir(basePath: String) = new Path(basePath, "_manifests")

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, basePath: String): Seq[Long] = {
    val dir = manifestDir(basePath)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong).sorted
  }

  private def manifestLines(spark: SparkSession, basePath: String,
      v: Long): Seq[String] = {
    val p = new Path(manifestDir(basePath), s"v$v")
    val f = fs(spark, p)
    require(f.exists(p), s"version $v does not exist under $basePath")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  private def manifestFiles(spark: SparkSession, basePath: String,
      v: Long): Seq[String] =
    manifestLines(spark, basePath, v).filterNot(_.startsWith("#"))

  /** Commit metadata (`#key=value` manifest lines) — rides in the SAME
    * atomic rename as the file list, so "this batch was ingested" and
    * "this batch's data is visible" are one indivisible fact: the replay
    * guard incremental consumers need for batch-level exactly-once. */
  def commitMeta(spark: SparkSession, basePath: String,
      v: Long): Map[String, String] =
    manifestLines(spark, basePath, v)
      .filter(_.startsWith("#"))
      .flatMap { l =>
        l.drop(1).split("=", 2) match {
          case Array(k, value) => Some(k -> value)
          case _ => None
        }
      }.toMap

  /** Atomically publish the next version. `mkFiles(headVersion,
    * headFiles)` derives the manifest contents and is RE-EVALUATED
    * against the refreshed head on every CAS attempt — a writer that
    * loses a race re-derives (an append folds in the winner's files)
    * instead of renaming its stale list over the winner's commit, which
    * would be a silent lost update. `mkFiles` may throw to abort (the
    * optimistic-conflict path of the copy-on-write ops). */
  private def writeManifest(spark: SparkSession, basePath: String,
      mkFiles: (Long, Seq[String]) => Seq[String],
      meta: Map[String, String] = Map.empty): Long = {
    meta.foreach { case (k, v) =>
      require(!k.contains("=") && !(k + v).exists(c => c == '\n' || c == '\r'),
        s"commit meta must be line-safe with '='-free keys: ($k, $v)")
    }
    val mdir = manifestDir(basePath)
    val f = fs(spark, mdir)
    f.mkdirs(mdir)
    var attempts = 0
    var committed = -1L
    while (committed < 0) {
      attempts += 1
      require(attempts <= 100,
        s"manifest CAS did not converge after 100 attempts under $basePath")
      val head = versions(spark, basePath).lastOption
      val prev = head.map(manifestFiles(spark, basePath, _))
        .getOrElse(Seq.empty)
      val dirs = mkFiles(head.getOrElse(0L), prev)
      val lines = meta.toSeq.sortBy(_._1)
        .map { case (k, v) => s"#$k=$v" } ++ dirs
      val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val v = head.getOrElse(0L) + 1
      if (f.rename(tmp, new Path(mdir, s"v$v"))) committed = v
      else f.delete(tmp, false) // lost the race — re-derive and retry
    }
    committed
  }

  /** Commit `df` as the next version. `Overwrite` (default): the new
    * snapshot is exactly this batch. `Append`: the new snapshot is the
    * HEAD AT PUBLICATION TIME plus this batch (re-derived under the CAS,
    * so concurrent appends compose instead of clobbering) — the staged
    * directory is the only data written either way. `expectedHead`
    * (copy-on-write callers): abort with ConcurrentModificationException
    * if another commit landed since the caller read that head — the
    * rewrite was derived from a snapshot that is no longer current.
    * Returns the committed version. */
  def commit(df: DataFrame, basePath: String,
      mode: SaveMode = SaveMode.Overwrite,
      expectedHead: Option[Long] = None,
      meta: Map[String, String] = Map.empty): Long = {
    require(mode == SaveMode.Overwrite || mode == SaveMode.Append,
      s"versioned commits are Overwrite or Append, got $mode")
    val spark = df.sparkSession
    // fully qualified from the start: manifests are compared textually
    // against qualified listing paths (vacuum), so one canonical form
    val raw = new Path(basePath, s"data-${java.util.UUID.randomUUID()}")
    val dataDir = fs(spark, raw).makeQualified(raw)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    writeManifest(spark, basePath, (head, prev) => {
      expectedHead.filter(_ != head).foreach { e =>
        throw new java.util.ConcurrentModificationException(
          s"commit derived from v$e but head is v$head under $basePath — " +
            "re-read the snapshot and retry")
      }
      if (mode == SaveMode.Append) prev :+ dataDir.toString
      else Seq(dataDir.toString)
    }, meta)
  }

  /** Read a specific committed snapshot (time travel). `mergeSchema`:
    * append batches may ADD columns over time; the union schema is
    * reconciled across the snapshot's files, older files reading the new
    * columns as null — schema evolution without rewriting history. */
  def readVersion(spark: SparkSession, basePath: String, v: Long): DataFrame = {
    val dirs = manifestFiles(spark, basePath, v)
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  /** Latest committed version, with a clear error on an uninitialized
    * table (a bare `versions(...).last` would NoSuchElement with no
    * mention of the path). */
  private def headVersion(spark: SparkSession, basePath: String): Long = {
    val vs = versions(spark, basePath)
    require(vs.nonEmpty, s"no committed versions under $basePath")
    vs.last
  }

  /** Read the latest committed snapshot. */
  def read(spark: SparkSession, basePath: String): DataFrame =
    readVersion(spark, basePath, headVersion(spark, basePath))

  /** Undo without copying data: commit a NEW version whose manifest is
    * version `v`'s file list. History stays linear and complete. */
  def rollbackTo(spark: SparkSession, basePath: String, v: Long): Long = {
    val target = manifestFiles(spark, basePath, v)
    writeManifest(spark, basePath, (_, _) => target)
  }

  /** Copy-on-write DELETE: publish a new version without the matching
    * rows — the transactional form of the engine's anti-join delete
    * (SURVEY §2.9 D2): readers see the old snapshot until the commit
    * lands, then the new one, never a half-deleted table, and the
    * pre-delete version stays readable for audit/undo until vacuumed. */
  def deleteWhere(spark: SparkSession, basePath: String,
      cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    // SQL DELETE semantics: remove rows where cond is TRUE; rows where
    // cond is NULL are kept (a bare !cond would silently drop them).
    // expectedHead: the rewrite is derived from THIS head — a concurrent
    // commit in between must abort it, not be silently overwritten.
    val head = headVersion(spark, basePath)
    commit(readVersion(spark, basePath, head)
      .filter(not(coalesce(cond, lit(false)))), basePath,
      expectedHead = Some(head))
  }

  /** Copy-on-write UPDATE: publish a new version with `assignments`
    * applied to the rows matching `cond` (the D1 UPDATE…WHERE form,
    * transactionally). Each assignment column keeps its old value where
    * the condition does not hold. */
  def updateWhere(spark: SparkSession, basePath: String,
      cond: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Long = {
    val head = headVersion(spark, basePath)
    val cur = readVersion(spark, basePath, head)
    val updated = assignments.foldLeft(cur) { case (df, (c, e)) =>
      df.withColumn(c,
        org.apache.spark.sql.functions.when(cond, e).otherwise(df(c)))
    }
    commit(updated, basePath, expectedHead = Some(head))
  }

  /** Streaming publication: every micro-batch lands as ONE atomic append
    * commit, so downstream readers always see a complete snapshot — never
    * a half-written batch (the plain `parquet` streaming sink exposes
    * in-progress files to any reader that lists mid-write). Delivery is
    * at-least-once at the batch boundary on restart-without-checkpoint,
    * same as every foreachBatch sink; with checkpointing the batch IDs
    * make replays idempotent at the commit level (a replayed batch is a
    * new commit of the same rows — dedup downstream or key the batch).
    * Returns the started query; caller owns its lifecycle. */
  def commitStream(stream: org.apache.spark.sql.DataFrame,
      basePath: String, options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .options(options) // production callers pass checkpointLocation here
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { commit(batch, basePath, SaveMode.Append); () }
      }
      .start()

  /** Compaction INSIDE the protocol: rewrite the latest snapshot into
    * `targetFiles` evenly-sized files and publish it as a new version.
    * Readers never see a half-compacted table (the rewrite is just
    * another atomic commit), prior versions stay readable until
    * [[vacuum]], and an append-heavy [[commitStream]] table gets its
    * small files folded away without a write lock. */
  def compactLatest(spark: SparkSession, basePath: String,
      targetFiles: Int): Long = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val head = headVersion(spark, basePath)
    commit(readVersion(spark, basePath, head).repartition(targetFiles),
      basePath, expectedHead = Some(head))
  }

  /** GC: drop manifests older than the last `keepVersions` and delete
    * every `data-*` directory no kept manifest references (including
    * crash-orphaned staging dirs that never made it into any manifest).
    * `minAgeMs` is the in-flight-commit guard: an unreferenced dir is
    * reaped only when older than the retention horizon, because a FULLY
    * STAGED dir may belong to a commit whose manifest has not renamed in
    * yet — a newest-manifest-mtime guard would reap it the moment any
    * other commit lands (the same reason every lakehouse vacuum uses a
    * retention PERIOD, hours by default, not head time). Readers of
    * vacuumed-away versions break — the documented retention trade. */
  def vacuum(spark: SparkSession, basePath: String,
      keepVersions: Int = 2,
      minAgeMs: Long = 24L * 60 * 60 * 1000): Unit = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val base = new Path(basePath)
    val f = fs(spark, base)
    val vs = versions(spark, basePath)
    if (vs.isEmpty) return
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val referenced = keep.flatMap(manifestFiles(spark, basePath, _)).toSet
    val horizon = System.currentTimeMillis() - minAgeMs
    f.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("data-"))
      .filterNot(s => referenced.contains(s.getPath.toString))
      .filter(_.getModificationTime < horizon)
      .foreach(s => f.delete(s.getPath, true))
    drop.foreach(v => f.delete(new Path(manifestDir(basePath), s"v$v"), false))
  }
}
