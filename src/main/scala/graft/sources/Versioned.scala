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
  * exists → re-read N and retry); on a raw local FS or an object store the
  * rename can clobber, so multi-writer deployments put step (3) behind a
  * conditional put / lock service exactly as the public lakehouse formats
  * do — the on-disk protocol is unchanged.
  *
  * Snapshot isolation falls out of immutability: data directories are
  * never rewritten (append commits add NEW dirs; overwrite commits just
  * reference fewer), so a reader that resolved version N keeps reading
  * exactly N's files however many commits land after it.
  */
object Versioned {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(basePath: String) = new Path(basePath, "_manifests")

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, basePath: String): Seq[Long] = {
    val dir = manifestDir(basePath)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong).sorted
  }

  private def manifestFiles(spark: SparkSession, basePath: String,
      v: Long): Seq[String] = {
    val p = new Path(manifestDir(basePath), s"v$v")
    val f = fs(spark, p)
    require(f.exists(p), s"version $v does not exist under $basePath")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  private def writeManifest(spark: SparkSession, basePath: String,
      dirs: Seq[String]): Long = {
    val mdir = manifestDir(basePath)
    val f = fs(spark, mdir)
    f.mkdirs(mdir)
    val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(dirs.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // CAS loop: claim the next version name; on HDFS rename-to-existing
    // fails and we retry against the refreshed head (see scaladoc for the
    // multi-writer caveat on stores without atomic exclusive rename)
    var v = versions(spark, basePath).lastOption.getOrElse(0L) + 1
    while (!f.rename(tmp, new Path(mdir, s"v$v"))) {
      val head = versions(spark, basePath).lastOption.getOrElse(0L)
      require(head >= v, s"manifest rename failed for v$v with head at $head")
      v = head + 1
    }
    v
  }

  /** Commit `df` as the next version. `Overwrite` (default): the new
    * snapshot is exactly this batch. `Append`: the new snapshot is the
    * previous one plus this batch — the staged directory is the only
    * data written either way. Returns the committed version. */
  def commit(df: DataFrame, basePath: String,
      mode: SaveMode = SaveMode.Overwrite): Long = {
    require(mode == SaveMode.Overwrite || mode == SaveMode.Append,
      s"versioned commits are Overwrite or Append, got $mode")
    val spark = df.sparkSession
    // fully qualified from the start: manifests are compared textually
    // against qualified listing paths (vacuum), so one canonical form
    val raw = new Path(basePath, s"data-${java.util.UUID.randomUUID()}")
    val dataDir = fs(spark, raw).makeQualified(raw)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    val prev =
      if (mode == SaveMode.Append)
        versions(spark, basePath).lastOption
          .map(manifestFiles(spark, basePath, _)).getOrElse(Seq.empty)
      else Seq.empty
    writeManifest(spark, basePath, prev :+ dataDir.toString)
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

  /** Read the latest committed snapshot. */
  def read(spark: SparkSession, basePath: String): DataFrame = {
    val vs = versions(spark, basePath)
    require(vs.nonEmpty, s"no committed versions under $basePath")
    readVersion(spark, basePath, vs.last)
  }

  /** Undo without copying data: commit a NEW version whose manifest is
    * version `v`'s file list. History stays linear and complete. */
  def rollbackTo(spark: SparkSession, basePath: String, v: Long): Long =
    writeManifest(spark, basePath, manifestFiles(spark, basePath, v))

  /** Copy-on-write DELETE: publish a new version without the matching
    * rows — the transactional form of the engine's anti-join delete
    * (SURVEY §2.9 D2): readers see the old snapshot until the commit
    * lands, then the new one, never a half-deleted table, and the
    * pre-delete version stays readable for audit/undo until vacuumed. */
  def deleteWhere(spark: SparkSession, basePath: String,
      cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    // SQL DELETE semantics: remove rows where cond is TRUE; rows where
    // cond is NULL are kept (a bare !cond would silently drop them)
    commit(read(spark, basePath)
      .filter(not(coalesce(cond, lit(false)))), basePath)
  }

  /** Copy-on-write UPDATE: publish a new version with `assignments`
    * applied to the rows matching `cond` (the D1 UPDATE…WHERE form,
    * transactionally). Each assignment column keeps its old value where
    * the condition does not hold. */
  def updateWhere(spark: SparkSession, basePath: String,
      cond: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Long = {
    val cur = read(spark, basePath)
    val updated = assignments.foldLeft(cur) { case (df, (c, e)) =>
      df.withColumn(c,
        org.apache.spark.sql.functions.when(cond, e).otherwise(df(c)))
    }
    commit(updated, basePath)
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
    commit(read(spark, basePath).repartition(targetFiles), basePath)
  }

  /** GC: drop manifests older than the last `keepVersions` and delete
    * every `data-*` directory no kept manifest references (including
    * crash-orphaned staging dirs that never made it into any manifest).
    * Readers of vacuumed-away versions break — that is the documented
    * retention trade, same as any lakehouse vacuum. */
  def vacuum(spark: SparkSession, basePath: String,
      keepVersions: Int = 2): Unit = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val base = new Path(basePath)
    val f = fs(spark, base)
    val vs = versions(spark, basePath)
    if (vs.isEmpty) return
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val referenced = keep.flatMap(manifestFiles(spark, basePath, _)).toSet
    f.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("data-"))
      .filterNot(s => referenced.contains(s.getPath.toString))
      // staged dirs could belong to an IN-FLIGHT commit whose manifest
      // hasn't landed yet: only reap dirs older than the newest kept
      // manifest, the same modification-time guard lakehouse vacuums use
      .filter { s =>
        val headTime = f.getFileStatus(
          new Path(manifestDir(basePath), s"v${keep.last}")).getModificationTime
        s.getModificationTime < headTime
      }
      .foreach(s => f.delete(s.getPath, true))
    drop.foreach(v => f.delete(new Path(manifestDir(basePath), s"v$v"), false))
  }
}
