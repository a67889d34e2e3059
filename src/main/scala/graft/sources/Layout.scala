package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical-layout helpers (SURVEY §2.1 S4 sink + 100 TB partitioning
  * strategy): hive-style partitioned parquet for partition pruning, and
  * bucketed tables for shuffle-free co-located joins.
  *
  * At 100 TB these two choices ARE the join/scan strategy: facts
  * partitioned by date land range filters on directories instead of data,
  * and bucketing both sides of a recurring fact↔fact join on the join key
  * removes the shuffle from every downstream query (pay the sort once at
  * write time, reuse it forever).
  */
object Layout {

  /** Write hive-style partitioned parquet. Dynamic partition overwrite:
    * only the partitions present in `df` are replaced — Spark's default
    * static mode would wipe the whole dataset path on incremental loads. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*).parquet(path)

  /** Write a bucketed+sorted managed table. The repartition on the bucket
    * key yields exactly one file per bucket — without it each writer task
    * emits a file per bucket (tasks×buckets small files). Co-bucketed joins
    * then plan with NO shuffle Exchange; the read-side Sort remains unless
    * spark.sql.legacy.bucketedTableScan.outputOrdering is enabled (Spark
    * >=3.0 ignores bucket sort metadata by default). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): Unit =
    df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** [[writeBucketed]] generalized to composite bucket keys and an
    * EXTERNAL location: data lands under `path`, the catalog entry
    * carries the bucket spec (bucketing is catalog metadata — a bare
    * `.parquet(path)` write cannot record it, which is why persistent
    * bucketed datasets are tables). Same one-file-per-bucket repartition
    * discipline as [[writeBucketed]]. */
  def writeBucketedExternal(df: DataFrame, table: String, path: String,
      buckets: Int, keys: Seq[String]): Unit =
    df.repartition(buckets, keys.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Re-register a bucketed EXTERNAL table from its data path — the
    * restore half of [[writeBucketedExternal]] for a session whose
    * catalog does NOT carry the entry (the default in-memory/derby-in-cwd
    * metastore does not survive a restart; the parquet files under `path`
    * do). Bucketing is catalog metadata, so a bare `spark.read.parquet`
    * would lose the bucket spec and every downstream join would re-shuffle
    * the index; this declares the SAME spec the writer used (`buckets` and
    * `keys` must match the save — the files really are hash-bucketed that
    * way, the declaration just restores what the lost catalog knew).
    * Schema is inferred from the files; no-op when the table already
    * exists (same-session loads keep the writer's entry). */
  def registerBucketedExternal(spark: SparkSession, table: String,
      path: String, buckets: Int, keys: Seq[String]): Unit =
    if (!spark.catalog.tableExists(table)) {
      val schema = spark.read.parquet(path).schema
      val keyList = keys.map(k => s"`$k`").mkString(", ")
      spark.sql(
        s"""CREATE TABLE `$table` (${schema.toDDL}) USING parquet
           |CLUSTERED BY ($keyList) SORTED BY ($keyList) INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }

  /** Append half of [[writeBucketedExternal]]: new rows land as NEW
    * correctly-hash-bucketed (and per-file sorted) files alongside the
    * existing ones — the incremental-load path for a persisted bucketed
    * dataset. Spark validates the declared spec against the catalog
    * entry, so a drifted (buckets, keys) call fails instead of silently
    * corrupting co-location. Each append adds one file per non-empty
    * bucket; a fine-grained append cadence should run [[compact]]
    * periodically (write-path hygiene, not an afterthought, at 100 TB). */
  def appendBucketedExternal(df: DataFrame, table: String,
      buckets: Int, keys: Seq[String]): Unit =
    df.repartition(buckets, keys.map(col): _*)
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Small-file compaction: rewrite a parquet dataset into
    * ceil(totalBytes / targetFileBytes) evenly-sized files. Streaming
    * sinks and fine-grained incremental loads accrete thousands of tiny
    * files; at 100 TB that turns scan planning and NameNode/listing into
    * the bottleneck, so periodic compaction is part of the write path, not
    * an afterthought. Round-robin repartition (one shuffle) buys even
    * output sizes — `coalesce` would be shuffle-free but inherits input
    * skew. Writes to a NEW path (compact-then-swap); compacting in place
    * over the files being read is not safe. Returns the file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listFiles(p, true)
    val total = Iterator.continually(bytes)
      .takeWhile(_.hasNext).map(_.next())
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(n).write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }
}
