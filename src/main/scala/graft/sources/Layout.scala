package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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

  /** Write hive-style partitioned parquet (dynamic partitions). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Write a bucketed+sorted managed table (bucket pruning + shuffle-free
    * joins between tables bucketed on the same key/count). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  def readPartitioned(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
}
