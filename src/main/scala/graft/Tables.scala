package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md) plus shared expression helpers used across the
  * query catalog.
  *
  * Numeric policy (oracle determinism): money columns are doubles that
  * always carry exactly 2 decimal digits (verified against the data:
  * max |x*100 - round(x*100)| < 1e-8 on every money column). Summing
  * doubles is order-dependent and would break the driver's
  * Spark-vs-DuckDB hash compare, so every SUM/AVG goes through exact
  * integer cents: CAST(ROUND(x*100) AS BIGINT). Final money results are
  * emitted as cents (BIGINT) or as double via a fixed-shape expression
  * (CAST(cents AS DOUBLE)/100.0) that both engines evaluate bit-identically.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped in two vintages: parquet TIMESTAMP(NANOS)
    * (Spark reads it only as a raw nanos long via the legacy conf) and
    * plain timestamp[us] (read as TIMESTAMP_NTZ). Branch on the dtype the
    * reader actually produced so both vintages land on the same
    * micro-precision session-TZ TimestampType column. Anything else fails
    * fast — a catch-all cast would turn a third vintage (or a corrupted
    * file read as STRING) into silent nulls and corrupt the oracle
    * compare. Shared by the batch loader ([[events]]) and the stream
    * source ([[graft.streaming.StreamingEvents.readEventStream]]) so the
    * two normalization paths cannot drift. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` is exact integer division — col/1000 would route through
        // double (ulp 256ns at epoch-nanos magnitude) and mis-truncate
        // ~1.6% of timestamps by 1us vs DuckDB's internal flooring.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ micros: a cast under the pinned-UTC session keeps the wall
        // clock DuckDB sees when it reads the same file.
        df.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType =>
        df // already session-TZ micros: nothing to normalize
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported dtype $other — known vintages are " +
          "TIMESTAMP(NANOS) (long via legacy conf) and timestamp[us] (NTZ)")
    }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ branch above is only correct under UTC; every current entry
    // point pins it, but the loader owns its invariants (same pattern as
    // the nanosAsLong conf) so a future unpinned caller can't shift every
    // timestamp by the local offset
    s.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeEventTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Exact integer cents from a 2-decimal double (order-independent sums). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Cents back to a double amount — fixed shape `CAST(x AS DOUBLE)/100.0`
    * mirrored verbatim in the oracle SQL so both engines produce the same bits. */
  def money(centsCol: Column): Column = centsCol.cast("double") / 100.0

  /** yyyymmdd surrogate date key (reference DimDate pattern,
    * StarSchemaForHealthcare.sql:167). */
  def dateSk(c: Column): Column =
    (year(c) * 10000 + month(c) * 100 + dayofmonth(c)).cast("int")
}
