package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module catalogs; each key has a
  * DuckDB oracle twin in `oracleSql` unless the operator is not
  * SQL-expressible (then the driver records a weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * "Revenue by market segment" — the Spark twin of the reference's
    * "billed vs allowed by plan" report (Claims & Encounters.sql:381-392):
    * fact ⋈ header ⋈ dim, range filter, null-safe money rollup, order.
    */
  def entry(spark: SparkSession): DataFrame = {
    import Tables._
    val d = "/root/testdata/sf0.001"
    lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      .join(orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(cents(col("l_extendedprice"))).as("billed_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("discounted_cents"),
        count(lit(1)).as("line_cnt"))
      .orderBy("c_mktsegment")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ [EXT]). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Windows.queries ++
      graft.queries.Events.queries ++
      graft.queries.Advanced.queries ++
      graft.queries.TpchLike.queries ++
      graft.queries.Extras.queries ++
      graft.queries.Depth.queries ++
      graft.ext.Dedup.queries ++
      graft.ext.TextAnalysis.queries ++
      graft.ext.Similarity.queries ++
      graft.ext.Multimodal.queries ++
      graft.ext.Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Windows.oracle ++
      graft.queries.Events.oracle ++
      graft.queries.Advanced.oracle ++
      graft.queries.TpchLike.oracle ++
      graft.queries.Extras.oracle ++
      graft.queries.Depth.oracle ++
      graft.ext.Dedup.oracle ++
      graft.ext.TextAnalysis.oracle ++
      graft.ext.Similarity.oracle ++
      graft.ext.Multimodal.oracle ++
      graft.ext.Pipeline.oracle
}
