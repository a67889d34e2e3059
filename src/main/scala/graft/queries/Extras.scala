package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** [EXT] Remaining Spark surfaces a warehouse user expects: JSON column
  * extraction (events.props), pivot, explode/lateral view, and scalar
  * subqueries — each with a DuckDB oracle twin.
  */
object Extras {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // JSON extraction from the events.props payload column.
    "e5_props_json" -> ((s, d) => events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")),

    // Pivot: order counts per year x orderstatus as columns.
    "a12_pivot" -> ((s, d) => orders(s, d)
      .select(year(col("o_orderdate")).cast("int").as("yr"), col("o_orderstatus"))
      .groupBy(col("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("yr"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .orderBy("yr")),

    // Explode / lateral view: part-name words as rows, word frequencies.
    "a13_explode" -> ((s, d) => part(s, d)
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")),

    // Scalar subquery: orders priced above the global average. The average
    // goes through exact cents so both engines compute the same threshold.
    "j15_scalar_subquery" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sq_orders")
      s.sql(
        """SELECT o_orderkey FROM sq_orders
          |WHERE CAST(round(o_totalprice * 100) AS BIGINT) > (
          |  SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          |    / count(*) FROM sq_orders)
          |ORDER BY o_orderkey""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "e5_props_json" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS INT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a12_pivot" ->
      """SELECT yr,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
        |FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus FROM orders)
        |GROUP BY yr ORDER BY yr""".stripMargin,
    "a13_explode" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY word""".stripMargin,
    "j15_scalar_subquery" ->
      """SELECT o_orderkey FROM orders
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) > (
        |  SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |    / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin
  )
}
