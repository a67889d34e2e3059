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

    // Data-quality profile: per-column null counts + distinct cardinality —
    // the pipeline-health operator every large ingest runs first.
    "x_dq_profile" -> ((s, d) => {
      val o = orders(s, d)
      o.agg(
        count(lit(1)).as("row_cnt"),
        sum(when(col("o_custkey").isNull, 1).otherwise(0)).as("null_custkey"),
        sum(when(col("o_orderdate").isNull, 1).otherwise(0)).as("null_orderdate"),
        countDistinct(col("o_custkey")).as("distinct_custkey"),
        countDistinct(col("o_orderstatus")).as("distinct_status"),
        min(cents(col("o_totalprice"))).as("min_price_cents"),
        max(cents(col("o_totalprice"))).as("max_price_cents"))
    }),

    // Expectations-style DQ rule checks: one row per rule with its
    // violation count — the reference's RI-validation idiom (anti-joins
    // expected to return 0) generalized to a rule suite. Each rule is an
    // independent aggregate/anti-join; the union is a report, so expected-0
    // rules stay visible rather than silently absent.
    "x_dq_rules" -> ((s, d) => {
      val li = lineitem(s, d)
      val o = orders(s, d)
      def rule(name: String, violations: DataFrame): DataFrame =
        violations.select(lit(name).as("rule"), col("violations"))
      rule("lineitem.discount_in_0_to_0.3",
          li.agg(sum(when(col("l_discount") < 0 || col("l_discount") > 0.3, 1)
            .otherwise(0)).as("violations")))
        .union(rule("lineitem.orphan_orderkey",
          li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
            .agg(count(lit(1)).as("violations"))))
        .union(rule("lineitem.quantity_positive",
          li.agg(sum(when(col("l_quantity") <= 0, 1).otherwise(0))
            .as("violations"))))
        .union(rule("orders.status_in_domain",
          o.agg(sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1)
            .otherwise(0)).as("violations"))))
        .union(rule("orders.totalprice_positive",
          o.agg(sum(when(col("o_totalprice") <= 0, 1).otherwise(0))
            .as("violations"))))
        .orderBy("rule")
    }),

    // Funnel: per user, did a purchase follow the first click? (conversion)
    "e6_funnel" -> ((s, d) => {
      val e = events(s, d)
      val firstClick = e.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_click_ts"))
      val converted = e.filter(col("event_type") === "purchase")
        .join(firstClick, "user_id")
        .filter(col("ts") >= col("first_click_ts"))
        .select(col("user_id")).distinct()
        .withColumn("converted", lit(1))
      firstClick.join(converted, Seq("user_id"), "left")
        .select(col("user_id"), coalesce(col("converted"), lit(0)).as("converted"))
        .orderBy("user_id")
    }),

    // Deterministic sampling by key modulo (reproducible across runs and
    // engines, unlike rand()-based sampling).
    "a14_sample_mod" -> ((s, d) => lineitem(s, d)
      .filter(pmod(col("l_orderkey"), lit(10)) === 0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("sample_cnt"))
      .orderBy("l_returnflag")),

    // Multiset set ops (bag semantics).
    "u5_intersect_all" -> ((s, d) => {
      val a = lineitem(s, d).select(col("l_suppkey").as("k"))
        .filter(col("l_returnflag") === "R")
      val b = lineitem(s, d).select(col("l_suppkey").as("k"))
        .filter(col("l_returnflag") === "A")
      a.intersectAll(b).groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .orderBy("k")
    }),
    "u6_except_all" -> ((s, d) => {
      val a = lineitem(s, d).select(col("l_suppkey").as("k"))
        .filter(col("l_returnflag") === "R")
      val b = lineitem(s, d).select(col("l_suppkey").as("k"))
        .filter(col("l_returnflag") === "A")
      a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .orderBy("k")
    }),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): keys made
    // nullable via NULLIF so null==null genuinely matches.
    "j16_nullsafe_eq" -> ((s, d) => {
      val a = orders(s, d)
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("P")).as("k"))
      val b = orders(s, d)
        .select(nullif(col("o_orderstatus"), lit("P")).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("status_cnt"))
      a.join(b, a("k") <=> b("k"))
        .groupBy(col("status_cnt"))
        .agg(count(lit(1)).as("order_cnt"))
        .orderBy("status_cnt")
    }),

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
    "x_dq_rules" ->
      """SELECT 'lineitem.discount_in_0_to_0.3' AS rule,
        |  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS violations FROM lineitem
        |UNION ALL
        |SELECT 'lineitem.orphan_orderkey',
        |  CAST(count(*) AS BIGINT) FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'lineitem.quantity_positive',
        |  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'orders.status_in_domain',
        |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |UNION ALL
        |SELECT 'orders.totalprice_positive',
        |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |ORDER BY rule""".stripMargin,
    "x_dq_profile" ->
      """SELECT count(*) AS row_cnt,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderdate,
        |  count(DISTINCT o_custkey) AS distinct_custkey,
        |  count(DISTINCT o_orderstatus) AS distinct_status,
        |  CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_price_cents,
        |  CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_price_cents
        |FROM orders""".stripMargin,
    "e6_funnel" ->
      """WITH fc AS (
        |  SELECT user_id, min(ts) AS first_click_ts FROM events
        |  WHERE event_type = 'click' GROUP BY user_id
        |), conv AS (
        |  SELECT DISTINCT e.user_id FROM events e JOIN fc USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click_ts
        |)
        |SELECT fc.user_id,
        |  CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS converted
        |FROM fc LEFT JOIN conv ON fc.user_id = conv.user_id
        |ORDER BY fc.user_id""".stripMargin,
    "a14_sample_mod" ->
      """SELECT l_returnflag, count(*) AS sample_cnt FROM lineitem
        |WHERE l_orderkey % 10 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "u5_intersect_all" ->
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
        |  INTERSECT ALL
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
        |) GROUP BY k ORDER BY k""".stripMargin,
    "u6_except_all" ->
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
        |  EXCEPT ALL
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
        |) GROUP BY k ORDER BY k""".stripMargin,
    "j16_nullsafe_eq" ->
      """SELECT status_cnt, count(*) AS order_cnt FROM (
        |  SELECT a.o_orderkey, b.status_cnt
        |  FROM (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS k FROM orders) a
        |  JOIN (SELECT nullif(o_orderstatus, 'P') AS k, count(*) AS status_cnt
        |        FROM orders GROUP BY 1) b
        |  ON a.k IS NOT DISTINCT FROM b.k)
        |GROUP BY status_cnt ORDER BY status_cnt""".stripMargin,
    "j15_scalar_subquery" ->
      """SELECT o_orderkey FROM orders
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) > (
        |  SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |    / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin
  )
}
