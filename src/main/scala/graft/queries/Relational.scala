package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The relational operator catalog: one named query per operator row of
  * SURVEY.md §2, expressed Spark-first on the driver's TPC-H-ish tables,
  * each with a DuckDB oracle twin (see `oracle`).
  *
  * Conventions (all required for the driver's hash compare):
  *  - every output column is explicitly aliased, identically in Spark and SQL;
  *  - every query ends in a total-order `orderBy` over a unique key set;
  *  - money aggregates use exact integer cents (Tables.cents) — see Tables
  *    scaladoc for why;
  *  - AVG-like results use the fixed shape CAST(sum AS DOUBLE)/count so both
  *    engines produce identical doubles.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- S: scans / sources (SURVEY §2.1) ----
    // S1 full table scan, fixed projection order.
    "s1_scan" -> ((s, d) => region(s, d)
      .select(col("r_regionkey"), col("r_name"))
      .orderBy("r_regionkey")),

    // S6+A10+U1: CTE-style date harvest — union of date columns, distinct,
    // yyyymmdd key (reference DimDate build, StarSchemaForHealthcare.sql:143-173).
    "s6_cte_dates" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderdate").cast("date").as("dt"))
      val l = lineitem(s, d).select(col("l_shipdate").cast("date").as("dt"))
      o.union(l).distinct()
        .select(dateSk(col("dt")).as("date_sk"))
        .orderBy("date_sk")
    }),

    // S7 view: register a reusable joined view, RENAME it (the reference's
    // sp_rename step, SQLQueryiesPractice.sql:242 — Spark has no temp-view
    // rename, so the emulation is re-register-under-new-name + drop-old),
    // then filter over the renamed view (P10).
    "s7_view" -> ((s, d) => {
      orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .createOrReplaceTempView("vw_customer_orders")
      s.table("vw_customer_orders")
        .createOrReplaceTempView("vw_cust_orders_renamed")
      s.catalog.dropTempView("vw_customer_orders")
      s.table("vw_cust_orders_renamed")
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_orderkey"), col("c_name"))
        .orderBy("o_orderkey")
    }),

    // ---- P: projections / filters (SURVEY §2.2) ----
    "p1_project" -> ((s, d) => customer(s, d)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
      .orderBy("id")),

    "p2_filter_and" -> ((s, d) => customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 1000.0)
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy("c_custkey")),

    "p3_and_or" -> ((s, d) => orders(s, d)
      .filter((col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0)
        || col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
      .orderBy("o_orderkey")),

    "p4_like" -> ((s, d) => part(s, d)
      .filter(col("p_name").like("s%"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy("p_partkey")),

    // P4b: the reference's default T-SQL collation matches LIKE case-
    // insensitively (SQLQueryiesPractice.sql:27-29, 'M%' on mixed-case
    // names); Spark's like() is case-sensitive, so the emulation
    // lower()-normalizes the column — here 'b%' against the upper-case
    // market segments, which a case-sensitive LIKE would match nowhere.
    "p4_like_ci" -> ((s, d) => customer(s, d)
      .filter(lower(col("c_mktsegment")).like("b%"))
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")),

    "p5_in" -> ((s, d) => orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"))
      .orderBy("o_orderkey")),

    "p6_between" -> ((s, d) => orders(s, d)
      .filter(col("o_orderdate").cast("date")
        .between(lit("1996-01-01"), lit("1996-12-31")))
      .select(col("o_orderkey"))
      .orderBy("o_orderkey")),

    // P8 half-open range on the big fact (pushdown-friendly).
    "p8_halfopen" -> ((s, d) => lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")),

    // P7 IS NULL / IS NOT NULL over outer-join-produced nulls — the
    // reference's literal anti-join formulation (LEFT JOIN … WHERE right
    // IS NULL), planned differently from j10's left_anti.
    "p7_null_check" -> ((s, d) => {
      val o96 = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_custkey"), col("o_orderkey"))
      customer(s, d)
        .join(o96, col("c_custkey") === col("o_custkey"), "left")
        .filter(col("o_orderkey").isNull)
        .select(col("c_custkey"))
        .orderBy("c_custkey")
    }),

    // ---- J: joins (SURVEY §2.3) ----
    "j1_inner" -> ((s, d) => orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"))
      .orderBy("o_orderkey")),

    // J2 multi-way star join: fact + 4 dims, small dims broadcast.
    "j2_star" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(rev).as("revenue_cents"), count(lit(1)).as("line_cnt"))
        .orderBy("r_name", "n_name")
    }),

    // J3 left outer + A5 null-skipping COUNT(col) + A6 null-safe SUM.
    "j3_left" -> ((s, d) => {
      val o95 = orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      customer(s, d).join(o95, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("order_cnt"),
          sum(coalesce(cents(col("o_totalprice")), lit(0L))).as("spend_cents"))
        .orderBy("c_custkey")
    }),

    "j4_right" -> ((s, d) => {
      val bigOrders = orders(s, d).filter(col("o_totalprice") > 250000.0)
      bigOrders.join(customer(s, d),
          col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("big_order_cnt"))
        .orderBy("c_custkey")
    }),

    // J5 full outer between two aggregates (nations seen from customer vs
    // supplier side; supplier side is sparse → real nulls on both legs).
    "j5_full" -> ((s, d) => {
      val c = customer(s, d).groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("customer_cnt"))
      val p = supplier(s, d).groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("supplier_cnt"))
      c.join(p, col("ck") === col("sk"), "full")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("customer_cnt"), lit(0L)).as("customer_cnt"),
          coalesce(col("supplier_cnt"), lit(0L)).as("supplier_cnt"))
        .orderBy("nationkey")
    }),

    // J6 cross join against a TOP-n derived table.
    "j6_cross" -> ((s, d) => region(s, d)
      .crossJoin(nation(s, d).orderBy(col("n_nationkey").desc).limit(2)
        .select(col("n_name")))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")),

    // J7 self theta (non-equi) join — BroadcastNestedLoop on a small table,
    // deliberately banded by the key inequality to halve the pair count.
    "j7_theta_self" -> ((s, d) => {
      val a = supplier(s, d).select(col("s_suppkey").as("a_key"),
        col("s_acctbal").as("a_bal"))
      val b = supplier(s, d).select(col("s_suppkey").as("b_key"),
        col("s_acctbal").as("b_bal"))
      a.join(b, col("a_bal") > col("b_bal") && col("a_key") < col("b_key"))
        .select(col("a_key"), col("b_key"))
        .orderBy("a_key", "b_key")
    }),

    // J8 composite-key equi-join + constant conjunct pushed as filter.
    "j8_composite" -> ((s, d) => orders(s, d)
      .join(lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") && col("l_linenumber") === 1)
      .select(col("o_orderkey"), col("l_partkey"), col("l_quantity"))
      .orderBy("o_orderkey")),

    // J9 semi join (EXISTS).
    "j9_semi" -> ((s, d) => {
      val big = orders(s, d).filter(col("o_totalprice") > 300000.0)
      customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // J10 anti join (NOT EXISTS / RI-check shape).
    "j10_anti" -> ((s, d) => {
      val o96 = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      customer(s, d)
        .join(o96, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy("c_custkey")
    }),

    // J12 join on a computed key (yyyymmdd date-key, reference fact-load shape).
    "j12_computed_key" -> ((s, d) => {
      val dim = orders(s, d).select(col("o_orderdate").cast("date").as("dt"))
        .distinct()
        .select(dateSk(col("dt")).as("date_sk"), year(col("dt")).as("yr"))
      orders(s, d).withColumn("date_sk", dateSk(col("o_orderdate").cast("date")))
        .join(dim, "date_sk")
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("order_cnt"))
        .orderBy("yr")
    }),

    // J13 join on a natural non-PK key (fan-out both sides).
    "j13_natural_key" -> ((s, d) => customer(s, d)
      .join(supplier(s, d), col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("pair_cnt"))
      .orderBy("c_nationkey")),

    // J14 join to an aggregated derived table + D1 recompute-style flag
    // (reference UPDATE…FROM, SQLQueryiesPractice.sql:151-159).
    "j14_join_agg" -> ((s, d) => {
      val totals = lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice"))).as("billed_cents"))
      orders(s, d).join(totals, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("billed_cents"),
          when(col("billed_cents") > 20000000L, 1).otherwise(0).as("high_bill_flag"))
        .orderBy("o_orderkey")
    }),

    // ---- A: aggregations (SURVEY §2.4) ----
    // A1 one-pass global agg with COUNT/SUM/AVG/MIN/MAX.
    "a1_global_agg" -> ((s, d) => lineitem(s, d)
      .agg(count(lit(1)).as("cnt"),
        sum(cents(col("l_quantity"))).as("sum_qty_cents"),
        (sum(cents(col("l_quantity"))).cast("double") / count(lit(1)) / 100.0)
          .as("avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))),

    "a2_count" -> ((s, d) => lineitem(s, d).agg(count(lit(1)).as("cnt"))),

    "a3_group_count" -> ((s, d) => orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("o_orderpriority"))),

    "a4_having" -> ((s, d) => orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_cnt"))
      .filter(col("order_cnt") > 15)
      .orderBy("o_custkey")),

    // A7 conditional agg SUM(CASE WHEN…)  + A8 MAX(CASE WHEN…) flag.
    "a7_conditional_agg" -> ((s, d) => lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("returned_cnt"),
        count(lit(1)).as("total_cnt"))
      .orderBy("l_linestatus")),

    "a8_flag_max" -> ((s, d) => orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(when(col("o_totalprice") > 300000.0, 1).otherwise(0))
        .as("has_big_order"))
      .orderBy("o_custkey")),

    "a9_distinct" -> ((s, d) => lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")),

    // ---- U: set operations (SURVEY §2.7) ----
    "u1_union" -> ((s, d) => {
      val c95 = activeCustkeys(s, d, "1995")
      val c96 = activeCustkeys(s, d, "1996")
      c95.union(c96).distinct().orderBy("custkey")
    }),

    // U2 UNION ALL row-count audit (reference StarSchema audit shape).
    "u2_union_all" -> ((s, d) => {
      val counts = Seq(
        ("customer", customer(s, d)), ("lineitem", lineitem(s, d)),
        ("nation", nation(s, d)), ("orders", orders(s, d)),
        ("part", part(s, d)), ("region", region(s, d)),
        ("supplier", supplier(s, d)))
        .map { case (n, df) =>
          df.agg(count(lit(1)).as("cnt")).select(lit(n).as("tbl"), col("cnt")) }
      counts.reduce(_ union _).orderBy("tbl")
    }),

    "u3_intersect" -> ((s, d) =>
      activeCustkeys(s, d, "1995").intersect(activeCustkeys(s, d, "1996"))
        .orderBy("custkey")),

    "u4_except" -> ((s, d) =>
      activeCustkeys(s, d, "1995").except(activeCustkeys(s, d, "1996"))
        .orderBy("custkey")),

    // ---- O: sorts / limits (SURVEY §2.6) ----
    "o1_multisort" -> ((s, d) => supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_acctbal").desc, col("s_name").asc)),

    // O1 twin under the reference's default collation
    // (SQL_Latin1_General_CP1_CI_AS): T-SQL string ORDER BY is
    // case-insensitive, Spark/DuckDB's is binary — the same family as the
    // p4_like_ci filter twin. The testdata's name columns are
    // case-uniform, so case variety is synthesized (upper() on even keys)
    // and the CI position is emitted as a VALUE (`ci_rank`) — the
    // driver's compare sorts rows before hashing, so ordering semantics
    // are only verifiable when encoded in a column; a binary-collation
    // rank would put every upper-cased name first and break the hash.
    // The rank's global window runs over a key-bounded subset (< 100
    // rows at ANY scale factor), the allowlisted tiny-final-pass shape.
    "o1_multisort_ci" -> ((s, d) => supplier(s, d)
      .filter(col("s_suppkey") < 100)
      .select(col("s_suppkey"),
        when(col("s_suppkey") % 2 === 0, upper(col("s_name")))
          .otherwise(col("s_name")).as("s_name_cased"))
      .withColumn("ci_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(lower(col("s_name_cased")), col("s_suppkey"))))
      .orderBy("ci_rank")),

    // O2 TOP-k with a unique tiebreak (TakeOrderedAndProject).
    "o2_topk" -> ((s, d) => orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5)
      .select(col("o_orderkey"), col("o_totalprice"))),

    // O3 pagination OFFSET/FETCH.
    "o3_offset" -> ((s, d) => orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(1).limit(3)
      .select(col("o_orderkey"), col("o_totalprice"))),

    // ---- F: scalar expressions (SURVEY §2.8) ----
    // F1 multi-branch CASE banding.
    "f1_case_banding" -> ((s, d) => orders(s, d)
      .select(when(col("o_totalprice") < 50000.0, "small")
        .when(col("o_totalprice") < 150000.0, "medium")
        .when(col("o_totalprice") < 300000.0, "large")
        .otherwise("jumbo").as("band"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("band")),

    // F5/F6 date parts + yyyymm arithmetic.
    "f6_datekey" -> ((s, d) => orders(s, d)
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("int").as("yyyymm"))
      .groupBy(col("yyyymm"))
      .agg(count(lit(1)).as("order_cnt"))
      .orderBy("yyyymm")),

    // F7 DATEDIFF(day) — note Spark's reversed arg order vs T-SQL.
    "f7_datediff" -> ((s, d) => lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .as("lag_days"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("lag_days")).as("sum_lag_days"),
        count(lit(1)).as("cnt"),
        (sum(col("lag_days")).cast("double") / count(lit(1))).as("avg_lag_days"))
      .orderBy("o_orderpriority")),

    // J11 NOT-EXISTS dedupe-on-insert: append only the 1996 customers not
    // already in the 1995 "target" (the reference's incremental dim-load
    // shape, StarSchemaForHealthcare.sql:177-180).
    "j11_insert_dedupe" -> ((s, d) => {
      val target = activeCustkeys(s, d, "1995")
      val incoming = activeCustkeys(s, d, "1996")
      target.select(col("custkey"), lit("existing").as("src"))
        .union(incoming.join(target, Seq("custkey"), "left_anti")
          .select(col("custkey"), lit("inserted").as("src")))
        .orderBy("custkey")
    }),

    // F: string expressions [EXT] (absent from the reference beyond LIKE).
    "f8_string_funcs" -> ((s, d) => supplier(s, d)
      .select(col("s_suppkey"),
        upper(col("s_name")).as("name_upper"),
        substring(col("s_name"), 1, 8).as("name_prefix"),
        concat_ws("-", col("s_name"), col("s_nationkey")).as("name_key"),
        length(col("s_name")).as("name_len"))
      .orderBy("s_suppkey")),

    // F: scalar-function battery [EXT] — regex replace (Spark replaces all
    // matches; DuckDB needs the 'g' flag to agree), translate, padding,
    // reverse, integer math, n-ary greatest/least.
    "f10_scalar_funcs" -> ((s, d) => supplier(s, d)
      .select(col("s_suppkey"),
        regexp_replace(col("s_name"), "[0-9]+", "#").as("name_masked"),
        translate(col("s_name"), "#_", "--").as("name_trans"),
        lpad(col("s_suppkey").cast("string"), 8, "0").as("key_padded"),
        reverse(col("s_name")).as("name_rev"),
        abs(col("s_nationkey") - 12).as("dist_from_12"),
        pmod(col("s_suppkey"), lit(7)).as("key_mod7"),
        greatest(col("s_suppkey"), col("s_nationkey") * 100).as("g"),
        least(col("s_suppkey"), col("s_nationkey") * 100).as("l"))
      .orderBy("s_suppkey")),

    // F: calendar arithmetic [EXT] — day/month offsets (month addition
    // clamps to month end identically on both engines), last-day,
    // month truncation, Monday-0 weekday.
    "f13_date_funcs" -> ((s, d) => orders(s, d)
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM-dd").as("d"),
        date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd")
          .as("plus_30d"),
        date_format(add_months(to_date(col("o_orderdate")), 2), "yyyy-MM-dd")
          .as("plus_2m"),
        date_format(last_day(to_date(col("o_orderdate"))), "yyyy-MM-dd")
          .as("month_end"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        weekday(col("o_orderdate")).as("weekday_mon0"))
      .orderBy("o_orderkey")),

    // F9 exact-decimal money path: cast to DECIMAL(12,2) before summing —
    // the reference's currency discipline (SURVEY §1.2); Spark widens the
    // sum to DECIMAL(22,2), pinned to (38,2) on both engines.
    "f9_decimal_money" -> ((s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)"))
        .cast("decimal(38,2)").as("total_price"))
      .orderBy("l_returnflag")),

    // ---- D: DML-equivalents as recompute (SURVEY §2.9) ----
    // D2 DELETE…JOIN → anti-join filter (drop lines of 'F'-status orders).
    "d2_delete_anti" -> ((s, d) => {
      val doomed = orders(s, d).filter(col("o_orderstatus") === "F")
      lineitem(s, d)
        .join(doomed, col("l_orderkey") === col("o_orderkey"), "left_anti")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("remaining_cnt"))
        .orderBy("l_returnflag")
    })
  )

  /** Distinct customers with at least one order in the given year. */
  private def activeCustkeys(s: SparkSession, d: String, year: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp")
        && col("o_orderdate") < lit(s"${year.toInt + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey").as("custkey"))
      .distinct()

  /** DuckDB oracle twins (same parquet tables registered by bare name). */
  val oracle: Map[String, String] = Map(
    "s1_scan" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "s6_cte_dates" ->
      """WITH alldates AS (
        |  SELECT CAST(o_orderdate AS DATE) AS dt FROM orders
        |  UNION
        |  SELECT CAST(l_shipdate AS DATE) AS dt FROM lineitem
        |)
        |SELECT CAST(year(dt)*10000 + month(dt)*100 + day(dt) AS INT) AS date_sk
        |FROM alldates ORDER BY date_sk""".stripMargin,
    "s7_view" ->
      """SELECT o_orderkey, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 300000.0 ORDER BY o_orderkey""".stripMargin,
    "p1_project" ->
      """SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
        |FROM customer ORDER BY id""".stripMargin,
    "p2_filter_and" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
        |ORDER BY c_custkey""".stripMargin,
    "p3_and_or" ->
      """SELECT o_orderkey FROM orders
        |WHERE (o_orderstatus = 'F' AND o_totalprice > 200000.0)
        |   OR o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "p4_like" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE 's%' ORDER BY p_partkey""".stripMargin,
    "p4_like_ci" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE lower(c_mktsegment) LIKE 'b%' ORDER BY c_custkey""".stripMargin,
    "p5_in" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey""".stripMargin,
    "p6_between" ->
      """SELECT o_orderkey FROM orders
        |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |ORDER BY o_orderkey""".stripMargin,
    "p8_halfopen" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "p7_null_check" ->
      """SELECT c_custkey FROM customer
        |LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01') o
        |ON c_custkey = o_custkey
        |WHERE o_orderkey IS NULL ORDER BY c_custkey""".stripMargin,
    "j1_inner" ->
      """SELECT o_orderkey, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,
    "j2_star" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS line_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "j3_left" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt,
        |  CAST(sum(coalesce(CAST(round(o_totalprice * 100) AS BIGINT), 0)) AS BIGINT) AS spend_cents
        |FROM customer LEFT JOIN (
        |  SELECT * FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
        |) o ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "j4_right" ->
      """SELECT c_custkey, count(o_orderkey) AS big_order_cnt
        |FROM (SELECT * FROM orders WHERE o_totalprice > 250000.0) o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "j5_full" ->
      """SELECT coalesce(ck, sk) AS nationkey,
        |  coalesce(customer_cnt, 0) AS customer_cnt,
        |  coalesce(supplier_cnt, 0) AS supplier_cnt
        |FROM (SELECT c_nationkey AS ck, count(*) AS customer_cnt FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS sk, count(*) AS supplier_cnt FROM supplier GROUP BY s_nationkey) p
        |ON ck = sk ORDER BY nationkey""".stripMargin,
    "j6_cross" ->
      """SELECT r_name, n_name
        |FROM region CROSS JOIN (
        |  SELECT n_name FROM nation ORDER BY n_nationkey DESC LIMIT 2) n
        |ORDER BY r_name, n_name""".stripMargin,
    "j7_theta_self" ->
      """SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key
        |FROM supplier a JOIN supplier b
        |ON a.s_acctbal > b.s_acctbal AND a.s_suppkey < b.s_suppkey
        |ORDER BY a_key, b_key""".stripMargin,
    "j8_composite" ->
      """SELECT o_orderkey, l_partkey, l_quantity
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey AND l_linenumber = 1
        |ORDER BY o_orderkey""".stripMargin,
    "j9_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "j10_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "j12_computed_key" ->
      """WITH dim AS (
        |  SELECT DISTINCT CAST(year(dt)*10000 + month(dt)*100 + day(dt) AS INT) AS date_sk,
        |    CAST(year(dt) AS INT) AS yr
        |  FROM (SELECT CAST(o_orderdate AS DATE) AS dt FROM orders)
        |)
        |SELECT yr, count(*) AS order_cnt
        |FROM (SELECT CAST(year(CAST(o_orderdate AS DATE))*10000
        |        + month(CAST(o_orderdate AS DATE))*100
        |        + day(CAST(o_orderdate AS DATE)) AS INT) AS date_sk FROM orders) o
        |JOIN dim USING (date_sk)
        |GROUP BY yr ORDER BY yr""".stripMargin,
    "j13_natural_key" ->
      """SELECT c_nationkey, count(*) AS pair_cnt
        |FROM customer JOIN supplier ON c_nationkey = s_nationkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "j14_join_agg" ->
      """SELECT o_orderkey, billed_cents,
        |  CASE WHEN billed_cents > 20000000 THEN 1 ELSE 0 END AS high_bill_flag
        |FROM orders JOIN (
        |  SELECT l_orderkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS billed_cents
        |  FROM lineitem GROUP BY l_orderkey) t
        |ON o_orderkey = l_orderkey ORDER BY o_orderkey""".stripMargin,
    "a1_global_agg" ->
      """SELECT count(*) AS cnt,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS avg_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem""".stripMargin,
    "a2_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "a3_group_count" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority""".stripMargin,
    "a4_having" ->
      """SELECT o_custkey, count(*) AS order_cnt FROM orders
        |GROUP BY o_custkey HAVING count(*) > 15 ORDER BY o_custkey""".stripMargin,
    "a7_conditional_agg" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_cnt,
        |  count(*) AS total_cnt
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "a8_flag_max" ->
      """SELECT o_custkey,
        |  max(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS has_big_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "a9_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "u1_union" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |  UNION
        |  SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |) ORDER BY custkey""".stripMargin,
    "u2_union_all" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS tbl, count(*) AS cnt FROM customer
        |  UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |  UNION ALL SELECT 'nation', count(*) FROM nation
        |  UNION ALL SELECT 'orders', count(*) FROM orders
        |  UNION ALL SELECT 'part', count(*) FROM part
        |  UNION ALL SELECT 'region', count(*) FROM region
        |  UNION ALL SELECT 'supplier', count(*) FROM supplier
        |) ORDER BY tbl""".stripMargin,
    "u3_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY custkey""".stripMargin,
    "u4_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY custkey""".stripMargin,
    "o1_multisort" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |ORDER BY s_acctbal DESC, s_name ASC""".stripMargin,
    "o1_multisort_ci" ->
      """SELECT s_suppkey, s_name_cased,
        |  CAST(row_number() OVER (ORDER BY lower(s_name_cased), s_suppkey) AS INT)
        |    AS ci_rank
        |FROM (
        |  SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 2 = 0 THEN upper(s_name) ELSE s_name END
        |      AS s_name_cased
        |  FROM supplier WHERE s_suppkey < 100)
        |ORDER BY ci_rank""".stripMargin,
    "o2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""".stripMargin,
    "o3_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 3 OFFSET 1""".stripMargin,
    "f1_case_banding" ->
      """SELECT band, count(*) AS cnt FROM (
        |  SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
        |              WHEN o_totalprice < 150000.0 THEN 'medium'
        |              WHEN o_totalprice < 300000.0 THEN 'large'
        |              ELSE 'jumbo' END AS band
        |  FROM orders) GROUP BY band ORDER BY band""".stripMargin,
    "f6_datekey" ->
      """SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS INT) AS yyyymm,
        |  count(*) AS order_cnt
        |FROM orders GROUP BY yyyymm ORDER BY yyyymm""".stripMargin,
    "f7_datediff" ->
      """SELECT o_orderpriority,
        |  CAST(sum(lag_days) AS BIGINT) AS sum_lag_days, count(*) AS cnt,
        |  CAST(sum(lag_days) AS DOUBLE) / count(*) AS avg_lag_days
        |FROM (
        |  SELECT o_orderpriority,
        |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "j11_insert_dedupe" ->
      """WITH target AS (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |), incoming AS (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |)
        |SELECT custkey, src FROM (
        |  SELECT custkey, 'existing' AS src FROM target
        |  UNION ALL
        |  SELECT custkey, 'inserted' AS src FROM incoming
        |  WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.custkey = incoming.custkey)
        |) ORDER BY custkey""".stripMargin,
    "f8_string_funcs" ->
      """SELECT s_suppkey, upper(s_name) AS name_upper,
        |  substring(s_name, 1, 8) AS name_prefix,
        |  concat_ws('-', s_name, s_nationkey) AS name_key,
        |  CAST(length(s_name) AS INT) AS name_len
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "f9_decimal_money" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        |    AS total_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "f10_scalar_funcs" ->
      """SELECT s_suppkey,
        |  regexp_replace(s_name, '[0-9]+', '#', 'g') AS name_masked,
        |  translate(s_name, '#_', '--') AS name_trans,
        |  lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS key_padded,
        |  reverse(s_name) AS name_rev,
        |  CAST(abs(s_nationkey - 12) AS BIGINT) AS dist_from_12,
        |  s_suppkey % 7 AS key_mod7,
        |  greatest(s_suppkey, s_nationkey * 100) AS g,
        |  least(s_suppkey, s_nationkey * 100) AS l
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "f13_date_funcs" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')
        |    AS plus_30d,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d')
        |    AS plus_2m,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
        |    AS month_start,
        |  CAST(isodow(o_orderdate) - 1 AS INT) AS weekday_mon0
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin,
    "d2_delete_anti" ->
      """SELECT l_returnflag, count(*) AS remaining_cnt FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
