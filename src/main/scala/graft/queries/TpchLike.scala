package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Headline analytics: the classic TPC-H shapes Q1/Q3/Q5/Q10 adapted to the
  * driver testdata's columns (no commitdate/shippriority/comment columns),
  * with the exact-cents money policy for oracle determinism. These are the
  * combined-operator workloads — scan + multi-join + agg + sort in one plan
  * — that exercise the optimizer end-to-end rather than one operator at a
  * time.
  */
object TpchLike {
  type Q = (SparkSession, String) => DataFrame

  private def ts(s: String) = lit(s).cast("timestamp")

  /** Deterministic synthetic partsupp: the testdata ships no partsupp
    * table, so the four partsupp-dependent TPC-H queries (Q2/Q11/Q16/Q20)
    * derive one inline — part × 4 suppliers with pure BIGINT `+ * %`
    * arithmetic (no division: DuckDB's `/` on integers produces DOUBLE)
    * so Spark and the DuckDB oracle synthesize bit-identical rows from
    * the same part/supplier parquet. Supplycost is integer cents in
    * [100, 100000] (the repo-wide exact-cents money policy); the
    * supplier-count modulus comes from a broadcast 1-row aggregate so
    * the same formula holds at every SF.
    */
  def partsupp(s: SparkSession, d: String): DataFrame = {
    val nSupp = supplier(s, d).agg(count(lit(1)).as("n_supp"))
    part(s, d).select(col("p_partkey"))
      .crossJoin(broadcast(nSupp))
      .select(col("p_partkey"), col("n_supp"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      .select(
        col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") + col("i") * 13L) % col("n_supp"))
          .as("ps_suppkey"),
        ((col("p_partkey") * 11L + col("i") * 17L) % 9999L + 1L)
          .as("ps_availqty"),
        ((col("p_partkey") * 7919L + col("i") * 104729L) % 99901L + 100L)
          .as("ps_supplycost_cents"))
  }

  /** The partsupp CTE mirrored verbatim into every partsupp oracle. */
  private val psCte =
    """WITH i4 AS (SELECT CAST(UNNEST(range(4)) AS BIGINT) AS i),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey + i*13) % (SELECT count(*) FROM supplier) AS ps_suppkey,
      |    (p_partkey*11 + i*17) % 9999 + 1 AS ps_availqty,
      |    (p_partkey*7919 + i*104729) % 99901 + 100 AS ps_supplycost_cents
      |  FROM part, i4)""".stripMargin

  val queries: Map[String, Q] = Map(
    // Q1 pricing summary report: one-pass grouped aggregate battery.
    "tpch_q1" -> ((s, d) => lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_cents"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("sum_disc_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")))).as("sum_charge_cents"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),

    // Q3 shipping priority (adapted: no o_shippriority column): top-10
    // unshipped BUILDING orders by revenue.
    "tpch_q3" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < ts("1996-03-15"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > ts("1996-03-15"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .agg(sum(rev).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Q5 local supplier volume: 6-table star with the supplier-customer
    // same-nation equi-constraint; small dims broadcast.
    "tpch_q5" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= ts("1996-01-01")
          && col("o_orderdate") < ts("1997-01-01"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(rev).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }),

    // Q10 returned-item reporting: top-20 customers by lost revenue.
    "tpch_q10" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= ts("1995-10-01")
          && col("o_orderdate") < ts("1996-01-01"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(rev).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q7 volume shipping: bidirectional trade between two nations — a
    // fact-to-fact join chain with two role-playing copies of the nation
    // dim (supplier side vs customer side), grouped by flow direction+year.
    "tpch_q7" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      val n1 = nation(s, d).select(col("n_nationkey").as("s_nkey"),
        col("n_name").as("supp_nation"))
      val n2 = nation(s, d).select(col("n_nationkey").as("c_nkey"),
        col("n_name").as("cust_nation"))
      lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1995-01-01")
          && col("l_shipdate") < ts("1997-01-01"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(sum(rev).as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q14 promo revenue share: conditional-aggregate ratio in one pass.
    // The ratio is one fixed double expression over two exact cent sums.
    "tpch_q14" -> ((s, d) => lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1995-09-01")
        && col("l_shipdate") < ts("1995-10-01"))
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .otherwise(0L)).as("promo_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        (lit(100.0) * col("promo_cents").cast("double")
          / col("total_cents").cast("double")).as("promo_pct"))),

    // Q18 large-volume customers: join back against a grouped-HAVING
    // derived table (the aggregate-then-rejoin shape), top-100 report.
    "tpch_q18" -> ((s, d) => {
      val big = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_cents"))
        .filter(col("sum_qty_cents") > 20000L)
      orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          cents(col("o_totalprice")).as("totalprice_cents"),
          col("sum_qty_cents"))
        .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q9 product-type profit (adapted: no partsupp table in the testdata, so
    // profit = discounted revenue): part-name LIKE filter feeding a 5-way
    // join, grouped by supplier nation × order year. The part filter prunes
    // FIRST (predicate pushdown into the part scan), then lineitem joins the
    // filtered part broadcast — the selective-dimension-first star shape.
    "tpch_q9" -> ((s, d) => lineitem(s, d)
      .join(broadcast(part(s, d).filter(col("p_name").like("%red%"))),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
      .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation(s, d)), col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)),

    // Q4 order-priority checking (adapted: no commitdate/receiptdate in the
    // testdata — "late" = shipped >30 days after order date): correlated
    // EXISTS becomes a left-semi join whose condition mixes the orderkey
    // equi-pair with a cross-table date inequality. The lateness bound is
    // timestamp + INTERVAL (not date_add, which truncates the timestamp to
    // midnight first) so it matches the oracle's `+ INTERVAL n DAY` on any
    // data, not just the fixtures' midnight-only timestamps.
    "tpch_q4" -> ((s, d) => orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01")
        && col("o_orderdate") < ts("1996-04-01"))
      .join(lineitem(s, d),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")),

    // Q21 suppliers-who-kept-orders-waiting (adapted lateness as in Q4):
    // the classic EXISTS + NOT-EXISTS pair with a <> correlation — a
    // left-semi and a left-anti join whose conditions mix the orderkey
    // equi-pair with a suppkey inequality.
    "tpch_q21" -> ((s, d) => {
      val late = lineitem(s, d)
        .join(orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val l1 = late
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(nation(s, d).filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("l_orderkey"), col("l_suppkey"), col("s_name"))
      val l2 = lineitem(s, d)
        .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = late
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      l1
        .join(l2, col("o2") === col("l_orderkey")
          && col("s2") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("o3") === col("l_orderkey")
          && col("s3") =!= col("l_suppkey"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // Q8 national market share (adapted): NATION_5 suppliers' share of
    // AMERICA-region customers' PROMO-part volume by order year. The nation
    // dim plays two roles — supplier side carries the share subject,
    // customer side gates the region — as separate broadcast copies; the
    // share is one double division over two exact cent sums.
    "tpch_q8" -> ((s, d) => {
      val vol = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      val ns = nation(s, d).select(col("n_nationkey").as("s_nkey"),
        col("n_name").as("supp_nation"))
      val nc = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nkey"))
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_type") === "PROMO")
            .select(col("p_partkey"))),
          col("p_partkey") === col("l_partkey"))
        .join(orders(s, d).filter(col("o_orderdate") >= ts("1995-01-01")
            && col("o_orderdate") < ts("1997-01-01")),
          col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(nc), col("c_nationkey") === col("c_nkey"), "left_semi")
        .join(supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(ns), col("s_nationkey") === col("s_nkey"))
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_5", vol).otherwise(0L))
          .as("nation_cents"),
          sum(vol).as("total_cents"))
        .select(col("o_year"), col("nation_cents"), col("total_cents"),
          (col("nation_cents").cast("double")
            / col("total_cents").cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }),

    // Q13 customer order-count distribution (adapted: the comment-pattern
    // exclusion becomes an order-priority exclusion): left join so
    // zero-order customers count as c_count = 0, then an aggregation OVER
    // the first aggregation's output — the double-groupBy shape.
    "tpch_q13" -> ((s, d) => customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)),

    // Q15 top supplier: the scalar-subquery-over-aggregate shape. The
    // per-supplier revenue aggregate feeds both the 1-row max (broadcast
    // back as the filter) and the report join; the two branches rescan the
    // quarter's lineitem rather than sort the whole aggregate through a
    // single-partition window (hash-agg twice beats global sort once).
    "tpch_q15" -> ((s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01")
          && col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("total_revenue_cents"))
      val top = rev.agg(max(col("total_revenue_cents")).as("max_rev"))
      rev.join(broadcast(top), col("total_revenue_cents") === col("max_rev"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_cents"))
        .orderBy(col("s_suppkey"))
    }),

    // Q17 small-quantity-order revenue (adapted: no container column — the
    // selective part filter is brand + size): lineitems under 20% of their
    // part's average quantity. The part filter applies BEFORE the per-part
    // average (the average is per part, so part-level filters commute with
    // it) — the aggregate runs over the selected parts' rows only, not the
    // whole fact table. The threshold compare is exact integer arithmetic
    // (5·qty·cnt < sum_qty): no float threshold crosses the engine boundary.
    "tpch_q17" -> ((s, d) => {
      val li = lineitem(s, d)
        .join(broadcast(part(s, d)
            .filter(col("p_brand") === "Brand#1" && col("p_size") <= 25)
            .select(col("p_partkey"))),
          col("p_partkey") === col("l_partkey"))
      // round-then-cast on BOTH engines: Spark cast('long') truncates while
      // DuckDB CAST(AS BIGINT) rounds — round() first makes them agree on
      // any double input, not just the integral quantities in the testdata
      val qtyInt = round(col("l_quantity")).cast("long")
      val qa = li.groupBy(col("l_partkey").as("agg_pk"))
        .agg(count(lit(1)).as("cnt_qty"), sum(qtyInt).as("sum_qty"))
      li.join(qa, col("agg_pk") === col("l_partkey"))
        .filter(qtyInt * lit(5L) * col("cnt_qty") < col("sum_qty"))
        .agg(sum(cents(col("l_extendedprice"))).as("total_cents"))
        .select(col("total_cents"),
          (col("total_cents").cast("double") / lit(7.0)).as("avg_yearly_cents"))
    }),

    // Q19 discounted revenue under disjunctive brand/size/quantity
    // predicates. The part-only envelope of the OR (brand IN ..., size <=
    // 15) is applied explicitly before the join — Catalyst does not derive
    // cross-branch common predicates from a disjunction — so the broadcast
    // side ships only candidate parts; the full disjunction stays as the
    // residual filter.
    "tpch_q19" -> ((s, d) => lineitem(s, d)
      .join(broadcast(part(s, d)
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            && col("p_size").between(1, 15))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11))
        || (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20))
        || (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_cents"))),

    // Q22 global sales opportunity (adapted: nation name stands in for the
    // phone country code, and "no orders" for "no URGENT orders" — every
    // fixture customer has at least one order at sf<=0.01, which made the
    // original anti-join vacuously empty there and the oracle check
    // meaningless; the urgent-only variant keeps the NOT-EXISTS anti-join
    // shape and survives 2/30/235 customers at sf0.001/0.01/0.1). The
    // positive-balance average is a 1-row aggregate cross-joined back as a
    // threshold; the compare is exact integer arithmetic
    // (cents·count > sum_cents).
    "tpch_q22" -> ((s, d) => {
      val sel = customer(s, d)
        .join(broadcast(nation(s, d)
            .filter(col("n_name").isin("NATION_1", "NATION_4", "NATION_7",
              "NATION_10", "NATION_13", "NATION_16", "NATION_19"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_acctbal"), col("n_name"))
      val thr = sel.filter(col("c_acctbal") > 0.0)
        .agg(count(lit(1)).as("pos_cnt"),
          sum(cents(col("c_acctbal"))).as("pos_sum_cents"))
      sel.crossJoin(broadcast(thr))
        .filter(cents(col("c_acctbal")) * col("pos_cnt") > col("pos_sum_cents"))
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("n_name").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(cents(col("c_acctbal"))).as("totacctbal_cents"))
        .orderBy("cntrycode")
    }),

    // Q2 minimum-cost supplier (adapted: synthetic partsupp, no p_mfgr /
    // address columns): for small LARGE parts, the EUROPE supplier at the
    // per-part minimum supplycost. The correlated MIN subquery becomes a
    // grouped-min rejoin over the SAME filtered euro frame — computed once,
    // both branches reuse it; dims broadcast.
    "tpch_q2" -> ((s, d) => {
      val euro = partsupp(s, d)
        .join(broadcast(supplier(s, d)
            .select(col("s_suppkey"), col("s_name"),
              cents(col("s_acctbal")).as("s_acctbal_cents"),
              col("s_nationkey"))),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)
            .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"), col("ps_supplycost_cents"),
          col("s_name"), col("s_acctbal_cents"), col("n_name"))
      val minc = euro.groupBy(col("ps_partkey").as("min_pk"))
        .agg(min(col("ps_supplycost_cents")).as("min_cost_cents"))
      euro
        .join(minc, col("min_pk") === col("ps_partkey")
          && col("ps_supplycost_cents") === col("min_cost_cents"))
        .join(broadcast(part(s, d)
            .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
            .select(col("p_partkey"), col("p_type"))),
          col("p_partkey") === col("ps_partkey"))
        .select(col("s_acctbal_cents"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_type"), col("ps_supplycost_cents"))
        .orderBy(col("s_acctbal_cents").desc, col("s_name"), col("p_partkey"))
        .limit(100)
    }),

    // Q11 important stock (adapted: synthetic partsupp): per-part inventory
    // value for one nation's suppliers, kept if the part's share exceeds
    // 1.8× the average share — scale-free where the original's 0.0001/SF
    // fraction is not, and an exact integer compare (sum·5·nparts > total·9)
    // so no float threshold crosses the engine boundary. The 1-row
    // total/nparts aggregate broadcasts back over the grouped frame.
    "tpch_q11" -> ((s, d) => {
      val nps = partsupp(s, d)
        .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost_cents") * col("ps_availqty")).as("value_cents"))
      val tot = nps.agg(sum(col("value_cents")).as("total_cents"),
        countDistinct(col("ps_partkey")).as("n_parts"))
      nps.groupBy(col("ps_partkey"))
        .agg(sum(col("value_cents")).as("value_cents"))
        .crossJoin(broadcast(tot))
        .filter(col("value_cents") * lit(5L) * col("n_parts")
          > col("total_cents") * lit(9L))
        .select(col("ps_partkey"), col("value_cents"))
        .orderBy(col("value_cents").desc, col("ps_partkey"))
    }),

    // Q16 parts/supplier relationship (adapted: synthetic partsupp; the
    // "Customer Complaints" comment exclusion becomes the negative-balance
    // suppliers): distinct supplier count per (brand, type, size) bucket.
    // The excluded-supplier set is a broadcast anti-join, not NOT IN.
    "tpch_q16" -> ((s, d) => partsupp(s, d)
      .join(broadcast(part(s, d)
          .filter(col("p_brand") =!= "Brand#1"
            && col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
        col("p_partkey") === col("ps_partkey"))
      .join(broadcast(supplier(s, d).filter(col("s_acctbal") < 0.0)
          .select(col("s_suppkey"))),
        col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))),

    // Q20 potential part promotion (adapted: synthetic partsupp, shipdate
    // year for receiptdate): NATION_2 suppliers whose stock of a red part
    // exceeds half of what they shipped of it in 1996. The correlated
    // quantity subquery becomes a grouped (part,supp) aggregate joined on
    // the composite key; the candidate-supplier set feeds a left-semi join;
    // the threshold compare is exact integer arithmetic (availqty·2 > qty).
    "tpch_q20" -> ((s, d) => {
      val shipped = lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01")
          && col("l_shipdate") < ts("1997-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
      val candidates = partsupp(s, d)
        .join(broadcast(part(s, d).filter(col("p_name").like("red%"))
            .select(col("p_partkey"))),
          col("p_partkey") === col("ps_partkey"))
        .join(shipped, col("l_partkey") === col("ps_partkey")
          && col("l_suppkey") === col("ps_suppkey"))
        .filter(col("ps_availqty") * lit(2L) > col("sum_qty"))
        .select(col("ps_suppkey"))
      supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_2")),
          col("s_nationkey") === col("n_nationkey"))
        .join(candidates, col("ps_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("s_name"), col("s_nationkey"))
        .orderBy("s_name")
    })
  )

  private val revSql =
    "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
         |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
         |  CAST(sum($revSql) AS BIGINT) AS sum_disc_cents,
         |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q3" ->
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |  CAST(sum($revSql) AS BIGINT) AS revenue_cents
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1996-03-15'
         |  AND l_shipdate > TIMESTAMP '1996-03-15'
         |GROUP BY o_orderkey, orderdate
         |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin,
    "tpch_q5" ->
      s"""SELECT n_name, CAST(sum($revSql) AS BIGINT) AS revenue_cents
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(sum($revSql) AS BIGINT) AS revenue_cents
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1995-10-01'
         |  AND o_orderdate < TIMESTAMP '1996-01-01'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,
    "tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year,
         |  CAST(sum($revSql) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch_q14" ->
      s"""SELECT promo_cents, total_cents,
         |  100.0 * CAST(promo_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
         |    AS promo_pct
         |FROM (
         |  SELECT
         |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revSql ELSE 0 END)
         |      AS BIGINT) AS promo_cents,
         |    CAST(sum($revSql) AS BIGINT) AS total_cents
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1995-09-01'
         |    AND l_shipdate < TIMESTAMP '1995-10-01')""".stripMargin,
    "tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
        |  sum_qty_cents
        |FROM orders
        |JOIN (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_qty_cents
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum_qty_cents > 20000) big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice_cents DESC, o_orderkey LIMIT 100""".stripMargin,
    "tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN nation ON n_nationkey = s_nationkey
        |GROUP BY n_name, o_year ORDER BY nation, o_year DESC""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "tpch_q21" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM late l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "tpch_q8" ->
      s"""WITH vol AS (
         |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |    CAST(sum(CASE WHEN ns.n_name = 'NATION_5' THEN $revSql ELSE 0 END) AS BIGINT) AS nation_cents,
         |    CAST(sum($revSql) AS BIGINT) AS total_cents
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation nc ON c_nationkey = nc.n_nationkey
         |  JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'AMERICA'
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         |    AND o_orderdate < TIMESTAMP '1997-01-01'
         |  GROUP BY o_year)
         |SELECT o_year, nation_cents, total_cents,
         |  CAST(nation_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS mkt_share
         |FROM vol ORDER BY o_year""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |        AND o_orderpriority <> '4-NOT SPECIFIED'
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q15" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey, CAST(sum($revSql) AS BIGINT) AS total_revenue_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue_cents
         |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    "tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#1' AND p_size <= 25),
        |qa AS (
        |  SELECT l_partkey AS agg_pk, CAST(count(*) AS BIGINT) AS cnt_qty,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM li GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 7.0 AS avg_yearly_cents
        |FROM li JOIN qa ON agg_pk = l_partkey
        |WHERE CAST(round(l_quantity) AS BIGINT) * 5 * cnt_qty < sum_qty""".stripMargin,
    "tpch_q19" ->
      s"""SELECT CAST(sum($revSql) AS BIGINT) AS revenue_cents
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q22" ->
      """WITH sel AS (
        |  SELECT c_custkey, c_acctbal, n_name
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1','NATION_4','NATION_7','NATION_10',
        |                   'NATION_13','NATION_16','NATION_19')),
        |thr AS (
        |  SELECT CAST(count(*) AS BIGINT) AS pos_cnt,
        |    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS pos_sum_cents
        |  FROM sel WHERE c_acctbal > 0.0)
        |SELECT n_name AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
        |FROM sel, thr
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos_cnt > pos_sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "tpch_q2" ->
      s"""$psCte,
         |euro AS (
         |  SELECT ps_partkey, ps_supplycost_cents, s_name,
         |    CAST(round(s_acctbal*100) AS BIGINT) AS s_acctbal_cents, n_name
         |  FROM partsupp
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE')
         |SELECT s_acctbal_cents, s_name, n_name, p_partkey, p_type,
         |  ps_supplycost_cents
         |FROM euro
         |JOIN part ON p_partkey = ps_partkey
         |  AND p_size <= 15 AND p_type = 'LARGE'
         |WHERE ps_supplycost_cents = (
         |  SELECT min(e2.ps_supplycost_cents) FROM euro e2
         |  WHERE e2.ps_partkey = euro.ps_partkey)
         |ORDER BY s_acctbal_cents DESC, s_name, p_partkey
         |LIMIT 100""".stripMargin,
    "tpch_q11" ->
      s"""$psCte,
         |nps AS (
         |  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS value_cents
         |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3')
         |SELECT ps_partkey, CAST(sum(value_cents) AS BIGINT) AS value_cents
         |FROM nps GROUP BY ps_partkey
         |HAVING sum(value_cents) * 5 * (SELECT count(DISTINCT ps_partkey) FROM nps)
         |  > (SELECT sum(value_cents) FROM nps) * 9
         |ORDER BY value_cents DESC, ps_partkey""".stripMargin,
    "tpch_q16" ->
      s"""$psCte
         |SELECT p_brand, p_type, p_size,
         |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM partsupp JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,10,15,20,25,30,35)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tpch_q20" ->
      s"""$psCte,
         |shipped AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-01-01'
         |  GROUP BY l_partkey, l_suppkey)
         |SELECT s_name, s_nationkey
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_2'
         |WHERE s_suppkey IN (
         |  SELECT ps_suppkey FROM partsupp
         |  JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
         |  JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |  WHERE ps_availqty * 2 > sum_qty)
         |ORDER BY s_name""".stripMargin
  )
}
