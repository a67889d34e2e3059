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
    // equi-pair with a cross-table date inequality.
    "tpch_q4" -> ((s, d) => orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01")
        && col("o_orderdate") < ts("1996-04-01"))
      .join(lineitem(s, d),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > date_add(col("o_orderdate"), 30),
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
        .filter(col("l_shipdate") > date_add(col("o_orderdate"), 60))
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
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin
  )
}
