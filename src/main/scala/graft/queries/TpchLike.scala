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
         |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin
  )
}
