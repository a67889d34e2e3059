package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ground-truth checks for the round-2 Depth operators (the DuckDB oracle
  * pins cross-engine equality; these pin the semantics themselves). */
class DepthSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("a17_variance integer-sum derivation matches Spark's var_samp") {
    val ours = q("a17_variance").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val ref = Tables.lineitem(spark, sf)
      .withColumn("c", Tables.cents(col("l_extendedprice")).cast("double"))
      .groupBy(col("l_returnflag")).agg(var_samp(col("c")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) / ref(k) < 1e-9, s"$k: $v vs ${ref(k)}")
    }
  }

  test("a15_percentiles: ordered, and p50 matches a direct sorted-array median") {
    val rows = q("a15_percentiles").collect()
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
    val flag = rows.head.getString(0)
    val vals = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === flag)
      .select(Tables.cents(col("l_extendedprice")))
      .collect().map(_.getLong(0)).sorted
    val idx = 0.5 * (vals.length - 1)
    val expect = vals(idx.toInt) +
      (vals(math.ceil(idx).toInt) - vals(idx.toInt)) * (idx - idx.toInt)
    assert(rows.head.getDouble(2) === expect)
  }

  test("x_scd2: one open interval per customer, versions chain without overlap") {
    val out = q("x_scd2")
    val byCust = out.groupBy(col("o_custkey"))
      .agg(sum(col("is_current")).as("open_cnt"), count(lit(1)).as("n"))
      .collect()
    assert(byCust.forall(_.getLong(1) === 1L)) // exactly one current version
    // valid_to (when present) never precedes valid_from
    assert(out.filter(col("valid_to") < col("valid_from")).count() === 0)
    // versions per customer == orders per customer
    val orderCnt = Tables.orders(spark, sf).count()
    assert(out.count() === orderCnt)
  }

  test("d1_merge_upsert: actions partition target and source key sets") {
    val out = q("d1_merge_upsert").cache()
    val target = Tables.customer(spark, sf)
      .filter(pmod(col("c_custkey"), lit(3)) === 0).count()
    val source = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct().count()
    val byAction = out.groupBy(col("action")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAction.getOrElse("update", 0L) + byAction.getOrElse("keep", 0L) === target)
    assert(byAction.getOrElse("update", 0L) + byAction.getOrElse("insert", 0L) === source)
    // inserts carry no target balance; keeps carry no source orders
    assert(out.filter(col("action") === "insert" && col("acct_cents") =!= 0).count() === 0)
    assert(out.filter(col("action") === "keep" && col("o_cnt") =!= 0).count() === 0)
  }

  test("x_gapfill: dense day x type grid, zero-filled, totals preserved") {
    val out = q("x_gapfill").cache()
    val e = Tables.events(spark, sf)
    val days = e.select(to_date(col("ts"))).distinct().count()
    val types = e.select(col("event_type")).distinct().count()
    // the observed range is dense in this data, so days == spine length
    assert(out.count() === days * types)
    val total = out.agg(sum(col("cnt"))).collect().head.getLong(0)
    assert(total === e.count())
  }

  test("w9_range_frame agrees with a direct quadratic computation per partition") {
    val rows = q("w9_range_frame")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("price_cents"), col("near_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val prices = rows.map(_._1)
    rows.foreach { case (p, got) =>
      val expect = prices.filter(x => x >= p - 100000 && x <= p).sum
      assert(got === expect, s"price $p")
    }
  }

  test("tpch_q6: shipdate/discount/quantity filters reach the parquet scan") {
    val p = explain(q("tpch_q6"))
    assert(p.matches("(?s).*PushedFilters:.*l_shipdate.*"), p)
    assert(p.matches("(?s).*PushedFilters:.*l_discount.*"), p)
    assert(p.matches("(?s).*PushedFilters:.*l_quantity.*"), p)
  }

  test("a16_count_distinct counts agree with per-column distinct queries") {
    val li = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
    val row = q("a16_count_distinct")
      .filter(col("l_returnflag") === "R").collect().head
    assert(row.getLong(1) === li.select(col("l_suppkey")).distinct().count())
    assert(row.getLong(3) === li.select(col("l_orderkey")).distinct().count())
  }
}
