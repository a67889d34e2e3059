package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness (manual, not part of the driver contract): runs
  * headline aggregate/join shapes over the sf0.1 lineitem replicated K× by
  * in-memory union (orderkeys offset per replica so join/group cardinality
  * scales too — ~6M lineitem rows at K=10). Measures whether the data-cost
  * curve stays linear past the largest driver scale factor; results are
  * recorded in ROUND2_NOTES.md. */
object Stress {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, keyCols: Seq[String]): DataFrame = {
      val offset = 100000000L
      (0 until k).map { i =>
        keyCols.foldLeft(df)((acc, c) =>
          acc.withColumn(c, col(c) + lit(i * offset)))
      }.reduce(_ union _)
    }

    val li = replicate(Tables.lineitem(spark, d), Seq("l_orderkey"))
      .cache()
    val ord = replicate(Tables.orders(spark, d), Seq("o_orderkey"))
      .cache()
    println(s"[stress] lineitem=${li.count()} orders=${ord.count()} (k=$k)")

    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[stress] $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }

    time("q1_agg_battery") {
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(Tables.cents(col("l_extendedprice"))), count(lit(1)))
        .count()
    }
    time("q6_filter_sum") {
      li.filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(round(col("l_extendedprice") * col("l_discount") * 10000)
          .cast("long"))).count()
    }
    time("join_agg_fact_to_fact") {
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(Tables.cents(col("l_extendedprice"))), count(lit(1)))
        .count()
    }
    time("window_topn_per_order") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      li.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2).count()
    }
    spark.stop()
  }
}
