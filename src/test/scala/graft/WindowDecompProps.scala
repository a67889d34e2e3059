package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck equivalence proofs for the round-7 window decompositions
  * (w5/w6/w8 shard-offset ranks, w9 ghost-row RANGE): each property
  * materializes a RANDOM table and asserts the registered decomposed
  * query equals the textbook single-key window row for row — the
  * fixture-independent form of the PlanSpec pins. Generators are
  * adversarial on purpose: value pools force heavy ties (tie groups
  * must not split across value-shards), exact shard-boundary values
  * (multiples of the 500-unit shard width and the 100k-cent frame
  * width, where off-by-one in the bucket or an exclusive bound would
  * show), negatives (floor-vs-truncate bucketing), tiny nations, and
  * totals below the tile count (ntile's q=0 degenerate). */
object WindowDecompProps extends Properties("graft.windowdecomp") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session

  private def write(df: DataFrame, name: String): String = {
    val dir = Files.createTempDirectory("graft_wprop").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    dir
  }

  private def rowsEqual(a: Array[org.apache.spark.sql.Row],
      b: Array[org.apache.spark.sql.Row]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => x == y }

  /** Force the DECOMPOSED branch of the r8 size switch while building
    * `got`: these properties exist to fuzz the decompositions, and on
    * the tiny generated tables the registered queries would otherwise
    * take the textbook branch and prove nothing. (PlanSpec pins the
    * below-threshold textbook regime separately.) */
  private def decomposed[A](f: => A): A = {
    val key = "spark.graft.window.decomposeRows"
    spark.conf.set(key, "0")
    try f finally spark.conf.unset(key)
  }

  // heavy-tie pool with exact 500-boundary values and negatives
  private val balPool = Seq(-1000.0, -500.0, -0.01, 0.0, 123.45, 499.99,
    500.0, 500.01, 999.99, 1000.0, 1500.0)
  private val customers: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      nk <- Gen.choose(0L, 3L)
      bal <- Gen.oneOf(balPool)
    } yield (nk, bal))
  } yield rows.zipWithIndex.map { case ((nk, b), i) => (i.toLong, nk, b) }

  private def custDf(rows: List[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal")
  }

  property("w6_ntile == textbook ntile(4), incl. totals below the tile count") =
    forAll(customers) { rows =>
      val df = custDf(rows)
      val dir = write(df, "customer")
      val got = decomposed(SparkEntry.queries("w6_ntile")(spark, dir).collect())
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      val exp = df.select(col("c_custkey"), ntile(4).over(w).as("bal_quartile"))
        .orderBy("c_custkey").collect()
      rowsEqual(got, exp)
    }

  property("w5 rank/dense_rank == textbook nation window under heavy ties") =
    forAll(customers) { rows =>
      val df = custDf(rows)
      val dir = write(df, "customer")
      val got = decomposed(SparkEntry.queries("w5_rank")(spark, dir).collect())
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
      val exp = df.select(col("c_nationkey"), col("c_custkey"),
        rank().over(w).as("bal_rank"),
        dense_rank().over(w).as("bal_dense_rank"))
        .orderBy("c_nationkey", "c_custkey").collect()
      rowsEqual(got, exp)
    }

  property("w8 percent_rank/cume_dist == textbook, bit-exact doubles, incl. 1-row nations") =
    forAll(customers) { rows =>
      val df = custDf(rows)
      val dir = write(df, "customer")
      val got = decomposed(SparkEntry.queries("w8_percent_rank")(spark, dir).collect())
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val exp = df.select(col("c_nationkey"), col("c_custkey"),
        percent_rank().over(w).as("bal_pct_rank"),
        cume_dist().over(w).as("bal_cume_dist"))
        .orderBy("c_nationkey", "c_custkey").collect()
      rowsEqual(got, exp)
    }

  // price pool with pairs exactly one frame width (1000.00 = 100k cents)
  // apart, so the inclusive lower bound is exercised on both sides
  private val pricePool = Seq(10.0, 1000.0, 1010.0, 2000.0, 2010.0,
    2999.99, 3000.0, 3999.99, 4000.0, 123.45)
  private val ordersGen: Gen[List[(Long, String, Double)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      prio <- Gen.oneOf("1-URGENT", "2-HIGH")
      price <- Gen.oneOf(pricePool)
    } yield (prio, price))
  } yield rows.zipWithIndex.map { case ((p, v), i) => (i.toLong, p, v) }

  property("w9 ghost-row RANGE near-sum == textbook, incl. exact frame-boundary prices") =
    forAll(ordersGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      val dir = write(df, "orders")
      val got = decomposed(SparkEntry.queries("w9_range_frame")(spark, dir).collect())
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("price_cents")).rangeBetween(-100000L, 0L)
      val exp = df
        .withColumn("price_cents", Tables.cents(col("o_totalprice")))
        .withColumn("near_sum", sum(col("price_cents")).over(w))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("price_cents"), col("near_sum"))
        .orderBy("o_orderkey").collect()
      rowsEqual(got, exp)
    }
}
