package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants for the Depth operators on RANDOM inputs — the
  * contract queries take a data directory, so each case materializes a
  * generated table as parquet and runs the real query end-to-end (IO path
  * included). 5 cases per property; each runs real Spark jobs. */
object DepthProps extends Properties("graft.depth") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session

  private def tempDir(): String =
    Files.createTempDirectory("graft_prop").toString

  private def writeTable(df: DataFrame, dir: String, name: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")

  private val custOrders: Gen[List[(Long, Long, Int)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      cust <- Gen.choose(0L, 5L)
      day <- Gen.choose(0, 400)
    } yield (cust, day.toLong))
  } yield rows.zipWithIndex.map { case ((c, d), i) => (c, i.toLong, d.toInt) }

  property("scd2: one open interval per key, versions chain edge-to-edge") =
    forAll(custOrders) { rows =>
      import spark.implicits._
      val dir = tempDir()
      val orders = rows.toDF("o_custkey", "o_orderkey", "day")
        .select(col("o_custkey"), col("o_orderkey"),
          date_add(lit("1995-01-01").cast("date"), col("day"))
            .cast("timestamp").as("o_orderdate"))
      writeTable(orders, dir, "orders")
      val out = SparkEntry.queries("x_scd2")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getString(2), Option(r.getString(3)), r.getInt(4)))
      val perCust = out.groupBy(_._1)
      out.length == rows.length &&
        perCust.values.forall(_.count(_._5 == 1) == 1) &&
        perCust.values.forall { vs =>
          // rows come back ordered (o_custkey, o_orderkey); re-derive the
          // version order and check each valid_to == next valid_from
          val chain = vs.sortBy(v => (v._3, v._2))
          chain.zip(chain.tail).forall { case (a, b) => a._4.contains(b._3) } &&
            chain.last._4.isEmpty
        }
    }

  private val eventRows: Gen[List[(Long, Int, String)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      day <- Gen.choose(0, 6)
      secs <- Gen.choose(0, 86399)
      typ <- Gen.oneOf("click", "view", "purchase")
    } yield (day * 86400L + secs, day, typ))
  } yield rows.zipWithIndex.map { case ((s, d, t), i) => (s, d, t) }

  property("gapfill: dense grid over observed span, totals preserved") =
    forAll(eventRows) { rows =>
      import spark.implicits._
      val dir = tempDir()
      val base = 1700006400L // fixed epoch anchor, midnight-aligned UTC
      // (misaligned anchor would smear generated "days" across UTC day
      // boundaries and break the span arithmetic below)
      val events = rows.toDF("offset_s", "day", "event_type")
        .select((lit(base) * 1000000000L + col("offset_s") * 1000000000L)
          .as("ts"), col("event_type"))
      writeTable(events, dir, "events")
      val out = SparkEntry.queries("x_gapfill")(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val days = rows.map(_._2)
      val span = days.max - days.min + 1
      val types = rows.map(_._3).distinct.size
      out.length == span * types &&
        out.map(_._3).sum == rows.length &&
        out.forall(_._3 >= 0)
    }

  private val mergeInput: Gen[(List[(Long, Double)], List[(Long, Int)])] = for {
    nc <- Gen.choose(1, 30)
    customers <- Gen.listOfN(nc, Gen.choose(0L, 50L))
    no <- Gen.choose(0, 40)
    orders <- Gen.listOfN(no, for {
      cust <- Gen.choose(0L, 50L)
      day <- Gen.choose(0, 2000)
    } yield (cust, day))
  } yield (customers.distinct.map(c => (c, c * 1.25)), orders)

  property("merge-upsert: actions partition target and source key sets") =
    forAll(mergeInput) { case (custs, ords) =>
      import spark.implicits._
      val dir = tempDir()
      writeTable(custs.toDF("c_custkey", "c_acctbal"), dir, "customer")
      val orders = ords.toDF("o_custkey", "day")
        .select(col("o_custkey"),
          date_add(lit("1994-01-01").cast("date"), col("day"))
            .cast("timestamp").as("o_orderdate"))
      writeTable(orders, dir, "orders")
      val out = SparkEntry.queries("d1_merge_upsert")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val targetKeys = custs.map(_._1).filter(_ % 3 == 0).toSet
      // 1994-01-01 + 1096 days == 1997-01-01 (1996 is a leap year)
      val sourceKeys = ords.filter(_._2 >= 1096).map(_._1).toSet
      val byAction = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      val upd = byAction.getOrElse("update", Set.empty)
      val ins = byAction.getOrElse("insert", Set.empty)
      val keep = byAction.getOrElse("keep", Set.empty)
      (upd ++ keep) == targetKeys && (upd ++ ins) == sourceKeys &&
        upd.intersect(ins).isEmpty && upd.intersect(keep).isEmpty
    }
}
