package graft

import java.nio.file.Files
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Storage-layout gates: partition pruning on partitioned writes and
  * shuffle-free joins between co-bucketed tables — the two layout choices
  * that carry the 100 TB design (see Layout scaladoc). */
class LayoutSpec extends SparkSpec {

  test("partitioned write enables partition pruning at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Layout.writePartitioned(li, dir, "l_returnflag")
    val back = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val p = explain(back)
    // non-greedy within the bracket so an empty PartitionFilters: [] fails
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*l_returnflag[^\\]]*\\].*"), p)
    assert(back.count() === li.filter(col("l_returnflag") === "R").count())
  }

  test("compaction collapses a small-file dataset, preserving rows") {
    val in = Files.createTempDirectory("graft_small").toString
    val out = Files.createTempDirectory("graft_compact").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    li.repartition(40).write.mode("overwrite").parquet(in)
    def parquetFiles(d: String): Int =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) === 40)
    val n = Layout.compact(spark, in, s"$out/data", targetFileBytes = 512 * 1024)
    assert(parquetFiles(s"$out/data") === n)
    assert(n < 40, s"expected fewer than 40 files, got $n")
    assert(spark.read.parquet(s"$out/data").count() === li.count())
  }

  test("co-bucketed join plans without a shuffle exchange") {
    // clean any orphan warehouse dirs from interrupted runs
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val os = Tables.orders(spark, "/root/testdata/sf0.001")
    Layout.writeBucketed(li.select("l_orderkey", "l_quantity"),
      "b_lineitem", 8, "l_orderkey")
    Layout.writeBucketed(os.select("o_orderkey", "o_totalprice"),
      "b_orders", 8, "o_orderkey")
    val joined = spark.table("b_lineitem")
      .hint("merge") // force sort-merge: co-bucketing makes it exchange-free
      .join(spark.table("b_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val p = explain(joined)
    assert(!p.contains("Exchange"), p)
    // Sort nodes remain: Spark >=3.0 ignores bucket sort metadata unless
    // spark.sql.legacy.bucketedTableScan.outputOrdering is set; the win
    // that matters (and that we pin) is the missing shuffle Exchange.
    assert(p.contains("SortMergeJoin"), p)
    assert(joined.count() === li.count())
  }
}
