package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Debug mode: `runMain graft.Bench q1 q2` times the named queries twice
    // each (second run separates plan/codegen warmup from data cost).
    if (args.nonEmpty) {
      args.foreach { name =>
        val fn = SparkEntry.queries(name)
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          println(f"[bench-debug] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      spark.stop()
      return
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
