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
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      // failures are marked -1 so a crashing query can never read as fast
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
