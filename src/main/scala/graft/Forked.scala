package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.sources.Versioned

/** Cross-process harness for the versioned-table protocol: a tiny main
  * the concurrency specs fork as a REAL second JVM (own SparkSession,
  * own process, nothing shared but the table directory), so the
  * commit-store CAS, the rebase matrix, and the durable reader leases
  * are exercised across actual process boundaries — the in-process
  * CommitStore shims in ProtocolSpec drive every branch
  * deterministically, and this closes the remaining gap they cannot:
  * two JVMs whose only coordination is the filesystem.
  *
  * Commands (each prints a sentinel the parent watches for):
  *  - `append <base> <fromId> <n> <batches>`: `batches` sequential
  *    append commits of `n` rows each, ids from `fromId` — prints
  *    `FORKED_APPENDED <versions...>`.
  *  - `pin <base> <releaseFile>`: pin the current head (writes the
  *    durable lease), print `FORKED_PINNED <v>`, hold until
  *    `releaseFile` appears, close the lease, print `FORKED_RELEASED`.
  */
object Forked {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    args.toList match {
      case "append" :: base :: fromId :: n :: batches :: Nil =>
        val vs = (0 until batches.toInt).map { b =>
          val lo = fromId.toLong + b.toLong * n.toLong
          Versioned.commit(
            (lo until lo + n.toLong).map(i => (i, i * 10L)).toDF("id", "v"),
            base, org.apache.spark.sql.SaveMode.Append)
        }
        println(s"FORKED_APPENDED ${vs.mkString(",")}")
      case "pin" :: base :: releaseFile :: Nil =>
        val lease = Versioned.pinSnapshot(spark, base)
        println(s"FORKED_PINNED ${lease.version}")
        System.out.flush()
        val release = java.nio.file.Paths.get(releaseFile)
        while (!java.nio.file.Files.exists(release)) {
          Thread.sleep(50)
          lease.renew()
        }
        lease.close()
        println("FORKED_RELEASED")
      case other =>
        System.err.println(s"Forked: unknown command $other")
        sys.exit(2)
    }
    System.out.flush()
    spark.stop()
  }
}
