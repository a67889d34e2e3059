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
  *  - `merge-sentinel <base> <dir>` / `delete-sentinel <base> <id>
  *    <dir>` / `mor-delete-sentinel <base> <id> <dir>`: run the DML
  *    under a [[SentinelCommitStore]] — the
  *    cross-process twin of ProtocolSpec's `racing` helper. The FIRST
  *    publish attempt signals `<dir>/child-ready` and BLOCKS until the
  *    parent creates `<dir>/parent-done`, so the parent can land a
  *    conflicting (or composing) commit deterministically INSIDE this
  *    process's optimistic window. Prints `FORKED_MERGED <v>` /
  *    `FORKED_DELETED <v>` on success or `FORKED_ABORTED` when the
  *    rebase correctly refuses.
  */
object Forked {

  /** Delegates to the default rename CAS, but gates the first attempt
    * on a filesystem handshake — deterministic cross-process interleave
    * with no shared memory. */
  private final class SentinelCommitStore(dir: String)
      extends Versioned.CommitStore {
    private val raced = new java.util.concurrent.atomic.AtomicBoolean(false)
    def putIfAbsent(f: org.apache.hadoop.fs.FileSystem,
        tmp: org.apache.hadoop.fs.Path,
        target: org.apache.hadoop.fs.Path): Boolean = {
      if (raced.compareAndSet(false, true)) {
        val d = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(d)
        java.nio.file.Files.createFile(d.resolve("child-ready"))
        val deadline = System.currentTimeMillis() + 120000
        while (!java.nio.file.Files.exists(d.resolve("parent-done"))) {
          Thread.sleep(25)
          require(System.currentTimeMillis() < deadline,
            "sentinel handshake timed out waiting for parent-done")
        }
      }
      Versioned.RenameCommitStore.putIfAbsent(f, tmp, target)
    }
  }
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
      case "merge-sentinel" :: base :: dir :: Nil =>
        try {
          val v = Versioned.withCommitStore(new SentinelCommitStore(dir)) {
            Versioned.mergeInto(spark, base,
              Seq((2L, 222L), (5L, 555L)).toDF("id", "v"),
              keys = Seq("id"), updateCols = Seq("v"))
          }
          println(s"FORKED_MERGED $v")
        } catch {
          case _: java.util.ConcurrentModificationException =>
            println("FORKED_ABORTED")
        }
      case "mor-delete-sentinel" :: base :: id :: dir :: Nil =>
        try {
          val v = Versioned.withCommitStore(new SentinelCommitStore(dir)) {
            Versioned.deleteWhereMor(spark, base, col("id") === id.toLong)
          }
          println(s"FORKED_MORDELETED $v")
        } catch {
          case _: java.util.ConcurrentModificationException =>
            println("FORKED_ABORTED")
        }
      case "delete-sentinel" :: base :: id :: dir :: Nil =>
        try {
          val v = Versioned.withCommitStore(new SentinelCommitStore(dir)) {
            Versioned.deleteWhere(spark, base, col("id") === id.toLong)
          }
          println(s"FORKED_DELETED $v")
        } catch {
          case _: java.util.ConcurrentModificationException =>
            println("FORKED_ABORTED")
        }
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
