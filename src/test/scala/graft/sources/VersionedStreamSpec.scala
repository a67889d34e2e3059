package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.SparkSpec

/** The streaming READ source over versioned tables
  * (`format("graft-versioned")`): initial snapshot, incremental
  * append windows, exactly-once across checkpoint restart (dogfooded
  * through `commitStream`'s ledgered sink — versioned→versioned
  * replication survives a stop/restart with no dupes, no holes), the
  * cdc mode's signed feed, the append-mode removal gate, and the
  * startingVersion / maxVersionsPerTrigger knobs. */
class VersionedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(): String =
    java.nio.file.Files.createTempDirectory("graft_vstream").toString + "/t"
  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_vstream").toString

  private def readVs(path: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.readStream.format("graft-versioned")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(path)

  private def drain(q: StreamingQuery): Unit = {
    q.processAllAvailable(); q.stop(); q.awaitTermination()
  }

  test("append mode: initial snapshot, then incremental windows, once each") {
    val src = freshBase()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), src)
    val q1 = readVs(src).writeStream.format("memory")
      .queryName("vs_append").start()
    q1.processAllAvailable()
    assert(spark.table("vs_append").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")), "initial batch = the full snapshot")

    Versioned.commit(Seq((3L, "c")).toDF("id", "s"), src,
      org.apache.spark.sql.SaveMode.Append)
    Versioned.commit(Seq((4L, "d")).toDF("id", "s"), src,
      org.apache.spark.sql.SaveMode.Append)
    drain(q1)
    assert(spark.table("vs_append").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(spark.table("vs_append").count() === 4,
      "each row delivered exactly once")
  }

  test("exactly-once across restart: versioned->versioned replication") {
    val src = freshBase(); val dst = freshBase(); val ckpt = freshDir()
    Versioned.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), src)

    def replicate(): StreamingQuery =
      Versioned.commitStream(readVs(src), dst, "repl",
        Map("checkpointLocation" -> ckpt))

    val q1 = replicate()
    q1.processAllAvailable()
    Versioned.commit(Seq((3L, 30L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)
    drain(q1)
    assert(Versioned.read(spark, dst).as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)))

    // while the stream is DOWN, more commits land; the restart resumes
    // from the checkpointed version offset — no re-delivery of the
    // snapshot or the already-shipped windows, no missed window
    Versioned.commit(Seq((4L, 40L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)
    Versioned.commit(Seq((5L, 50L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)
    val q2 = replicate()
    drain(q2)
    assert(Versioned.read(spark, dst).as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L)))
    assert(Versioned.read(spark, dst).count() === 5,
      "restart must not re-deliver (ledgered sink would not dedupe a " +
        "re-derived window with a NEW epoch id — the offsets themselves " +
        "must be exact)")
  }

  test("chaos: killed after the sink commit, before the checkpoint marker; foreign commits land between restarts") {
    // The exactly-once matrix's missing cell (VERDICT r14 #8): a
    // mid-batch crash in the window where the sink's dst commit is
    // DURABLE but the checkpoint's commit marker is not. Structured
    // Streaming writes offsets/N before running batch N and commits/N
    // after — so deleting the newest commits/N reproduces exactly that
    // kill point, and the restart MUST re-execute epoch N. Exactly-once
    // then rests entirely on the ledger: the replayed appendOnce
    // (same stream name, same epoch id) must no-op — including after a
    // CONCURRENT WRITER has moved dst's manifest forward between the
    // restarts (the ledger rides the manifest chain, not the file the
    // original commit wrote).
    val src = freshBase(); val dst = freshBase(); val ckpt = freshDir()
    Versioned.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), src)
    def replicate(): StreamingQuery =
      Versioned.commitStream(readVs(src), dst, "chaos",
        Map("checkpointLocation" -> ckpt))
    val q1 = replicate()
    q1.processAllAvailable()
    Versioned.commit(Seq((3L, 30L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)
    drain(q1)
    assert(Versioned.read(spark, dst).count() === 3, "pre-kill state")

    // the kill: drop the newest checkpoint commit marker (the batch's
    // dst commit already landed above)
    val commitsDir = new java.io.File(ckpt, "commits")
    val newest = commitsDir.listFiles()
      .filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(newest.delete(), s"could not remove ${newest}")
    // the local ChecksumFileSystem keeps a .crc sidecar next to the
    // marker; a crash before the rename leaves NEITHER file, so the
    // faithful simulation removes both (a stale sidecar would poison
    // the restart's re-write of the same marker)
    new java.io.File(commitsDir, s".${newest.getName}.crc").delete()

    // between the restarts: a foreign writer commits to BOTH tables —
    // dst's ledger must survive its head moving on; src grows a new
    // window the restart must ship exactly once alongside the replay
    Versioned.commit(Seq((100L, 1000L)).toDF("id", "v"), dst,
      org.apache.spark.sql.SaveMode.Append)
    Versioned.commit(Seq((4L, 40L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)

    val q2 = replicate()
    drain(q2)
    val rows = Versioned.read(spark, dst).as[(Long, Long)].collect().toSeq
    assert(rows.size === 5,
      s"replayed epoch must no-op via the ledger, got ${rows.sorted}")
    assert(rows.toSet === Set((1L, 10L), (2L, 20L), (3L, 30L),
      (4L, 40L), (100L, 1000L)))

    // and the crashed run's read pins must not pin src retention
    // forever: an ordinary vacuum after the recovery reclaims history
    Versioned.vacuum(spark, src, keepVersions = 1, minAgeMs = 0L)
    assert(Versioned.versions(spark, src).size === 1,
      "a crash-replayed stream must not leak leases")
  }

  test("cdc mode: deletes arrive signed, net of the COW rewrite") {
    val src = freshBase()
    Versioned.commit((1L to 6L).map(i => (i, i * 10L)).toDF("id", "v"), src)
    val q = readVs(src, "mode" -> "cdc").writeStream.format("memory")
      .queryName("vs_cdc").start()
    q.processAllAvailable()
    assert(spark.table("vs_cdc").filter(col("_change") === "insert")
      .count() === 6, "initial snapshot arrives as inserts")

    Versioned.deleteWhere(spark, src, col("id") >= 5L)
    Versioned.commit(Seq((7L, 70L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)
    drain(q)
    val got = spark.table("vs_cdc").as[(Long, Long, String)].collect()
    val dels = got.filter(_._3 == "delete").map(r => (r._1, r._2)).toSet
    assert(dels === Set((5L, 50L), (6L, 60L)),
      "exactly the deleted rows, not the COW-carried survivors")
    // inserts = the 6 snapshot rows (delivered BEFORE the delete) plus
    // the appended row; folding signed rows downstream yields the live
    // table, the syncRollup contract
    assert(got.filter(_._3 == "insert").map(r => (r._1, r._2)).toSet ===
      (1L to 7L).map(i => (i, i * 10L)).toSet)
  }

  test("append mode refuses a removal window; ignoreChanges ships net inserts") {
    val src = freshBase()
    Versioned.commit((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v"), src)
    val strict = readVs(src).writeStream.format("memory")
      .queryName("vs_strict").start()
    strict.processAllAvailable()
    Versioned.deleteWhere(spark, src, col("id") === 2L)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      strict.processAllAvailable()
    }
    strict.stop()
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("remove or rewrite"),
      s"append mode must fail loudly, got: $msgs")

    // tolerant restartless consumer: a FRESH stream with ignoreChanges
    // sees the current snapshot; a further delete mid-stream is skipped
    // and the appended row still arrives
    val tol = readVs(src, "ignoreChanges" -> "true").writeStream
      .format("memory").queryName("vs_tol").start()
    tol.processAllAvailable()
    Versioned.deleteWhere(spark, src, col("id") === 3L)
    Versioned.commit(Seq((9L, 90L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)
    drain(tol)
    assert(spark.table("vs_tol").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (3L, 30L), (4L, 40L), (9L, 90L)),
      "net inserts only: the delete is dropped, the append arrives")
  }

  test("startingVersion skips the snapshot; maxVersionsPerTrigger bounds batches") {
    val src = freshBase()
    val v1 = Versioned.commit(Seq((1L, "old")).toDF("id", "s"), src)
    (2L to 5L).foreach { i =>
      Versioned.commit(Seq((i, s"r$i")).toDF("id", "s"), src,
        org.apache.spark.sql.SaveMode.Append)
    }
    val q = readVs(src, "startingVersion" -> v1.toString,
      "maxVersionsPerTrigger" -> "1")
      .writeStream.format("memory").queryName("vs_from")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("vs_from").as[(Long, String)].collect().toSet ===
      (2L to 5L).map(i => (i, s"r$i")).toSet,
      "only rows committed AFTER startingVersion")
    // 4 outstanding versions at 1/trigger = 4 separate micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) === 4,
      "maxVersionsPerTrigger=1 must split the backlog into one batch " +
        "per version")
  }

  test("an in-flight batch's snapshot window survives a concurrent vacuum") {
    import java.util.concurrent.ConcurrentLinkedQueue
    val src = freshBase()
    Versioned.commit((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v"), src)
    val got = new ConcurrentLinkedQueue[(String, Long, Long)]()
    val vacuumedDuring = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q = readVs(src, "mode" -> "cdc").writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (id == 1L) {
          // the window (v1, v2] is IN FLIGHT: a COW delete made v1's
          // rewritten dir unreferenced by v2, so an unleased vacuum
          // here would reap the very files this batch's lazy reads
          // need — the getBatch-time pin must hold them
          Versioned.vacuum(spark, src, keepVersions = 1, minAgeMs = 0L)
          vacuumedDuring.set(true)
        }
        b.select("_change", "id", "v").as[(String, Long, Long)]
          .collect().foreach(got.add)
        ()
      }.start()
    q.processAllAvailable()
    Versioned.deleteWhere(spark, src, col("id") <= 2L)
    drain(q)
    assert(vacuumedDuring.get, "the vacuum must have raced the batch")
    import scala.jdk.CollectionConverters._
    val rows = got.asScala.toSet
    assert(rows.filter(_._1 == "delete").map(r => (r._2, r._3)) ===
      Set((1L, 10L), (2L, 20L)),
      "the in-flight window read its (vacuum-raced) snapshot exactly")
    // the stream is stopped → pins released; retention is ordinary again
    Versioned.vacuum(spark, src, keepVersions = 1, minAgeMs = 0L)
    assert(Versioned.versions(spark, src).size === 1,
      "a closed stream must not pin retention forever")
  }

  test("syncRollupStream: a cdc stream maintains the rollup through DML, restart included") {
    val src = freshBase(); val roll = freshBase(); val ckpt = freshDir()
    Versioned.commit((1L to 9L)
      .map(i => (i, i % 3, i * 10L)).toDF("id", "grp", "v"), src)
    def prep(df: DataFrame) =
      df.select(col("grp"), lit(1L).as("cnt"), col("v").as("v_sum"))
    def expected(): Set[(Long, Long, Long)] =
      Versioned.read(spark, src).groupBy("grp")
        .agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
        .as[(Long, Long, Long)].collect().toSet
    def rollup(): Set[(Long, Long, Long)] =
      Versioned.read(spark, roll).as[(Long, Long, Long)].collect().toSet
    def start() = Incremental.syncRollupStream(spark, src, roll, "mv",
      prep, "grp", Seq.empty, Seq("cnt", "v_sum"), "cnt",
      options = Map("checkpointLocation" -> ckpt))

    val q = start()
    q.processAllAvailable()
    assert(rollup() === expected(), "bootstrap = snapshot aggregate")

    // the full DML spectrum while the stream runs: COW delete, MOR
    // update, append — then a whole-group vanish
    Versioned.deleteWhere(spark, src, col("id") === 4L)
    Versioned.updateWhereMor(spark, src, col("id") === 5L,
      Map("v" -> lit(999L)))
    Versioned.commit(Seq((10L, 1L, 100L)).toDF("id", "grp", "v"), src,
      org.apache.spark.sql.SaveMode.Append)
    q.processAllAvailable()
    assert(rollup() === expected(), "DML folds signed")

    Versioned.deleteWhere(spark, src, col("grp") === 0L)
    drain(q)
    assert(rollup() === expected(), "a vanished group vanishes")
    assert(!rollup().exists(_._1 == 0L))

    // stop/commit-more/restart: the checkpointed offset + ledger must
    // resume with no re-fold and no gap
    Versioned.commit(Seq((11L, 2L, 110L)).toDF("id", "grp", "v"), src,
      org.apache.spark.sql.SaveMode.Append)
    val q2 = start()
    drain(q2)
    assert(rollup() === expected(), "restart resumes exactly-once")
  }

  test("schema is frozen at start: added column dropped until restart, null-filled when absent") {
    val src = freshBase()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), src)
    val q = readVs(src).writeStream.format("memory")
      .queryName("vs_schema").start()
    q.processAllAvailable()
    // an append batch ADDS a column mid-stream: delivered rows align to
    // the frozen 2-column schema (extra dropped), no failure
    Versioned.commit(Seq((2L, "b", 99L)).toDF("id", "s", "extra"), src,
      org.apache.spark.sql.SaveMode.Append)
    drain(q)
    assert(spark.table("vs_schema").columns.toSeq === Seq("id", "s"))
    assert(spark.table("vs_schema").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    // a fresh stream adopts the evolved schema; the OLD batch's missing
    // column reads null — mergeSchema semantics end to end
    val q2 = readVs(src).writeStream.format("memory")
      .queryName("vs_schema2").start()
    drain(q2)
    assert(spark.table("vs_schema2").columns.toSet ===
      Set("id", "s", "extra"))
    assert(spark.table("vs_schema2")
      .filter(col("id") === 1L && col("extra").isNull).count() === 1)
  }

  test("a user-specified schema is rejected loudly") {
    // in cdc mode a user schema without _change would silently drop the
    // marker and deliver deletes as inserts — the source declares the
    // table's schema, period
    val src = freshBase()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), src)
    val ex = intercept[UnsupportedOperationException] {
      spark.readStream.format("graft-versioned")
        .schema(Versioned.read(spark, src).schema)
        .load(src)
    }
    assert(ex.getMessage.contains("user-specified schema"))
  }

  test("cdc mode fails loudly on a data column named _change") {
    val src = freshBase()
    Versioned.commit(Seq((1L, "x")).toDF("id", "_change"), src)
    val ex = intercept[IllegalArgumentException] {
      readVs(src, "mode" -> "cdc").writeStream.format("memory")
        .queryName("vs_collide").start()
    }
    assert(ex.getMessage.contains("_change"))
  }

  test("failOnDataLoss=false lets a restart skip a vacuumed already-committed window") {
    val src = freshBase(); val dst = freshBase(); val ckpt = freshDir()
    Versioned.commit(Seq((1L, 10L)).toDF("id", "v"), src)          // v1
    def replicate(fdl: String): StreamingQuery =
      Versioned.commitStream(
        readVs(src, "failOnDataLoss" -> fdl), dst, "repl_fdl",
        Map("checkpointLocation" -> ckpt))
    drain(replicate("false"))
    Versioned.commit(Seq((2L, 20L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)                        // v2
    drain(replicate("false"))                                      // ships (1,2]
    // while DOWN: retention sized tighter than the consumed history —
    // v1's manifest is gone; more data lands
    Versioned.vacuum(spark, src, keepVersions = 1, minAgeMs = 0L)
    Versioned.commit(Seq((3L, 30L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)                        // v3
    // the restart must come back up (any replay of the committed (1,2]
    // window is skipped with a warning, never re-derived from the
    // missing manifest) and ship exactly the new window
    drain(replicate("false"))
    assert(Versioned.read(spark, dst).as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
    assert(Versioned.read(spark, dst).count() === 3,
      "no dupes, no holes across the vacuumed-window restart")
  }

  test("failOnDataLoss=false delivers the retained sub-window when only the base was vacuumed") {
    // Kafka's opt-out contract: reset to earliest-available and deliver
    // what survives — not skip the whole window. Consumer stops at v1;
    // v2/v3/v4 land while it is down and retention drops v1 (and with it
    // the v1->v2 delta, which is unrecoverable). The restart must ship
    // the retained (v2, v4] sub-window — losing ONLY what the vacuum
    // actually destroyed — instead of dropping all three commits.
    val src = freshBase(); val dst = freshBase(); val ckpt = freshDir()
    Versioned.commit(Seq((1L, 10L)).toDF("id", "v"), src)          // v1
    def replicate(): StreamingQuery =
      Versioned.commitStream(
        readVs(src, "failOnDataLoss" -> "false"), dst, "repl_sub",
        Map("checkpointLocation" -> ckpt))
    drain(replicate())                                             // offset v1
    Versioned.commit(Seq((2L, 20L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)                        // v2
    Versioned.commit(Seq((3L, 30L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)                        // v3
    Versioned.commit(Seq((4L, 40L)).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)                        // v4
    Versioned.vacuum(spark, src, keepVersions = 3, minAgeMs = 0L)  // v1 gone
    assert(Versioned.versions(spark, src) === Seq(2L, 3L, 4L))
    drain(replicate())
    val got = Versioned.read(spark, dst).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (3L, 30L), (4L, 40L)),
      s"restart must deliver the retained (v2, v4] sub-window — only the " +
        s"vacuumed v1->v2 delta may be lost; got $got")
  }

  test("checkpoint restart adopts a column added while the stream was down: no dupes, no holes") {
    // the operator runbook for mid-stream evolution: schema is frozen
    // per RUN, so adding a column means stop -> commit -> restart from
    // the SAME checkpoint. The restart must (a) declare the evolved
    // schema, (b) resume from the checkpointed version offset — the
    // pending window arrives once, nothing re-delivers — and (c) read
    // pre-evolution rows as null in the new column.
    val src = freshBase(); val dst = freshBase(); val ckpt = freshDir()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), src)
    def replicate(): StreamingQuery =
      Versioned.commitStream(readVs(src), dst, "evo",
        Map("checkpointLocation" -> ckpt))
    drain(replicate())
    assert(Versioned.read(spark, dst).columns.toSet === Set("id", "s"))
    // while the stream is DOWN: a batch lands with a NEW column (the
    // source table's default evolve policy admits it)
    Versioned.commit(Seq((2L, "b", 99L)).toDF("id", "s", "extra"), src,
      org.apache.spark.sql.SaveMode.Append)
    drain(replicate())
    val out = Versioned.read(spark, dst)
    assert(out.columns.toSet === Set("id", "s", "extra"),
      "restart must adopt the evolved schema")
    assert(out.count() === 2, "exactly-once across the evolving restart")
    assert(out.filter(col("id") === 2L).select("extra")
      .collect().head.getLong(0) === 99L)
    assert(out.filter(col("id") === 1L && col("extra").isNull).count() === 1,
      "pre-evolution rows read null in the adopted column")
  }
}
