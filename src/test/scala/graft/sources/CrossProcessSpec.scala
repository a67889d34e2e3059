package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TRUE multi-process concurrency: fork [[graft.Forked]] as a real
  * second JVM (own SparkSession; the only shared state is the table
  * directory) and race it against this process. ProtocolSpec's
  * CommitStore shims drive every conflict branch deterministically
  * IN-process; these tests close what a shim cannot — that the
  * rename-CAS, the rebase-over-append composition, and the durable
  * lease files actually coordinate two operating-system processes. */
class CrossProcessSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(): String =
    Files.createTempDirectory("graft_xproc").toString + "/t"

  /** Launch `graft.Forked` with this JVM's classpath and module flags
    * (sbt forks tests, so java.class.path is the real test classpath
    * and the --add-opens Spark needs are in our own input args). */
  /** A forked child plus a daemon thread draining its stdout into a
    * queue — so sentinel waits have a REAL deadline (a blocked
    * readLine() would never observe one) and the pipe never backs up. */
  private final case class Child(p: Process,
      lines: java.util.concurrent.BlockingQueue[String])

  private def fork(args: String*): Child = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    val moduleFlags = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") ||
        a.startsWith("--add-exports"))
    val cmd = (Seq(javaBin) ++ moduleFlags ++ Seq("-Xmx2g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.Forked") ++ args).asJava
    // stderr must be discarded, not piped: Spark's startup logging can
    // fill an undrained 64 KB pipe buffer and deadlock the child while
    // the parent waits on stdout sentinels
    val p = new ProcessBuilder(cmd)
      .redirectError(ProcessBuilder.Redirect.DISCARD)
      .start()
    val q = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var line = r.readLine()
      while (line != null) { q.put(line); line = r.readLine() }
    })
    t.setDaemon(true)
    t.start()
    Child(p, q)
  }

  private def awaitLine(c: Child, prefix: String): String = {
    val deadline = System.currentTimeMillis() + 120000
    var deadEmptyPolls = 0
    while (true) {
      val line = c.lines.poll(250, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (line != null && line.startsWith(prefix)) return line
      assert(System.currentTimeMillis() < deadline,
        s"timed out waiting for $prefix from the forked JVM")
      // the child may exit before the drainer flushes its final lines —
      // only declare "ended without printing" after a short dead+empty
      // grace window, never on the first empty poll
      if (line == null && !c.p.isAlive && c.lines.isEmpty) {
        deadEmptyPolls += 1
        assert(deadEmptyPolls < 8,
          s"forked JVM ended before printing $prefix")
      } else deadEmptyPolls = 0
    }
    throw new IllegalStateException("unreachable")
  }

  test("appends from a second JVM race local COW deletes: zero lost commits") {
    val base = freshBase()
    // seed rows this process will delete while the other process appends
    Versioned.commit((1L to 8L).map(i => (i, i * 10L)).toDF("id", "v"),
      base, statsCols = Seq("id"))

    // forked JVM: 6 sequential append commits of 5 rows (ids 1000+)
    val child = fork("append", base, "1000", "5", "6")
    try {
      // this JVM: COW deletes racing the child's appends — every loser
      // of the CAS re-reads and retries; append-vs-rewrite composes per
      // the conflict matrix, so NO abort should surface on either side
      for (id <- 1L to 4L)
        Versioned.deleteWhere(spark, base, col("id") === id)
      val appended = awaitLine(child, "FORKED_APPENDED")
      assert(child.p.waitFor() === 0, "forked JVM must exit clean")
      assert(appended.split(" ")(1).split(",").length === 6,
        "all 6 child commits returned a version")
    } finally child.p.destroyForcibly()

    // invariants: every commit landed exactly once (versions contiguous:
    // 1 seed + 6 appends + 4 deletes), the surviving row multiset is
    // arithmetic-exact, nothing resurrected, nothing lost
    val vs = Versioned.versions(spark, base)
    assert(vs === (1L to 11L), s"contiguous versions, got $vs")
    val got = Versioned.read(spark, base).select("id", "v")
      .as[(Long, Long)].collect().toSeq
    val expect = ((5L to 8L) ++ (1000L until 1030L))
      .map(i => (i, i * 10L))
    assert(got.sorted === expect.sorted,
      "4 surviving seeds + 30 appended rows, each exactly once")
  }

  private def awaitFile(p: java.nio.file.Path): Unit = {
    val deadline = System.currentTimeMillis() + 120000
    while (!Files.exists(p)) {
      Thread.sleep(25)
      assert(System.currentTimeMillis() < deadline, s"timed out waiting for $p")
    }
  }

  test("deterministic cross-process race: a MERGE rebases over an append landed in its window") {
    // the cross-process twin of ProtocolSpec's `racing` shim: the
    // child's SentinelCommitStore blocks its FIRST publish attempt on a
    // filesystem handshake, so this process lands a pure append exactly
    // inside the child MERGE's optimistic window — across a real
    // process boundary the child must lose its CAS, re-read, classify
    // the race as composable, and rebase
    val base = freshBase()
    Versioned.commit((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v"), base)
    val dir = Files.createTempDirectory("graft_xproc_sentinel").toString
    val child = fork("merge-sentinel", base, dir)
    try {
      awaitFile(Paths.get(dir, "child-ready"))
      Versioned.commit(Seq((9L, 90L)).toDF("id", "v"), base,
        org.apache.spark.sql.SaveMode.Append) // v2, inside the window
      Files.createFile(Paths.get(dir, "parent-done"))
      val merged = awaitLine(child, "FORKED_")
      assert(merged === "FORKED_MERGED 3",
        s"the merge must rebase and land at v3, got: $merged")
      assert(child.p.waitFor() === 0)
    } finally child.p.destroyForcibly()
    assert(Versioned.read(spark, base).select("id", "v").as[(Long, Long)]
      .collect().toSet ===
      Set((1L, 10L), (2L, 222L), (3L, 30L), (4L, 40L), (5L, 555L),
        (9L, 90L)),
      "update + insert + the raced append all land, exactly once each")
  }

  test("deterministic cross-process race: overlapping rewrites abort the child cleanly") {
    val base = freshBase()
    Versioned.commit((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v"), base)
    val dir = Files.createTempDirectory("graft_xproc_sentinel").toString
    val child = fork("delete-sentinel", base, "2", dir)
    try {
      awaitFile(Paths.get(dir, "child-ready"))
      // rewrite the SAME (only) data dir the child's delete derived from
      Versioned.deleteWhere(spark, base, col("id") === 3L) // v2
      Files.createFile(Paths.get(dir, "parent-done"))
      val res = awaitLine(child, "FORKED_")
      assert(res === "FORKED_ABORTED",
        s"a cross-process same-dir rewrite race must abort, got: $res")
      assert(child.p.waitFor() === 0)
    } finally child.p.destroyForcibly()
    // the aborted delete left only vacuumable garbage — no half-commit
    assert(Versioned.versions(spark, base) === Seq(1L, 2L))
    assert(Versioned.read(spark, base).select("id").as[Long]
      .collect().toSet === Set(1L, 2L, 4L))
  }

  test("cross-process vector-compose: MOR deletes from two JVMs on disjoint dirs both land") {
    // the DML×DML cell the in-process shim covered but a real process
    // boundary had not: two deletion vectors whose zone maps prove
    // disjoint directories must COMPOSE across JVMs — both land, one
    // version each, no abort, multiset-exact survivors
    val base = freshBase()
    Versioned.commit((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v"),
      base, statsCols = Seq("id"))                                 // v1
    Versioned.commit((11L to 14L).map(i => (i, i * 10L)).toDF("id", "v"),
      base, org.apache.spark.sql.SaveMode.Append,
      statsCols = Seq("id"))                                       // v2
    val dir = Files.createTempDirectory("graft_xproc_sentinel").toString
    val child = fork("mor-delete-sentinel", base, "12", dir)
    try {
      awaitFile(Paths.get(dir, "child-ready"))
      Versioned.deleteWhereMor(spark, base, col("id") === 2L)      // v3
      Files.createFile(Paths.get(dir, "parent-done"))
      val res = awaitLine(child, "FORKED_")
      assert(res === "FORKED_MORDELETED 4",
        s"disjoint cross-process vectors must compose, got: $res")
      assert(child.p.waitFor() === 0)
    } finally child.p.destroyForcibly()
    assert(Versioned.versions(spark, base) === (1L to 4L))
    assert(Versioned.read(spark, base).select("id").as[Long]
      .collect().toSet === Set(1L, 3L, 4L, 11L, 13L, 14L),
      "both vectors applied exactly once, nothing resurrected")
  }

  test("cross-process MOR update racing MOR delete on disjoint dirs: both compose") {
    val base = freshBase()
    Versioned.commit((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v"),
      base, statsCols = Seq("id"))                                 // v1
    Versioned.commit((11L to 14L).map(i => (i, i * 10L)).toDF("id", "v"),
      base, org.apache.spark.sql.SaveMode.Append,
      statsCols = Seq("id"))                                       // v2
    val dir = Files.createTempDirectory("graft_xproc_sentinel").toString
    val child = fork("mor-delete-sentinel", base, "12", dir)
    try {
      awaitFile(Paths.get(dir, "child-ready"))
      // MOR update (vector + patch dir) inside the child's window, on
      // the OTHER data dir — the update×delete cell of the matrix
      Versioned.updateWhereMor(spark, base, col("id") === 2L,
        Map("v" -> lit(222L)))                                     // v3
      Files.createFile(Paths.get(dir, "parent-done"))
      val res = awaitLine(child, "FORKED_")
      assert(res === "FORKED_MORDELETED 4",
        s"a disjoint MOR update must compose with the MOR delete, got: $res")
      assert(child.p.waitFor() === 0)
    } finally child.p.destroyForcibly()
    assert(Versioned.read(spark, base).select("id", "v").as[(Long, Long)]
      .collect().toSet ===
      Set((1L, 10L), (2L, 222L), (3L, 30L), (4L, 40L),
        (11L, 110L), (13L, 130L), (14L, 140L)),
      "update applied, delete applied, nothing lost or doubled")
  }

  test("cross-process MERGE vs MERGE: the raced child aborts with no half-commit") {
    // two merges whose derivations read the same data dir cannot both
    // rebase (the parent's merge REWROTE what the child read): the
    // child must abort cleanly across the process boundary, leaving
    // only the parent's transaction
    val base = freshBase()
    Versioned.commit((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v"), base)
    val dir = Files.createTempDirectory("graft_xproc_sentinel").toString
    val child = fork("merge-sentinel", base, dir) // merges (2,222),(5,555)
    try {
      awaitFile(Paths.get(dir, "child-ready"))
      Versioned.mergeInto(spark, base,
        Seq((3L, 333L), (7L, 777L)).toDF("id", "v"),
        keys = Seq("id"), updateCols = Seq("v"))                   // v2
      Files.createFile(Paths.get(dir, "parent-done"))
      val res = awaitLine(child, "FORKED_")
      assert(res === "FORKED_ABORTED",
        s"merge-over-merge on the same dir must abort, got: $res")
      assert(child.p.waitFor() === 0)
    } finally child.p.destroyForcibly()
    assert(Versioned.versions(spark, base) === Seq(1L, 2L),
      "the aborted child left no version behind")
    assert(Versioned.read(spark, base).select("id", "v").as[(Long, Long)]
      .collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 333L), (4L, 40L), (7L, 777L)),
      "exactly the parent's merge — no half-commit from the child")
  }

  test("a durable lease from a second JVM floors this process's vacuum") {
    val base = freshBase()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), base) // v1
    val release = Files.createTempDirectory("graft_xproc_rel")
      .resolve("release")
    val child = fork("pin", base, release.toString)
    try {
      val pinned = awaitLine(child, "FORKED_PINNED")
      assert(pinned.endsWith(" 1"), s"child pinned the head v1: $pinned")
      // bury v1 and vacuum aggressively FROM THIS PROCESS: the foreign
      // lease file must floor retention — in-process registry knows
      // nothing about the child
      Versioned.commit(Seq((2L, "b")).toDF("id", "s"), base)
      Versioned.commit(Seq((3L, "c")).toDF("id", "s"), base)
      Versioned.vacuum(spark, base, keepVersions = 1, minAgeMs = 0L)
      assert(Versioned.versions(spark, base) === Seq(1L, 2L, 3L),
        "a live cross-process lease must keep the pinned version")
      assert(Versioned.readVersion(spark, base, 1L).count() === 1L,
        "the pinned snapshot's files must still be readable")
      // release the child; once its lease file is gone, vacuum reaps
      Files.createFile(release)
      awaitLine(child, "FORKED_RELEASED")
      assert(child.p.waitFor() === 0)
      Versioned.vacuum(spark, base, keepVersions = 1, minAgeMs = 0L)
      assert(Versioned.versions(spark, base) === Seq(3L),
        "after the foreign lease closes, ordinary retention applies")
    } finally child.p.destroyForcibly()
  }
}
