package graft

import java.nio.file.Files
import graft.sources.Versioned
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The versioned-table commit protocol: atomic snapshots, time travel,
  * snapshot isolation from immutability, crash garbage invisibility, and
  * the vacuum retention trade — the properties SURVEY §2.9 claims. */
class VersionedSpec extends SparkSpec {

  private def freshBase(): String =
    Files.createTempDirectory("graft_versioned").toString + "/t"

  test("commit / read / time travel: overwrite and append snapshots") {
    val base = freshBase()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")

    val v1 = Versioned.commit(ord.filter(col("o_orderkey") < 100), base)
    assert(v1 === 1L)
    val n1 = Versioned.read(spark, base).count()
    assert(n1 === ord.filter(col("o_orderkey") < 100).count())

    // overwrite: latest is exactly the new batch
    val v2 = Versioned.commit(
      ord.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 300), base)
    assert(v2 === 2L)
    assert(Versioned.read(spark, base).agg(min(col("o_orderkey")))
      .head().getLong(0) >= 100)

    // append: latest is previous plus the batch
    val v3 = Versioned.commit(ord.filter(col("o_orderkey") >= 300
      && col("o_orderkey") < 400), base, SaveMode.Append)
    assert(v3 === 3L)
    val n3 = Versioned.read(spark, base).count()
    assert(n3 === Versioned.readVersion(spark, base, 2).count()
      + ord.filter(col("o_orderkey") >= 300 && col("o_orderkey") < 400).count())

    // time travel: every snapshot stays exact
    assert(Versioned.readVersion(spark, base, 1).count() === n1)
    assert(Versioned.versions(spark, base) === Seq(1L, 2L, 3L))
  }

  test("snapshot isolation: a reader resolved before a commit is unaffected by it") {
    val base = freshBase()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
    Versioned.commit(ord.filter(col("o_orderkey") < 100), base)
    // resolve version 1 NOW; its file set is immutable
    val snapshot = Versioned.readVersion(spark, base, 1)
    val before = snapshot.count()
    Versioned.commit(ord, base) // v2 lands
    assert(snapshot.count() === before, "v1 reader saw a later commit")
    assert(Versioned.read(spark, base).count() === ord.count())
  }

  test("crash garbage is unreachable: staged dirs and tmp manifests are invisible") {
    val base = freshBase()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
    Versioned.commit(ord.filter(col("o_orderkey") < 100), base)
    val n = Versioned.read(spark, base).count()
    // a writer that died after staging, before manifest rename:
    ord.filter(col("o_orderkey") >= 100).write
      .parquet(s"$base/data-dead-writer")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "_manifests", ".tmp-dead"),
      "garbage".getBytes("UTF-8"))
    assert(Versioned.read(spark, base).count() === n)
    assert(Versioned.versions(spark, base) === Seq(1L))
  }

  test("schema evolution: an append batch with a new column widens the snapshot schema") {
    val base = freshBase()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
    Versioned.commit(ord.select("o_orderkey", "o_totalprice")
      .filter(col("o_orderkey") < 100), base)
    Versioned.commit(ord.select("o_orderkey", "o_totalprice")
      .filter(col("o_orderkey") >= 100)
      .withColumn("ingest_tag", lit("batch2")), base, SaveMode.Append)
    val latest = Versioned.read(spark, base)
    assert(latest.columns.toSet ===
      Set("o_orderkey", "o_totalprice", "ingest_tag"))
    assert(latest.count() === ord.count())
    // pre-evolution rows read the new column as null
    assert(latest.filter(col("ingest_tag").isNull).count() ===
      ord.filter(col("o_orderkey") < 100).count())
    // time travel still sees the ORIGINAL schema of v1
    assert(Versioned.readVersion(spark, base, 1).columns.toSet ===
      Set("o_orderkey", "o_totalprice"))
  }

  test("streaming sink: each micro-batch is one atomic append commit; compaction folds them") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = freshBase()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Versioned.commitStream(
      input.toDF().toDF("id", "payload"), base)
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(Versioned.read(spark, base).count() === 2)
      input.addData((3L, "c"))
      q.processAllAvailable()
      // one version per non-empty micro-batch, union visible atomically
      assert(Versioned.versions(spark, base).size === 2)
      assert(Versioned.read(spark, base).as[(Long, String)].collect().sorted
        === Array((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
    // compaction is itself a commit: same rows, one data dir, history kept
    val v = Versioned.compactLatest(spark, base, targetFiles = 1)
    assert(Versioned.read(spark, base).count() === 3)
    assert(Versioned.readVersion(spark, base, v - 1).count() === 3)
    Versioned.vacuum(spark, base, keepVersions = 1, minAgeMs = 0)
    assert(Versioned.read(spark, base).count() === 3)
  }

  test("optimistic conflict: a copy-on-write commit derived from a stale head aborts") {
    import spark.implicits._
    val base = freshBase()
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), base)
    val staleHead = Versioned.versions(spark, base).last
    Versioned.commit(Seq((2L, "b")).toDF("id", "v"), base, SaveMode.Append)
    // a rewrite derived from v1 must NOT silently clobber v2's append
    assertThrows[java.util.ConcurrentModificationException](
      Versioned.commit(Seq((9L, "z")).toDF("id", "v"), base,
        expectedHead = Some(staleHead)))
    // nothing was published by the aborted attempt
    assert(Versioned.versions(spark, base).size === 2)
    assert(Versioned.read(spark, base).count() === 2)
  }

  test("copy-on-write delete/update: transactional DML, null-cond rows survive delete") {
    import spark.implicits._
    val base = freshBase()
    Versioned.commit(Seq(
      (1L, Some("drop"), 10.0), (2L, Some("keep"), 20.0),
      (3L, None, 30.0)).toDF("id", "tag", "amt"), base)

    // DELETE WHERE tag = 'drop': row 3's NULL condition must NOT delete it
    Versioned.deleteWhere(spark, base, col("tag") === "drop")
    assert(Versioned.read(spark, base).select("id").as[Long]
      .collect().sorted === Array(2L, 3L))

    // UPDATE WHERE id = 2 SET amt = 0: only the matching row changes
    val vUpd = Versioned.updateWhere(spark, base,
      col("id") === 2, Map("amt" -> lit(0.0)))
    val after = Versioned.read(spark, base)
      .select("id", "amt").as[(Long, Double)].collect().sortBy(_._1)
    assert(after === Array((2L, 0.0), (3L, 30.0)))
    // history intact: the pre-update snapshot still shows amt = 20
    assert(Versioned.readVersion(spark, base, vUpd - 1)
      .filter(col("id") === 2).select("amt").as[Double].head() === 20.0)
  }

  test("incremental rollup: additive merges, late partitions, batch-level exactly-once") {
    import spark.implicits._
    import graft.sources.Incremental
    val base = freshBase()
    def up(rows: Seq[(String, String, Long, Long)], id: String): Long =
      Incremental.upsertRollup(spark, base,
        rows.toDF("day", "kind", "cnt", "cents"), id,
        "day", Seq("kind"), Seq("cnt", "cents"))

    up(Seq(("d1", "a", 1L, 100L), ("d1", "b", 1L, 50L)), "b0")
    // merges into d1/a AND introduces the late partition d2
    up(Seq(("d1", "a", 1L, 25L), ("d2", "a", 1L, 10L)), "b1")
    def state(): Map[(String, String), (Long, Long)] =
      Versioned.read(spark, base).as[(String, String, Long, Long)]
        .collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val expected = Map(
      ("d1", "a") -> (2L, 125L), ("d1", "b") -> (1L, 50L),
      ("d2", "a") -> (1L, 10L))
    assert(state() === expected)
    // replayed batch id: NOTHING changes — not the data, not the history
    val headBefore = Versioned.versions(spark, base).last
    up(Seq(("d1", "a", 99L, 9999L)), "b1")
    assert(state() === expected)
    assert(Versioned.versions(spark, base).last === headBefore)
    // the batch id is committed atomically with its data
    assert(Versioned.commitMeta(spark, base, headBefore)
      .get("batch_id").contains("b1"))
    // time travel still shows the pre-b1 rollup
    assert(Versioned.readVersion(spark, base, 1)
      .as[(String, String, Long, Long)].collect().toSet ===
      Set(("d1", "a", 1L, 100L), ("d1", "b", 1L, 50L)))
  }

  test("streaming rollup: micro-batches fold in exactly-once, state lives in the table") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.Incremental
    val base = freshBase()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String, Long, Long)]
    val q = Incremental.rollupStream(
      input.toDF().toDF("day", "kind", "cnt", "cents"), base,
      "day", Seq("kind"), Seq("cnt", "cents"))
    try {
      input.addData(("d1", "a", 1L, 10L), ("d1", "a", 1L, 20L))
      q.processAllAvailable()
      input.addData(("d1", "a", 1L, 5L), ("d2", "b", 1L, 7L))
      q.processAllAvailable()
      val state = Versioned.read(spark, base)
        .as[(String, String, Long, Long)].collect().toSet
      assert(state === Set(("d1", "a", 3L, 35L), ("d2", "b", 1L, 7L)))
      // an epoch redelivered under its original id must no-op: simulate
      // the checkpoint-replay path by re-upserting epoch 0's batch
      Incremental.upsertRollup(spark, base,
        Seq(("d1", "a", 1L, 10L), ("d1", "a", 1L, 20L))
          .toDF("day", "kind", "cnt", "cents"),
        "stream-epoch-0", "day", Seq("kind"), Seq("cnt", "cents"))
      assert(Versioned.read(spark, base)
        .as[(String, String, Long, Long)].collect().toSet === state)
    } finally q.stop()
  }

  test("rollback is a new commit; vacuum keeps referenced data, reaps the rest") {
    val base = freshBase()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
    Versioned.commit(ord.filter(col("o_orderkey") < 100), base)   // v1
    Versioned.commit(ord.filter(col("o_orderkey") >= 100), base)  // v2
    val v3 = Versioned.rollbackTo(spark, base, 1)                 // v3 == v1's files
    assert(v3 === 3L)
    val v1n = Versioned.readVersion(spark, base, 1).count()
    assert(Versioned.read(spark, base).count() === v1n)

    // keep only v3: the v1/v2 manifests go, but v3 still references v1's
    // DATA, so those rows survive; v2's data dir is unreferenced → reaped
    def dataDirs(): Int = new java.io.File(base).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("data-"))
    assert(dataDirs() === 2)
    Versioned.vacuum(spark, base, keepVersions = 1, minAgeMs = 0)
    assert(Versioned.versions(spark, base) === Seq(3L))
    assert(Versioned.read(spark, base).count() === v1n)
    assert(dataDirs() === 1, "unreferenced v2 data dir should be reaped")
  }
}
