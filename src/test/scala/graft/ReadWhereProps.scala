package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sources.Versioned

/** End-to-end fuzz of the WHOLE skipping stack behind
  * `Versioned.readWhere`: random conjunctions of equality / IN / range
  * atoms — including the hostile shapes (probe literals of the WRONG
  * width or type family, values outside the domain, mixed-type
  * conjunctions, ORs that must fail open) — over a table carrying both
  * a zone map and bloom sidecars. The one property that matters:
  *
  *   readWhere(cond)  ≡  read().filter(cond)   (row-identical)
  *
  * under every generated predicate. Any unsound pruning (a file dropped
  * that held a matching row) breaks the count; any false contradiction
  * empties it. The generators deliberately cross type families (Int /
  * Long / String literals against LONG and STRING columns) because that
  * is exactly where the two adversarial review passes found real bugs.
  */
object ReadWhereProps extends Properties("graft.readwhere") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private lazy val spark = SparkSpec.session

  /** One shared table: ids 0..999 across two commits, zone map on the
    * numeric columns, blooms on the id and the string group. */
  private lazy val base: String = {
    import spark.implicits._
    val b = java.nio.file.Files
      .createTempDirectory("graft_rw_props").toString + "/t"
    def frame(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, s"g${i % 7}", (i * 3 % 100).toLong))
        .toDF("id", "grp", "v")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    Versioned.withBloomSizing(spark, 1L << 11, 1L << 14) {
      Versioned.commit(frame(0, 500), b,
        statsCols = Seq("id", "v"), bloomCols = Seq("id", "grp"))
      Versioned.commit(frame(500, 1000), b,
        org.apache.spark.sql.SaveMode.Append,
        statsCols = Seq("id", "v"), bloomCols = Seq("id", "grp"))
    }
    b
  }

  private val idLit: Gen[Any] = Gen.oneOf(
    Gen.choose(-50, 1050).map(identity[Int] _),            // Int literal
    Gen.choose(-50L, 1050L).map(identity[Long] _),         // Long literal
    Gen.choose(0, 1050).map(_.toString))                   // String literal
  private val grpLit: Gen[Any] = Gen.oneOf(
    Gen.choose(0, 9).map(i => s"g$i"),                     // sometimes absent
    Gen.const("nope"))

  private val atom: Gen[Column] = Gen.oneOf(
    idLit.map(v => col("id") === lit(v)),
    grpLit.map(v => col("grp") === lit(v)),
    Gen.listOfN(3, idLit).map(vs =>
      col("id").isin(vs.map(lit(_)): _*)),
    Gen.choose(-20L, 1020L).map(x => col("id") <= x),
    Gen.choose(-20L, 1020L).map(x => col("id") >= x),
    Gen.choose(-10L, 110L).map(x => col("v") <= x),
    Gen.zip(Gen.choose(0, 999), Gen.choose(0, 9)).map { case (i, g) =>
      col("id") === i || col("grp") === s"g$g" })           // OR: fail open

  private val cond: Gen[Column] = for {
    n <- Gen.choose(1, 3)
    as <- Gen.listOfN(n, atom)
  } yield as.reduce(_ && _)

  property("readWhere is row-identical to the plain filtered scan") =
    forAll(cond) { c =>
      val got = Versioned.readWhere(spark, base, c)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val want = Versioned.read(spark, base).filter(c)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      got == want
    }
}
