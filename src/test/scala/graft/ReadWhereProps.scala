package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sources.Versioned

/** End-to-end fuzz of the WHOLE skipping stack behind
  * `Versioned.readWhere`: random conjunctions AND disjunctions of
  * equality / IN / range atoms — including the hostile shapes (probe
  * literals of the WRONG width or type family, values outside the
  * domain, mixed-type conjunctions, string-vs-numeric crossings,
  * date/string/timestamp typed atoms, ORs over one or several columns)
  * — over a table carrying both a typed zone map and bloom sidecars.
  * The one property that matters:
  *
  *   readWhere(cond)  ≡  read().filter(cond)   (row-identical)
  *
  * under every generated predicate. Any unsound pruning (a file dropped
  * that held a matching row) breaks the count; any false contradiction
  * empties it. The generators deliberately cross type families (Int /
  * Long / String literals against LONG, STRING, and DATE columns)
  * because that is exactly where the adversarial review passes found
  * real bugs.
  */
object ReadWhereProps extends Properties("graft.readwhere") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private lazy val spark = SparkSpec.session

  /** One shared table: ids 0..999 across two commits, typed zone map
    * over (id, v, d, name), blooms on the id and the string group. The
    * date tracks the id (4 ids per day from 1992-01-01) and the name is
    * the zero-padded id, so both typed families genuinely prune. */
  private lazy val base: String = {
    import spark.implicits._
    val b = java.nio.file.Files
      .createTempDirectory("graft_rw_props").toString + "/t"
    def frame(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, s"g${i % 7}", (i * 3 % 100).toLong))
        .toDF("id", "grp", "v")
        .withColumn("d", date_add(lit(java.sql.Date.valueOf("1992-01-01")),
          (col("id") / 4).cast("int")))
        .withColumn("name", format_string("n%04d", col("id")))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    Versioned.withBloomSizing(spark, 1L << 11, 1L << 14) {
      Versioned.commit(frame(0, 500), b,
        statsCols = Seq("id", "v", "d", "name"), bloomCols = Seq("id", "grp"))
      Versioned.commit(frame(500, 1000), b,
        org.apache.spark.sql.SaveMode.Append,
        statsCols = Seq("id", "v", "d", "name"), bloomCols = Seq("id", "grp"))
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
  /** Dates around the table's 1992-01-01..1992-09-06 window, emitted as
    * a STRING literal (exercising the Cast-based date encode) or a
    * java.sql.Date (the typed literal path). */
  private val dateLit: Gen[Any] = for {
    day <- Gen.choose(-30, 280)
    typed <- Gen.oneOf(true, false)
  } yield {
    val d = java.sql.Date.valueOf(java.time.LocalDate
      .of(1992, 1, 1).plusDays(day).toString)
    if (typed) d else d.toString
  }
  private val nameLit: Gen[String] = Gen.oneOf(
    Gen.choose(-50, 1050).map(i => f"n$i%04d"),
    Gen.const("zzz"), Gen.const(""))

  private val rangeAtom: Gen[Column] = Gen.oneOf(
    Gen.choose(-20L, 1020L).map(x => col("id") <= x),
    Gen.choose(-20L, 1020L).map(x => col("id") >= x),
    Gen.choose(-10L, 110L).map(x => col("v") <= x),
    dateLit.map(x => col("d") >= lit(x)),
    dateLit.map(x => col("d") < lit(x)),
    nameLit.map(x => col("name") >= x),
    nameLit.map(x => col("name") <= x))

  private val atom: Gen[Column] = Gen.oneOf(
    rangeAtom,
    idLit.map(v => col("id") === lit(v)),
    grpLit.map(v => col("grp") === lit(v)),
    nameLit.map(v => col("name") === v),
    dateLit.map(v => col("d") === lit(v)),
    Gen.listOfN(3, idLit).map(vs =>
      col("id").isin(vs.map(lit(_)): _*)),
    // disjunctions: same-column bands (must PRUNE via the interval-set
    // union), same-column probes (bloom union), and cross-column mixes
    // (must fail open) — all row-identical either way
    Gen.zip(rangeAtom, rangeAtom).map { case (a, b) => a || b },
    Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9)).map { case (g, h) =>
      col("grp") === s"g$g" || col("grp") === s"g$h" },
    Gen.zip(Gen.choose(0, 999), Gen.choose(0, 9)).map { case (i, g) =>
      col("id") === i || col("grp") === s"g$g" })

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

  property("a disjunction of disjoint id bands prunes files") =
    forAll(Gen.choose(60L, 200L), Gen.choose(760L, 940L)) { (lo, hi) =>
      val c = col("id") <= lo || col("id") >= hi
      val got = Versioned.readWhere(spark, base, c)
      val all = Versioned.read(spark, base)
      (got.inputFiles.length < all.inputFiles.length) :| "must prune" && {
        val g = got.select("id").collect().map(_.getLong(0)).sorted.toSeq
        val w = all.filter(c).select("id").collect()
          .map(_.getLong(0)).sorted.toSeq
        (g == w) :| "row-identical"
      }
    }
}
