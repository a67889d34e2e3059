package graft

import graft.model.{Audit, Fixtures, Snowflake, Star}
import org.apache.spark.sql.functions._

/** Golden assertions for the star + snowflake DW builds — the reference's
  * own validation queries turned into tests (SURVEY §5, FIXTURES.md §A).
  */
class StarEtlSpec extends SparkSpec {
  lazy val dims: Star.Dims = Star.buildDims(spark)
  lazy val facts: Star.Facts = Star.buildFacts(spark, dims)
  lazy val snow: Snowflake.SnowDims = Snowflake.buildDims(spark, dims)

  test("source fixture row counts match reference seed data") {
    val expected = Map(
      // s1_elig
      "member" -> 12L, "payer" -> 3L, "insuranceplan" -> 5L,
      "enrollment" -> 36L, "memberaddress" -> 12L, "membercontact" -> 12L,
      "coverageperiod" -> 13L, "dualstatus" -> 2L, "subsidylis" -> 3L,
      "memberlanguagepref" -> 12L,
      // s2_claims
      "placeofservice" -> 6L, "claimheader" -> 10L, "claimline" -> 17L,
      "claimdiagnosis" -> 11L, "claimprocedure" -> 17L, "claimpayment" -> 17L,
      "claimadjustment" -> 5L, "encounter" -> 10L, "encounterdiagnosis" -> 10L,
      "encounterprocedure" -> 11L,
      // s3_cca
      "qualitymeasure" -> 6L, "cca_user" -> 6L, "careprogram" -> 3L,
      "caregoal" -> 14L, "caretask" -> 23L, "assessment" -> 16L,
      "riskscore" -> 12L, "caregap" -> 16L, "careplan" -> 9L,
      "intervention" -> 19L,
      // s4_provider
      "provider" -> 12L, "organization" -> 5L, "location" -> 8L,
      "specialty" -> 6L, "providerspecialty" -> 13L, "providerlocation" -> 15L,
      "networkstatus" -> 6L, "affiliation" -> 10L, "contract" -> 5L,
      "contractrate" -> 11L,
      // s5_ref
      "ref_icd10" -> 11L, "ref_cpt_hcpcs" -> 13L, "ref_pos" -> 6L,
      "ref_qualitymeasure" -> 6L, "ref_ndc" -> 5L, "ref_loinc" -> 5L,
      "ref_benefit" -> 7L, "ref_planbenefit" -> 10L, "ref_geo_zipfips" -> 12L,
      "ref_adjustmentcode" -> 5L)
    assert(expected.size === 50) // the reference's full 5 schemas x 10 tables
    Fixtures.registerAll(spark)
    expected.foreach { case (t, n) =>
      assert(spark.table(t).count() === n, s"table $t")
    }
  }

  test("star dims have reference golden counts (incl. Unknown rows)") {
    assert(dims.dimMember.count() === 13)
    assert(dims.dimPlan.count() === 6)
    assert(dims.dimProvider.count() === 13)
    assert(dims.dimDiagnosis.count() === 12)
    assert(dims.dimProcedure.count() === 14)
    assert(dims.dimPOS.count() === 7)
    assert(dims.dimQualityMeasure.count() === 7)
  }

  test("dim SKs: Unknown row is SK=0, natural rows numbered from 1") {
    val sks = dims.dimMember.select("MemberSK").collect().map(_.getInt(0)).sorted
    assert(sks === (0 to 12).toArray)
    val unk = dims.dimMember.filter(col("MemberSK") === 0).collect().head
    assert(unk.getAs[Int]("MemberID") === -1)
    assert(unk.getAs[String]("MemberBK") === "UNK")
  }

  test("DimDate contains 19000101 plus every harvested date") {
    assert(dims.dimDate.filter(col("DateSK") === 19000101).count() === 1)
    assert(dims.dimDate.count() === dims.dimDate.select("DateSK").distinct().count())
    val d20250115 = dims.dimDate.filter(col("DateSK") === 20250115)
    assert(d20250115.count() === 1) // ClaimDate seed value
  }

  test("facts have reference golden counts") {
    assert(facts.factClaimsLine.count() === 17)
    assert(facts.factEncounters.count() === 10)
    assert(facts.factCareGaps.count() === 16)
    assert(facts.factEligibilityMonthly.count() === 36)
  }

  test("care gap flags partition by status") {
    val f = facts.factCareGaps
    val open = f.filter(col("GapOpenFlag") === 1).count()
    val closed = f.filter(col("GapClosedFlag") === 1).count()
    assert(open + closed <= 16)
    assert(open === Fixtures.caregap(spark).filter(col("Status") === "OPEN").count())
    assert(closed === Fixtures.caregap(spark).filter(col("Status") === "CLOSED").count())
  }

  test("snowflake dims: golden counts and normalized lookups") {
    assert(snow.dimPayer.count() === 4)     // 3 + Unknown
    assert(snow.dimPlan.count() === 6)      // 5 + Unknown
    assert(snow.dimOrg.count() === 6)       // 5 + Unknown
    assert(snow.dimLocation.count() === 9)  // 8 + Unknown
    assert(snow.dimSpecialty.count() === 7) // 6 + Unknown
    assert(snow.bridgeProviderSpecialty.count() === 13)
    // every non-Unknown plan resolves to a real payer SK
    assert(snow.dimPlan.filter(col("PlanSK") > 0 && col("PayerSK") === 0).count() === 0)
  }

  test("RI checks return 0 rows (reference validation queries)") {
    Audit.riChecks(spark).foreach { case (name, df) =>
      assert(df.count() === 0, name)
    }
    Audit.uniqueChecks(spark).foreach { case (name, df) =>
      assert(df.count() === 0, name)
    }
  }

  test("unknown-SK audit matches expectations") {
    val audit = Audit.unknownSkAudit(facts).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Eligibility and care gaps resolve fully in the seed data.
    assert(audit("Elig Unknowns") === 0)
    assert(audit("CareGaps Unknowns") === 0)
  }

  test("same ETL runs off a parquet lake with identical golden counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake").toString
    graft.model.Sources.writeFixtureLake(spark, dir)
    val src = graft.model.Sources.parquet(spark, dir)
    val pDims = Star.buildDims(spark, src)
    val pFacts = Star.buildFacts(spark, pDims, src)
    assert(pDims.dimMember.count() === 13)
    assert(pFacts.factClaimsLine.count() === 17)
    assert(pFacts.factEligibilityMonthly.count() === 36)
    val pSnow = Snowflake.buildDims(spark, pDims, src)
    assert(pSnow.bridgeProviderSpecialty.count() === 13)
  }

  test("row count audit runs over all DW tables") {
    val counts = Audit.rowCounts(Seq(
      "DimMember" -> dims.dimMember, "FactClaimsLine" -> facts.factClaimsLine))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("DimMember" -> 13L, "FactClaimsLine" -> 17L))
  }

  test("scalable SK path: collision-free and consistent within a run (not reproducible)") {
    // SURVEY §7.4.1: the row_number SK path is reproducible but
    // single-partition; the scalable flag swaps in
    // monotonically_increasing_id, whose contract is weaker — unique and
    // STABLE WITHIN THE RUN (pinned by the eager localCheckpoint), not
    // reproducible across runs. This test asserts exactly that contract.
    import spark.implicits._
    val dim = (1 to 5000).map(i => (i, s"bk_$i")).toDF("NatId", "BK")
      .repartition(8) // several partitions — the path the window can't take
    val unknown = Seq((0L, -1, "UNK")).toDF("SK", "NatId", "BK")
    val keyed = graft.model.Sk.withSk(dim, "SK", "NatId", unknown, scalable = true)
    // collision-free incl. the Unknown row; naturals never collide with SK=0
    assert(keyed.count() === 5001)
    assert(keyed.select("SK").distinct().count() === 5001)
    assert(keyed.filter(col("SK") === 0).select("BK").head().getString(0) === "UNK")
    assert(keyed.filter(col("NatId") =!= -1 && col("SK") === 0).count() === 0)
    // consistency: two independent materializations of the returned frame
    // observe the identical key→SK assignment (fact build + audit forks)
    val m1 = keyed.select("NatId", "SK").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val m2 = keyed.select("NatId", "SK").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m1 === m2)
  }
}
