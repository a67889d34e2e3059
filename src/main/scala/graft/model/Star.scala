package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema DW build (reference: StarSchemaForHealthcare.sql).
  *
  * Spark translation decisions (SURVEY §3/§4/§7.4):
  *  - IDENTITY SKs → `row_number().over(Window.orderBy(naturalKey))` unioned
  *    after a literal Unknown SK=0 row. Deterministic; the orderBy window is
  *    single-partition, fine for dimension-sized inputs. At 100 TB dims,
  *    swap in `monotonically_increasing_id` — fact joins only need
  *    within-run SK consistency, which both provide.
  *  - `NOT EXISTS` dedupe-on-insert → idempotent full recompute (the whole
  *    DW is a pure function of the sources), so no anti-join needed.
  *  - Fact loads: left-join each dim on its natural key, `coalesce(SK, 0)`
  *    (dates to 19000101) exactly like the reference
  *    (StarSchemaForHealthcare.sql:302-389). Dims are broadcast — every
  *    fact-load join is a BroadcastHashJoin, zero shuffles of the fact side.
  */
object Star {
  val UnknownDateSk = 19000101

  /** yyyymmdd int key; null-safe (null date → null key, which then
    * left-join-misses and coalesces to the Unknown member). */
  private def dateSk(c: Column): Column =
    when(c.isNull, lit(null))
      .otherwise(year(c) * 10000 + month(c) * 100 + dayofmonth(c))
      .cast("int")

  case class Dims(
      dimDate: DataFrame, dimMember: DataFrame, dimPlan: DataFrame,
      dimProvider: DataFrame, dimDiagnosis: DataFrame, dimProcedure: DataFrame,
      dimPOS: DataFrame, dimQualityMeasure: DataFrame)

  case class Facts(
      factClaimsLine: DataFrame, factEncounters: DataFrame,
      factCareGaps: DataFrame, factEligibilityMonthly: DataFrame)

  def buildDims(s: SparkSession): Dims = buildDims(s, Sources.fixtures(s))

  def buildDims(s: SparkSession, src: Sources.Sources): Dims = {
    import s.implicits._

    // DimDate: harvest the 9 date columns that appear in the data
    // (StarSchemaForHealthcare.sql:143-173) + the 1900-01-01 Unknown.
    val enc = src("encounter")
    val gap = src("caregap")
    val dates = Seq(
      src("claimheader").select($"ClaimDate".as("d")),
      src("claimline").select($"ServiceDate".as("d")),
      enc.select($"EncounterDate".as("d")),
      enc.select($"AdmitDate".as("d")),
      enc.select($"DischargeDate".as("d")),
      src("enrollment").select($"EnrollmentMonth".as("d")),
      gap.select($"PeriodStart".as("d")),
      gap.select($"PeriodEnd".as("d")),
      gap.select($"ClosedDate".as("d"))
    ).reduce(_ unionByName _)
      .filter($"d".isNotNull).distinct()
    val dimDate = Seq(("1900-01-01")).toDF("ds")
      .select(to_date($"ds").as("Date"))
      .unionByName(dates.select($"d".as("Date")))
      .distinct()
      .select(dateSk($"Date").as("DateSK"), $"Date",
        year($"Date").as("Year"), month($"Date").as("Month"),
        dayofmonth($"Date").as("Day"))

    val dimMember = Sk.withSk(
      src("member"),
      "MemberSK", "MemberID",
      Seq((0, -1, "UNK", "Unknown", "Member", null: java.sql.Date, null: String))
        .toDF("MemberSK", "MemberID", "MemberBK", "FirstName", "LastName",
          "DOB", "Gender"))

    val dimPlan = Sk.withSk(
      src("insuranceplan").as("p")
        .join(src("payer").as("py"), $"p.PayerID" === $"py.PayerID")
        .select($"p.PlanID", $"p.PlanName", $"p.PlanType",
          $"py.PayerID", $"py.PayerName", $"py.PayerType"),
      "PlanSK", "PlanID",
      Seq((0, -1, "Unknown Plan", "Unknown", -1, "Unknown Payer", "Unknown"))
        .toDF("PlanSK", "PlanID", "PlanName", "PlanType", "PayerID",
          "PayerName", "PayerType"))

    val dimProvider = Sk.withSk(
      src("provider").select($"NPI", $"ProviderName", $"ProviderType"),
      "ProviderSK", "NPI",
      Seq((0, "0000000000", "Unknown Provider", "Unknown"))
        .toDF("ProviderSK", "NPI", "ProviderName", "ProviderType"))

    val dimDiagnosis = Sk.withSk(
      src("ref_icd10"),
      "DiagnosisSK", "ICD10Code",
      Seq((0, "UNK", "Unknown Diagnosis", null: String, null: String))
        .toDF("DiagnosisSK", "ICD10Code", "ShortDesc", "Chapter", "Category"))

    val dimProcedure = Sk.withSk(
      src("ref_cpt_hcpcs"),
      "ProcedureSK", "CPTCode",
      Seq((0, "UNK", "Unknown Procedure", null: String))
        .toDF("ProcedureSK", "CPTCode", "ShortDesc", "Category"))

    val dimPOS = Sk.withSk(
      src("ref_pos"),
      "POSSK", "POSCode",
      Seq((0, "000", "Unknown POS")).toDF("POSSK", "POSCode", "POSDescription"))

    val dimQualityMeasure = Sk.withSk(
      src("ref_qualitymeasure"),
      "MeasureSK", "MeasureID",
      Seq((0, "UNK", "Unknown Measure", "Unknown"))
        .toDF("MeasureSK", "MeasureID", "MeasureName", "Owner"))

    Dims(dimDate, dimMember, dimPlan, dimProvider, dimDiagnosis,
      dimProcedure, dimPOS, dimQualityMeasure)
  }

  def buildFacts(s: SparkSession, dims: Dims): Facts =
    buildFacts(s, dims, Sources.fixtures(s))

  def buildFacts(s: SparkSession, dims: Dims, src: Sources.Sources): Facts = {
    import s.implicits._
    val dm = broadcast(dims.dimMember.select("MemberSK", "MemberID")).as("dm")
    val dp = broadcast(dims.dimPlan.select("PlanSK", "PlanID")).as("dp")
    val dprov = broadcast(dims.dimProvider.select("ProviderSK", "NPI")).as("dprov")
    val dproc = broadcast(dims.dimProcedure.select("ProcedureSK", "CPTCode")).as("dproc")
    val ddx = broadcast(dims.dimDiagnosis.select("DiagnosisSK", "ICD10Code")).as("ddx")
    val dpos = broadcast(dims.dimPOS.select("POSSK", "POSCode")).as("dpos")
    val dqm = broadcast(dims.dimQualityMeasure.select("MeasureSK", "MeasureID")).as("dqm")
    val dd = broadcast(dims.dimDate.select("DateSK"))

    // 6.1 FactClaimsLine (grain = billed line; first-proc/first-dx lookups)
    val cl = src("claimline").as("cl")
    val ch = src("claimheader").as("ch")
    val pay = src("claimpayment").as("pay")
    val cp = src("claimprocedure").filter($"ProcSeq" === 1).as("cp")
    val cd = src("claimdiagnosis").filter($"DxSeq" === 1).as("cd")
    val factClaimsLine = cl
      .join(ch, $"ch.ClaimID" === $"cl.ClaimID")
      .join(pay, $"pay.ClaimID" === $"cl.ClaimID"
        && $"pay.ClaimLineNo" === $"cl.ClaimLineNo", "left")
      .join(cp, $"cp.ClaimID" === $"cl.ClaimID"
        && $"cp.ClaimLineNo" === $"cl.ClaimLineNo", "left")
      .join(cd, $"cd.ClaimID" === $"cl.ClaimID", "left")
      .join(dm, $"dm.MemberID" === $"ch.MemberID", "left")
      .join(dp, $"dp.PlanID" === $"ch.PlanID", "left")
      .join(dprov,
        $"dprov.NPI" === coalesce($"cl.RenderingProviderNPI", $"ch.RenderingProviderNPI"),
        "left")
      .join(dproc, $"dproc.CPTCode" === $"cp.CPTCode", "left")
      .join(ddx, $"ddx.ICD10Code" === $"cd.ICD10Code", "left")
      .join(dpos, $"dpos.POSCode" === $"cl.POSCode", "left")
      .join(dd, $"DateSK" === dateSk($"cl.ServiceDate"), "left")
      .select(
        coalesce($"MemberSK", lit(0)).as("MemberSK"),
        coalesce($"PlanSK", lit(0)).as("PlanSK"),
        coalesce($"ProviderSK", lit(0)).as("ProviderSK"),
        coalesce($"ProcedureSK", lit(0)).as("ProcedureSK"),
        coalesce($"DiagnosisSK", lit(0)).as("DiagnosisSK"),
        coalesce($"POSSK", lit(0)).as("POSSK"),
        coalesce($"DateSK", lit(UnknownDateSk)).as("ServiceDateSK"),
        $"cl.ClaimID", $"cl.ClaimLineNo", $"cl.BilledAmount",
        $"pay.AllowedAmount", $"pay.PaidAmount", $"pay.PatientLiability")

    // 6.2 FactEncounters (LOS = DATEDIFF(day, admit, discharge))
    val e = src("encounter").as("e")
    val dd1 = dims.dimDate.select($"DateSK".as("EncDateSK"))
    val dd2 = dims.dimDate.select($"DateSK".as("AdmDateSK"))
    val dd3 = dims.dimDate.select($"DateSK".as("DisDateSK"))
    val factEncounters = e
      .join(dm, $"dm.MemberID" === $"e.MemberID", "left")
      .join(dp, $"dp.PlanID" === $"e.PlanID", "left")
      .join(dprov, $"dprov.NPI" === $"e.ProviderNPI", "left")
      .join(dpos, $"dpos.POSCode" === $"e.FacilityPOSCode", "left")
      .join(broadcast(dd1), $"EncDateSK" === dateSk($"e.EncounterDate"), "left")
      .join(broadcast(dd2), $"AdmDateSK" === dateSk($"e.AdmitDate"), "left")
      .join(broadcast(dd3), $"DisDateSK" === dateSk($"e.DischargeDate"), "left")
      .select(
        coalesce($"MemberSK", lit(0)).as("MemberSK"),
        coalesce($"PlanSK", lit(0)).as("PlanSK"),
        coalesce($"ProviderSK", lit(0)).as("ProviderSK"),
        coalesce($"POSSK", lit(0)).as("POSSK"),
        coalesce($"EncDateSK", lit(UnknownDateSk)).as("EncounterDateSK"),
        $"AdmDateSK".as("AdmitDateSK"),
        $"DisDateSK".as("DischargeDateSK"),
        when($"e.AdmitDate".isNotNull && $"e.DischargeDate".isNotNull,
          datediff($"e.DischargeDate", $"e.AdmitDate")).as("LOS_Days"),
        $"e.EncounterID")

    // 6.3 FactCareGaps (status → open/closed flags)
    val cg = src("caregap").as("cg")
    val ds2 = dims.dimDate.select($"DateSK".as("StartDateSK"))
    val de2 = dims.dimDate.select($"DateSK".as("EndDateSK"))
    val factCareGaps = cg
      .join(dm, $"dm.MemberID" === $"cg.MemberID", "left")
      .join(dqm, $"dqm.MeasureID" === $"cg.MeasureID", "left")
      .join(broadcast(ds2), $"StartDateSK" === dateSk($"cg.PeriodStart"), "left")
      .join(broadcast(de2), $"EndDateSK" === dateSk($"cg.PeriodEnd"), "left")
      .select(
        coalesce($"MemberSK", lit(0)).as("MemberSK"),
        coalesce($"MeasureSK", lit(0)).as("MeasureSK"),
        coalesce($"StartDateSK", lit(UnknownDateSk)).as("PeriodStartDateSK"),
        coalesce($"EndDateSK", lit(UnknownDateSk)).as("PeriodEndDateSK"),
        when($"cg.Status" === "OPEN", 1).otherwise(0).as("GapOpenFlag"),
        when($"cg.Status" === "CLOSED", 1).otherwise(0).as("GapClosedFlag"),
        dateSk($"cg.ClosedDate").as("ClosedDateSK"))

    // 6.4 FactEligibilityMonthly
    val en = src("enrollment").as("en")
    val factEligibilityMonthly = en
      .join(dm, $"dm.MemberID" === $"en.MemberID", "left")
      .join(dp, $"dp.PlanID" === $"en.PlanID", "left")
      .join(dd, $"DateSK" === dateSk($"en.EnrollmentMonth"), "left")
      .select(
        coalesce($"MemberSK", lit(0)).as("MemberSK"),
        coalesce($"PlanSK", lit(0)).as("PlanSK"),
        coalesce($"DateSK", lit(UnknownDateSk)).as("MonthDateSK"),
        $"en.IsActive")

    Facts(factClaimsLine, factEncounters, factCareGaps, factEligibilityMonthly)
  }
}
