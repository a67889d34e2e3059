package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Fixtures

/** The reference's reporting/analytics queries on the healthcare fixtures
  * (SURVEY §3 entry point 3). Semantics are replicated exactly — including
  * the deliberate LEFT-JOIN fan-out double-counting in the care-gap query
  * (SURVEY §7.4 watch-list item 3) — and asserted in AnalyticsSpec.
  */
object Analytics {

  /** "Billed vs allowed by plan", Jan–Mar 2025
    * (Claims & Encounters.sql:381-392). */
  def billedVsAllowedByPlan(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.claimline(s).as("cl")
      .join(Fixtures.claimheader(s).as("ch"), $"ch.ClaimID" === $"cl.ClaimID")
      .join(broadcast(Fixtures.insuranceplan(s).as("p")),
        $"p.PlanID" === $"ch.PlanID")
      .join(Fixtures.claimpayment(s).as("pay"),
        $"pay.ClaimID" === $"cl.ClaimID"
          && $"pay.ClaimLineNo" === $"cl.ClaimLineNo", "left")
      .filter($"ch.ClaimDate" >= lit("2025-01-01") && $"ch.ClaimDate" < lit("2025-04-01"))
      .groupBy($"p.PlanName")
      .agg(
        sum($"cl.BilledAmount").as("TotalBilled"),
        sum(coalesce($"pay.AllowedAmount", lit(0))).as("TotalAllowed"),
        sum(coalesce($"pay.PaidAmount", lit(0))).as("TotalPaid"))
      .orderBy($"PlanName")
  }

  /** "Contract rate lookup" — claim line CPTs joined to contract rates
    * (ProviderNetwork.sql:254-270). */
  def contractRateLookup(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.claimprocedure(s).filter($"ProcSeq" === 1).as("cp")
      .join(Fixtures.claimline(s).as("cl"),
        $"cl.ClaimID" === $"cp.ClaimID" && $"cl.ClaimLineNo" === $"cp.ClaimLineNo")
      .join(Fixtures.claimheader(s).as("ch"), $"ch.ClaimID" === $"cl.ClaimID")
      .join(broadcast(Fixtures.insuranceplan(s).as("plans")),
        $"plans.PlanID" === $"ch.PlanID")
      .join(broadcast(Fixtures.contract(s).as("c")),
        $"c.PlanID" === $"ch.PlanID", "left")
      .join(broadcast(Fixtures.organization(s).as("org")),
        $"org.OrgID" === $"c.OrgID", "left")
      .join(broadcast(Fixtures.contractrate(s).as("cr")),
        $"cr.ContractID" === $"c.ContractID" && $"cr.CPTCode" === $"cp.CPTCode",
        "left")
      .select($"ch.ClaimNumber", $"cl.ClaimLineNo", $"cp.CPTCode",
        $"plans.PlanName", $"org.OrgName",
        $"cr.AllowedAmount".as("ContractAllowed"))
      .orderBy($"ClaimNumber", $"ClaimLineNo")
  }

  /** "Did interventions help close diabetes A1c gaps?"
    * (CareManagementCCA.sql:338-349). The two parallel LEFT JOINs fan out —
    * Interventions counts are inflated by gap rows. Replicated, not fixed. */
  def interventionsVsClosedGaps(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.member(s).as("m")
      .join(Fixtures.caregap(s).as("cg"),
        $"cg.MemberID" === $"m.MemberID" && $"cg.MeasureID" === "QM001", "left")
      .join(Fixtures.careplan(s).as("cp"),
        $"cp.MemberID" === $"m.MemberID", "left")
      .join(Fixtures.intervention(s).as("i"),
        $"i.CarePlanID" === $"cp.CarePlanID", "left")
      .groupBy($"m.MemberID", $"m.FirstName", $"m.LastName")
      .agg(
        max(when($"cg.Status" === "CLOSED" && $"cg.MeasureID" === "QM001", 1)
          .otherwise(0)).as("A1cGapClosed"),
        count($"i.InterventionID").as("Interventions"))
      .orderBy($"MemberID")
  }

  /** "Claims with member & plan (header level)"
    * (Claims & Encounters.sql:358-366). */
  def claimsWithMemberPlan(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.claimheader(s).as("ch")
      .join(broadcast(Fixtures.member(s).as("m")), $"ch.MemberID" === $"m.MemberID")
      .join(broadcast(Fixtures.insuranceplan(s).as("p")), $"ch.PlanID" === $"p.PlanID")
      .select($"ch.ClaimID", $"ch.ClaimNumber", $"ch.ClaimDate", $"ch.ClaimStatus",
        $"m.MemberBK", $"m.FirstName", $"m.LastName",
        $"p.PlanName", $"p.PlanType", $"ch.POSCode")
      .orderBy($"ClaimID")
  }

  /** "Providers used in claims with their names" (ProviderNetwork.sql:246-251):
    * left join on the natural NPI key — unmatched NPIs surface as nulls. */
  def providersUsedInClaims(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.claimheader(s).as("ch")
      .join(broadcast(Fixtures.provider(s).as("p")),
        $"p.NPI" === $"ch.RenderingProviderNPI", "left")
      .select($"ch.ClaimID", $"ch.ClaimNumber", $"ch.RenderingProviderNPI",
        $"p.ProviderName", $"p.ProviderType")
      .distinct()
      .orderBy($"ClaimID")
  }

  /** "Tasks & interventions completed per care manager"
    * (CareManagementCCA.sql:319-326). Both LEFT JOINs fan out per user —
    * intervention counts multiply by task rows. Replicated, not fixed. */
  def tasksPerCareManager(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.cca_user(s).as("u")
      .join(Fixtures.caretask(s).as("t"),
        $"t.AssignedUserID" === $"u.UserID", "left")
      .join(Fixtures.intervention(s).as("i"), $"i.UserID" === $"u.UserID", "left")
      .groupBy($"u.UserName")
      .agg(sum(when($"t.Status" === "Done", 1).otherwise(0)).as("TasksDone"),
        count($"i.InterventionID").as("InterventionsCount"))
      .orderBy($"UserName")
  }

  /** "Provider in/out network by month & plan" (ProviderNetwork.sql:274-283). */
  def providerNetworkByMonth(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.provider(s).as("p")
      .join(Fixtures.providerlocation(s).as("plm"),
        $"plm.ProviderID" === $"p.ProviderID", "left")
      .join(Fixtures.location(s).as("pl"),
        $"pl.LocationID" === $"plm.LocationID", "left")
      .join(Fixtures.networkstatus(s).as("ns"),
        $"ns.ProviderID" === $"p.ProviderID", "left")
      .select($"p.ProviderName", $"p.NPI", $"pl.LocationName",
        $"ns.PlanID", $"ns.Yyyymm", $"ns.Status")
      .orderBy($"ProviderName", $"Yyyymm")
  }

  /** "Which orgs/providers have contracts per plan" (ProviderNetwork.sql:286-293). */
  def contractsPerPlan(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.contract(s).as("c")
      .join(Fixtures.insuranceplan(s).as("plans"),
        $"plans.PlanID" === $"c.PlanID", "left")
      .join(Fixtures.organization(s).as("org"), $"org.OrgID" === $"c.OrgID", "left")
      .join(Fixtures.provider(s).as("prov"),
        $"prov.ProviderID" === $"c.ProviderID", "left")
      .select($"plans.PlanName", $"c.ContractName", $"c.ContractScope",
        $"org.OrgName", $"prov.ProviderName", $"c.EffectiveDate", $"c.EndDate")
      .orderBy($"PlanName", $"ContractName")
  }

  /** [EXT] Point-in-time coverage lookup over CoveragePeriod's open-ended
    * intervals (StartDate..EndDate, NULL = still open) — the as-of shape
    * SURVEY §2.3 flags as the natural extension the reference stores data
    * for but never queries. */
  def coverageAsOf(s: SparkSession, asOf: String): DataFrame = {
    import s.implicits._
    Fixtures.coverageperiod(s).as("cp")
      .filter($"cp.StartDate" <= lit(asOf)
        && coalesce($"cp.EndDate", lit("9999-12-31").cast("date")) >= lit(asOf))
      .join(broadcast(Fixtures.member(s).as("m")), $"m.MemberID" === $"cp.MemberID")
      .join(broadcast(Fixtures.insuranceplan(s).as("p")), $"p.PlanID" === $"cp.PlanID")
      .select($"m.MemberID", $"m.FirstName", $"m.LastName", $"p.PlanName",
        $"cp.StartDate", $"cp.EndDate")
      .orderBy($"MemberID", $"PlanName")
  }

  /** "Encounters summary with LOS" (Claims & Encounters.sql:395-401). */
  def encounterSummary(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.encounter(s).as("e")
      .join(broadcast(Fixtures.member(s).as("m")), $"e.MemberID" === $"m.MemberID")
      .join(broadcast(Fixtures.insuranceplan(s).as("p")), $"e.PlanID" === $"p.PlanID")
      .select($"e.EncounterID", $"m.FirstName", $"m.LastName", $"p.PlanName",
        $"e.EncounterType", $"e.EncounterDate", $"e.AdmitDate", $"e.DischargeDate",
        datediff($"e.DischargeDate", $"e.AdmitDate").as("LOS_Days"))
      .orderBy($"EncounterID")
  }
}
