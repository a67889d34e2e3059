package graft

import graft.queries.Analytics
import graft.model.Fixtures
import org.apache.spark.sql.functions._

/** Reference analytics queries on the healthcare fixtures: results
  * cross-checked against independent SQL formulations of the same
  * semantics over the registered views. */
class AnalyticsSpec extends SparkSpec {

  test("billed vs allowed by plan matches SQL formulation") {
    Fixtures.registerAll(spark)
    val df = Analytics.billedVsAllowedByPlan(spark)
    val viaSql = spark.sql(
      """SELECT p.PlanName,
        |  SUM(cl.BilledAmount) AS TotalBilled,
        |  SUM(COALESCE(pay.AllowedAmount, 0)) AS TotalAllowed,
        |  SUM(COALESCE(pay.PaidAmount, 0)) AS TotalPaid
        |FROM claimline cl
        |JOIN claimheader ch ON ch.ClaimID = cl.ClaimID
        |JOIN insuranceplan p ON p.PlanID = ch.PlanID
        |LEFT JOIN claimpayment pay
        |  ON pay.ClaimID = cl.ClaimID AND pay.ClaimLineNo = cl.ClaimLineNo
        |WHERE ch.ClaimDate >= '2025-01-01' AND ch.ClaimDate < '2025-04-01'
        |GROUP BY p.PlanName ORDER BY p.PlanName""".stripMargin)
    assert(df.collect().toSeq === viaSql.collect().toSeq)
    assert(df.count() > 0)
  }

  test("contract rate lookup: every claim line with ProcSeq=1 is present") {
    val df = Analytics.contractRateLookup(spark)
    // 17 first-proc claim lines; contracts can fan out per plan
    assert(df.select("ClaimNumber", "ClaimLineNo").distinct().count() === 17)
  }

  test("interventions vs closed gaps: one row per member, fan-out preserved") {
    val df = Analytics.interventionsVsClosedGaps(spark).collect()
    assert(df.length === 12)
    // Fan-out: total intervention count across members exceeds the raw 19
    // (reference semantics replicated, SURVEY §7.4 item 3).
    val total = df.map(_.getAs[Long]("Interventions")).sum
    assert(total >= 19)
    assert(df.forall(r => Set(0, 1).contains(r.getAs[Int]("A1cGapClosed"))))
  }

  test("claims with member & plan: one row per claim header") {
    assert(Analytics.claimsWithMemberPlan(spark).count() === 10)
  }

  test("providers used in claims resolve by NPI (left join keeps unmatched)") {
    val rows = Analytics.providersUsedInClaims(spark).collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getAs[String]("RenderingProviderNPI") != null))
  }

  test("tasks per care manager: one row per user, fan-out preserved") {
    val rows = Analytics.tasksPerCareManager(spark).collect()
    assert(rows.length === 6)
    // fan-out: intervention count sums exceed the raw 19 interventions
    assert(rows.map(_.getAs[Long]("InterventionsCount")).sum >= 19)
  }

  test("provider network by month covers all providers") {
    val df = Analytics.providerNetworkByMonth(spark)
    assert(df.select("NPI").distinct().count() === 12)
  }

  test("contracts per plan lists all 5 contracts") {
    assert(Analytics.contractsPerPlan(spark).count() === 5)
  }

  test("coverage as-of: open-ended periods match, ended ones respect EndDate") {
    val active = Analytics.coverageAsOf(spark, "2025-03-15").collect()
    assert(active.nonEmpty)
    active.foreach { r =>
      val end = r.getAs[java.sql.Date]("EndDate")
      assert(end == null || !end.before(java.sql.Date.valueOf("2025-03-15")))
    }
    // far future: only NULL-ended (still open) coverage remains
    val future = Analytics.coverageAsOf(spark, "2030-01-01").collect()
    assert(future.forall(_.getAs[java.sql.Date]("EndDate") == null))
  }

  test("encounter summary has LOS only for admitted encounters") {
    val rows = Analytics.encounterSummary(spark).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val hasAdmit = r.getAs[java.sql.Date]("AdmitDate") != null &&
        r.getAs[java.sql.Date]("DischargeDate") != null
      assert((r.getAs[Integer]("LOS_Days") != null) === hasAdmit)
    }
  }
}
