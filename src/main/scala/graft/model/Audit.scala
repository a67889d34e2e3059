package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ETL validation as assertion queries — the idiomatic Spark translation of
  * the reference's constraint checks (SURVEY §5): PK/FK/UNIQUE are not
  * engine-enforced, so they become 0-row anti-joins and count audits,
  * exactly like the reference's own embedded validation queries.
  */
object Audit {

  /** Row-count audit (StarSchemaForHealthcare.sql:393-405). */
  def rowCounts(tables: Seq[(String, DataFrame)]): DataFrame =
    tables.map { case (n, df) =>
      df.agg(count(lit(1)).as("cnt")).select(lit(n).as("t"), col("cnt"))
    }.reduce(_ unionByName _)

  /** Facts that fell back to Unknown SKs (StarSchemaForHealthcare.sql:407-422). */
  def unknownSkAudit(facts: Star.Facts): DataFrame = {
    def audit(name: String, df: DataFrame, skCols: Seq[String]): DataFrame = {
      val cond = skCols.map(col(_) === 0).reduce(_ || _)
      df.filter(cond).agg(count(lit(1)).as("RowsWithUnknown"))
        .select(lit(name).as("Where_"), col("RowsWithUnknown"))
    }
    Seq(
      audit("ClaimsLine Unknowns", facts.factClaimsLine,
        Seq("MemberSK", "PlanSK", "ProviderSK", "ProcedureSK", "DiagnosisSK", "POSSK")),
      audit("Encounters Unknowns", facts.factEncounters,
        Seq("MemberSK", "PlanSK", "ProviderSK", "POSSK")),
      audit("CareGaps Unknowns", facts.factCareGaps, Seq("MemberSK", "MeasureSK")),
      audit("Elig Unknowns", facts.factEligibilityMonthly, Seq("MemberSK", "PlanSK"))
    ).reduce(_ unionByName _)
  }

  /** Referential-integrity anti-joins, each expected to return 0 rows
    * (ReferenceData.sql:213-230). */
  def riChecks(s: SparkSession): Seq[(String, DataFrame)] = Seq(
    "claim_dx_in_icd10" ->
      Fixtures.claimdiagnosis(s)
        .join(Fixtures.ref_icd10(s), Seq("ICD10Code"), "left_anti"),
    "claim_proc_in_cpt" ->
      Fixtures.claimprocedure(s)
        .join(Fixtures.ref_cpt_hcpcs(s), Seq("CPTCode"), "left_anti"),
    "claim_pos_in_pos" ->
      Fixtures.claimline(s).select("POSCode").distinct()
        .join(Fixtures.ref_pos(s), Seq("POSCode"), "left_anti")
  )

  /** UNIQUE-constraint checks: duplicate natural keys must be 0. */
  def uniqueChecks(s: SparkSession): Seq[(String, DataFrame)] = Seq(
    "member_bk_unique" ->
      Fixtures.member(s).groupBy("MemberBK").count().filter(col("count") > 1),
    "enrollment_grain_unique" ->
      Fixtures.enrollment(s)
        .groupBy("MemberID", "PlanID", "EnrollmentMonth").count()
        .filter(col("count") > 1),
    "provider_npi_unique" ->
      Fixtures.provider(s).groupBy("NPI").count().filter(col("count") > 1)
  )
}
