package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snowflake-schema DW build (reference: SnowflakeSchemaForHealthcare.sql).
  *
  * Shares DimDate/DimMember/DimProvider/DimDiagnosis/DimProcedure/DimPOS/
  * DimQualityMeasure and all four fact loads with [[Star]] (the reference's
  * snowflake facts are identical loads); what changes is normalization:
  * Payer is split out of Plan (PlanSK→PayerSK), Location hangs off Org, and
  * provider specialties land in a bridge table.
  */
object Snowflake {

  case class SnowDims(
      dimPayer: DataFrame, dimPlan: DataFrame, dimOrg: DataFrame,
      dimLocation: DataFrame, dimSpecialty: DataFrame,
      bridgeProviderSpecialty: DataFrame)

  def buildDims(s: SparkSession, star: Star.Dims): SnowDims =
    buildDims(s, star, Sources.fixtures(s))

  def buildDims(s: SparkSession, star: Star.Dims,
      src: Sources.Sources): SnowDims = {
    import s.implicits._

    val dimPayer = Sk.withSk(
      src("payer").select($"PayerID", $"PayerName", $"PayerType"),
      "PayerSK", "PayerID",
      Seq((0, -1, "Unknown Payer", "Unknown"))
        .toDF("PayerSK", "PayerID", "PayerName", "PayerType"))

    // Normalized DimPlan: PayerSK lookup instead of denormalized payer cols
    // (SnowflakeSchemaForHealthcare.sql:226-230).
    val dimPlan = Sk.withSk(
      src("insuranceplan").as("p")
        .join(broadcast(dimPayer).as("dpy"), $"dpy.PayerID" === $"p.PayerID")
        .select($"p.PlanID", $"p.PlanName", $"p.PlanType", $"dpy.PayerSK"),
      "PlanSK", "PlanID",
      Seq((0, -1, "Unknown Plan", "Unknown", 0))
        .toDF("PlanSK", "PlanID", "PlanName", "PlanType", "PayerSK"))

    val dimOrg = Sk.withSk(
      src("organization").select($"OrgID", $"OrgName", $"TaxID"),
      "OrgSK", "OrgID",
      Seq((0, -1, "Unknown Org", null: String))
        .toDF("OrgSK", "OrgID", "OrgName", "TaxID"))

    // DimLocation: OrgSK lookup (SnowflakeSchemaForHealthcare.sql:238-242).
    val dimLocation = Sk.withSk(
      src("location").as("l")
        .join(broadcast(dimOrg).as("do"), $"do.OrgID" === $"l.OrgID")
        .select($"l.LocationID", $"do.OrgSK", $"l.LocationName",
          $"l.City", $"l.State", $"l.Zip"),
      "LocationSK", "LocationID",
      Seq((0, -1, 0, "Unknown Location", "Unknown", "??", "00000"))
        .toDF("LocationSK", "LocationID", "OrgSK", "LocationName",
          "City", "State", "Zip"))

    val dimSpecialty = Sk.withSk(
      src("specialty").select($"SpecialtyCode", $"SpecialtyName"),
      "SpecialtySK", "SpecialtyCode",
      Seq((0, "UNK", "Unknown Specialty"))
        .toDF("SpecialtySK", "SpecialtyCode", "SpecialtyName"))

    // Bridge: provider NPI → ProviderSK, specialty code → SpecialtySK
    // (4-way join, SnowflakeSchemaForHealthcare.sql:256-265).
    val bridge = src("providerspecialty").as("ps")
      .join(src("provider").as("pr"), $"pr.ProviderID" === $"ps.ProviderID")
      .join(broadcast(star.dimProvider.select("ProviderSK", "NPI")).as("dpr"),
        $"dpr.NPI" === $"pr.NPI")
      .join(broadcast(dimSpecialty).as("dsp"),
        $"dsp.SpecialtyCode" === $"ps.SpecialtyCode")
      .select($"dpr.ProviderSK", $"dsp.SpecialtySK")
      .distinct()

    SnowDims(dimPayer, dimPlan, dimOrg, dimLocation, dimSpecialty, bridge)
  }
}
