package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table provider for the DW builders: the ETL is a pure function of its
  * sources, so the same [[Star]]/[[Snowflake]] code runs off in-memory
  * fixtures (reference-parity tests) or a parquet lake (the scale path).
  * Names are the lowercase reference table names used by [[Fixtures]].
  */
object Sources {
  type Sources = String => DataFrame

  /** Reference seed data as in-memory DataFrames. */
  def fixtures(s: SparkSession): Sources = {
    val fns: Map[String, SparkSession => DataFrame] = Map(
      "member" -> Fixtures.member, "payer" -> Fixtures.payer,
      "insuranceplan" -> Fixtures.insuranceplan,
      "enrollment" -> Fixtures.enrollment,
      "claimheader" -> Fixtures.claimheader, "claimline" -> Fixtures.claimline,
      "claimdiagnosis" -> Fixtures.claimdiagnosis,
      "claimprocedure" -> Fixtures.claimprocedure,
      "claimpayment" -> Fixtures.claimpayment,
      "encounter" -> Fixtures.encounter, "caregap" -> Fixtures.caregap,
      "provider" -> Fixtures.provider, "organization" -> Fixtures.organization,
      "location" -> Fixtures.location, "specialty" -> Fixtures.specialty,
      "providerspecialty" -> Fixtures.providerspecialty,
      "ref_icd10" -> Fixtures.ref_icd10,
      "ref_cpt_hcpcs" -> Fixtures.ref_cpt_hcpcs,
      "ref_pos" -> Fixtures.ref_pos,
      "ref_qualitymeasure" -> Fixtures.ref_qualitymeasure)
    name => fns(name)(s)
  }

  /** Parquet-lake sources: one parquet dataset per table under `dir`. */
  def parquet(s: SparkSession, dir: String): Sources =
    name => s.read.parquet(s"$dir/$name.parquet")

  /** Materialize the fixture tables as a parquet lake (test/demo helper —
    * production data would land here via ingest instead). */
  def writeFixtureLake(s: SparkSession, dir: String): Unit = {
    val src = fixtures(s)
    Seq("member", "payer", "insuranceplan", "enrollment", "claimheader",
      "claimline", "claimdiagnosis", "claimprocedure", "claimpayment",
      "encounter", "caregap", "provider", "organization", "location",
      "specialty", "providerspecialty", "ref_icd10", "ref_cpt_hcpcs",
      "ref_pos", "ref_qualitymeasure")
      .foreach(n => src(n).write.mode("overwrite").parquet(s"$dir/$n.parquet"))
  }
}
