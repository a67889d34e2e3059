#!/usr/bin/env python3
"""Generate src/main/scala/graft/model/Fixtures.scala from the reference's
seed INSERT statements (data parity — values only, architecture is ours).

Type codes: i=int, s=string, d=date, m=decimal(12,2), u=decimal(9,2),
p=decimal(5,2), b=boolean(from BIT 0/1). A leading '*' on the signature
means the table has an IDENTITY first column omitted from INSERTs —
rows get 1..n in insertion order.
"""
import re, sys

REF = "/root/reference"

# table -> (source file, identity_col_or_None, [(colname, type), ...])
SPEC = {
    # s1_elig
    "Member":        ("Members&EligibilitySource.sql", "MemberID",
                      [("MemberBK","s"),("FirstName","s"),("LastName","s"),("DOB","d"),("Gender","s"),("SSN","s")]),
    "Payer":         ("Members&EligibilitySource.sql", "PayerID",
                      [("PayerName","s"),("PayerType","s")]),
    "InsurancePlan": ("Members&EligibilitySource.sql", "PlanID",
                      [("PayerID","i"),("PlanName","s"),("PlanType","s"),("CoverageLevel","s")]),
    "Enrollment":    ("Members&EligibilitySource.sql", "EnrollmentID",
                      [("MemberID","i"),("PlanID","i"),("EnrollmentMonth","d"),("IsActive","b")]),
    "MemberAddress": ("Members&EligibilitySource.sql", "AddressID",
                      [("MemberID","i"),("AddressLine1","s"),("AddressLine2","s"),("City","s"),
                       ("State","s"),("ZipCode","s")]),
    "MemberContact": ("Members&EligibilitySource.sql", "ContactID",
                      [("MemberID","i"),("Phone","s"),("Email","s")]),
    "CoveragePeriod":("Members&EligibilitySource.sql", "CoverageID",
                      [("MemberID","i"),("PlanID","i"),("StartDate","d"),("EndDate","d")]),
    "DualStatus":    ("Members&EligibilitySource.sql", "DualID",
                      [("MemberID","i"),("StatusCode","s"),("EffectiveDate","d")]),
    "SubsidyLIS":    ("Members&EligibilitySource.sql", "LISID",
                      [("MemberID","i"),("SubsidyLevel","s"),("EffectiveDate","d")]),
    "MemberLanguagePref": ("Members&EligibilitySource.sql", "PrefID",
                      [("MemberID","i"),("Language","s"),("EffectiveDate","d")]),
    # s2_claims
    "PlaceOfService":("Claims & Encounters.sql", None,
                      [("POSCode","s"),("POSDescription","s")]),
    "ClaimHeader":   ("Claims & Encounters.sql", "ClaimID",
                      [("ClaimNumber","s"),("MemberID","i"),("PlanID","i"),("ClaimDate","d"),
                       ("RenderingProviderNPI","s"),("POSCode","s"),("ClaimStatus","s")]),
    "ClaimLine":     ("Claims & Encounters.sql", None,
                      [("ClaimID","i"),("ClaimLineNo","i"),("ServiceDate","d"),("POSCode","s"),
                       ("Units","u"),("RevenueCode","s"),("BilledAmount","m"),("RenderingProviderNPI","s")]),
    "ClaimDiagnosis":("Claims & Encounters.sql", None,
                      [("ClaimID","i"),("DxSeq","i"),("ICD10Code","s")]),
    "ClaimProcedure":("Claims & Encounters.sql", None,
                      [("ClaimID","i"),("ClaimLineNo","i"),("ProcSeq","i"),("CPTCode","s"),
                       ("Modifier1","s"),("Modifier2","s")]),
    "ClaimAdjustment": ("Claims & Encounters.sql", "AdjustmentID",
                      [("ClaimID","i"),("ClaimLineNo","i"),("AdjGroupCode","s"),("AdjReasonCode","s"),
                       ("AdjAmount","m"),("RemarkCode","s")]),
    "ClaimPayment":  ("Claims & Encounters.sql", "PaymentID",
                      [("ClaimID","i"),("ClaimLineNo","i"),("AllowedAmount","m"),("PaidAmount","m"),
                       ("PatientLiability","m"),("PaymentDate","d")]),
    "Encounter":     ("Claims & Encounters.sql", "EncounterID",
                      [("MemberID","i"),("PlanID","i"),("EncounterDate","d"),("EncounterType","s"),
                       ("AdmitDate","d"),("DischargeDate","d"),("FacilityPOSCode","s"),("ProviderNPI","s")]),
    "EncounterDiagnosis": ("Claims & Encounters.sql", None,
                      [("EncounterID","i"),("DxSeq","i"),("ICD10Code","s")]),
    "EncounterProcedure": ("Claims & Encounters.sql", None,
                      [("EncounterID","i"),("ProcSeq","i"),("CPTCode","s")]),
    # s3_cca
    "QualityMeasure":("CareManagementCCA.sql", None,
                      [("MeasureID","s"),("MeasureName","s"),("Owner","s")]),
    "CCA_User":      ("CareManagementCCA.sql", "UserID",
                      [("UserName","s"),("Role","s")]),
    "CareProgram":   ("CareManagementCCA.sql", "ProgramID",
                      [("ProgramName","s"),("Description","s")]),
    "CareGoal":      ("CareManagementCCA.sql", "GoalID",
                      [("CarePlanID","i"),("GoalText","s"),("TargetDate","d"),("Status","s")]),
    "CareTask":      ("CareManagementCCA.sql", "TaskID",
                      [("CarePlanID","i"),("GoalID","i"),("TaskText","s"),("DueDate","d"),
                       ("Status","s"),("AssignedUserID","i")]),
    "Assessment":    ("CareManagementCCA.sql", "AssessmentID",
                      [("MemberID","i"),("ProgramID","i"),("AssessmentDate","d"),
                       ("AssessmentType","s"),("Score","u"),("Notes","s")]),
    "RiskScore":     ("CareManagementCCA.sql", "RiskID",
                      [("MemberID","i"),("RiskModel","s"),("Score","u"),("RiskTier","s"),
                       ("EffectiveDate","d")]),
    "CarePlan":      ("CareManagementCCA.sql", "CarePlanID",
                      [("MemberID","i"),("ProgramID","i"),("PlanID","i"),("StartDate","d"),
                       ("EndDate","d"),("Status","s"),("AssignedUserID","i")]),
    "CareGap":       ("CareManagementCCA.sql", "GapID",
                      [("MemberID","i"),("MeasureID","s"),("PeriodStart","d"),("PeriodEnd","d"),
                       ("Status","s"),("ClosedDate","d")]),
    "Intervention":  ("CareManagementCCA.sql", "InterventionID",
                      [("CarePlanID","i"),("TaskID","i"),("UserID","i"),("InterventionDate","d"),
                       ("InterventionType","s"),("MinutesSpent","i"),("Notes","s")]),
    # s4_provider
    "Organization":  ("ProviderNetwork.sql", "OrgID",
                      [("OrgName","s"),("TaxID","s")]),
    "Location":      ("ProviderNetwork.sql", "LocationID",
                      [("OrgID","i"),("LocationName","s"),("AddressLine1","s"),("City","s"),
                       ("State","s"),("Zip","s")]),
    "Provider":      ("ProviderNetwork.sql", "ProviderID",
                      [("NPI","s"),("ProviderName","s"),("ProviderType","s"),("IsActive","b")]),
    "Specialty":     ("ProviderNetwork.sql", None,
                      [("SpecialtyCode","s"),("SpecialtyName","s")]),
    "ProviderSpecialty": ("ProviderNetwork.sql", None,
                      [("ProviderID","i"),("SpecialtyCode","s")]),
    "ProviderLocation": ("ProviderNetwork.sql", None,
                      [("ProviderID","i"),("LocationID","i"),("StartDate","d"),("EndDate","d")]),
    "NetworkStatus": ("ProviderNetwork.sql", None,
                      [("ProviderID","i"),("PlanID","i"),("Yyyymm","s"),("Status","s")]),
    "Affiliation":   ("ProviderNetwork.sql", None,
                      [("ProviderID","i"),("OrgID","i"),("StartDate","d"),("EndDate","d")]),
    "Contract":      ("ProviderNetwork.sql", "ContractID",
                      [("PayerID","i"),("PlanID","i"),("ContractName","s"),("EffectiveDate","d"),
                       ("EndDate","d"),("ContractScope","s"),("OrgID","i"),("ProviderID","i")]),
    "ContractRate":  ("ProviderNetwork.sql", None,
                      [("ContractID","i"),("CPTCode","s"),("EffectiveDate","d"),("AllowedAmount","m")]),
    # s5_ref
    "Ref_ICD10":     ("ReferenceData.sql", None,
                      [("ICD10Code","s"),("ShortDesc","s"),("Chapter","s"),("Category","s")]),
    "Ref_CPT_HCPCS": ("ReferenceData.sql", None,
                      [("CPTCode","s"),("ShortDesc","s"),("Category","s")]),
    "Ref_POS":       ("ReferenceData.sql", None,
                      [("POSCode","s"),("POSDescription","s")]),
    "Ref_QualityMeasure": ("ReferenceData.sql", None,
                      [("MeasureID","s"),("MeasureName","s"),("Owner","s")]),
    "Ref_NDC":       ("ReferenceData.sql", None,
                      [("NDC","s"),("Generic","s"),("Brand","s"),("Strength","s"),
                       ("DosageForm","s"),("Route","s")]),
    "Ref_LOINC":     ("ReferenceData.sql", None,
                      [("LOINCCode","s"),("Component","s"),("Property","s"),("Scale","s"),
                       ("Method","s"),("CommonName","s")]),
    "Ref_Benefit":   ("ReferenceData.sql", "BenefitID",
                      [("BenefitName","s"),("BenefitType","s")]),
    "Ref_PlanBenefit": ("ReferenceData.sql", None,
                      [("PlanID","i"),("BenefitID","i"),("Yyyymm","s"),("Copay","m"),
                       ("CoinsurancePct","p"),("LimitAmount","m")]),
    "Ref_Geo_ZipFips": ("ReferenceData.sql", None,
                      [("Zip","s"),("CountyFIPS","s"),("CountyName","s"),("State","s"),
                       ("Region","s")]),
    "Ref_AdjustmentCode": ("ReferenceData.sql", None,
                      [("GroupCode","s"),("ReasonCode","s"),("Description","s"),("IsRARC","b")]),
}

def strip_comments(sql):
    out, i, n, inq = [], 0, len(sql), False
    while i < n:
        c = sql[i]
        if inq:
            out.append(c)
            if c == "'":
                if i + 1 < n and sql[i+1] == "'":
                    out.append("'"); i += 1
                else:
                    inq = False
        else:
            if c == "'":
                inq = True; out.append(c)
            elif c == '-' and i + 1 < n and sql[i+1] == '-':
                while i < n and sql[i] != '\n': i += 1
                continue
            elif c == '/' and i + 1 < n and sql[i+1] == '*':
                i += 2
                while i + 1 < n and not (sql[i] == '*' and sql[i+1] == '/'): i += 1
                i += 1
            else:
                out.append(c)
        i += 1
    return ''.join(out)

def parse_tuples(body):
    """Split 'VALUES (..),(..)...' body into lists of literal strings."""
    tuples, i, n = [], 0, len(body)
    while i < n:
        if body[i] == '(':
            depth, i0, inq = 1, i + 1, False
            cur, items = [], []
            i += 1
            while i < n and depth > 0:
                c = body[i]
                if inq:
                    cur.append(c)
                    if c == "'":
                        if i + 1 < n and body[i+1] == "'":
                            cur.append("'"); i += 1
                        else:
                            inq = False
                else:
                    if c == "'": inq = True; cur.append(c)
                    elif c == '(': depth += 1; cur.append(c)
                    elif c == ')':
                        depth -= 1
                        if depth == 0: items.append(''.join(cur).strip())
                        else: cur.append(c)
                    elif c == ',' and depth == 1:
                        items.append(''.join(cur).strip()); cur = []
                    else: cur.append(c)
                i += 1
            tuples.append(items)
        else:
            i += 1
    return tuples

def scala_lit(raw, typ):
    raw = raw.strip()
    if raw.upper() == 'NULL': return 'null'
    if raw.startswith("'"):
        v = raw[1:-1].replace("''", "'")
        if typ == 'd': return f'D("{v}")'
        esc = v.replace('\\', '\\\\').replace('"', '\\"')
        return f'"{esc}"'
    if typ == 'b': return 'true' if raw in ('1', 'true') else 'false'
    if typ in ('m', 'u', 'p'): return f'M("{raw}")'
    if typ == 'i': return raw
    if typ == 'd': return f'D({raw})'
    return raw

SPARK_T = {'i': 'IntegerType', 's': 'StringType', 'd': 'DateType',
           'm': 'DecimalType(12, 2)', 'u': 'DecimalType(9, 2)',
           'p': 'DecimalType(5, 2)', 'b': 'BooleanType'}

def main():
    files = {}
    for tbl, (fname, ident, cols) in SPEC.items():
        if fname not in files:
            files[fname] = strip_comments(open(f"{REF}/{fname}", encoding='utf-8', errors='replace').read())
        sql = files[fname]
        pat = re.compile(r'INSERT\s+INTO\s+\w+\.' + re.escape(tbl) +
                         r'\s*\(([^)]*)\)\s*VALUES(.*?);', re.S | re.I)
        rows, inserted_cols = [], None
        for m in pat.finditer(sql):
            inserted_cols = [c.strip().strip('[]') for c in m.group(1).split(',')]
            rows.extend(parse_tuples(m.group(2)))
        if not rows:
            print(f"WARN no rows for {tbl}", file=sys.stderr); continue
        want = [c for c, _ in cols]
        if inserted_cols != want:
            print(f"WARN col mismatch {tbl}: insert={inserted_cols} spec={want}",
                  file=sys.stderr)
        SPEC[tbl] = (fname, ident, cols, rows)

    out = []
    out.append("""package graft.model

// GENERATED by tools/gen_fixtures.py — reference seed data (values only).
// Source: /root/reference/*.sql INSERT statements (SURVEY.md §1, FIXTURES.md §A).
// IDENTITY columns are materialized as 1..n in insertion order, matching
// SQL Server IDENTITY(1,1) semantics on the reference's ordered seed loads.

import java.sql.Date
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

object Fixtures {
  private def D(s: String): Date = Date.valueOf(s)
  private def M(s: String): java.math.BigDecimal =
    new java.math.BigDecimal(s).setScale(2)
  private def mk(s: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    s.createDataFrame(rows.asJava, schema)
""")
    for tbl, spec in SPEC.items():
        if len(spec) != 4: continue
        fname, ident, cols, rows = spec
        fields = []
        if ident: fields.append(f'    StructField("{ident}", IntegerType, nullable = false)')
        for c, t in cols:
            fields.append(f'    StructField("{c}", {SPARK_T[t]}, nullable = true)')
        out.append(f"  private val {tbl}Schema = StructType(Seq(\n" +
                   ",\n".join(fields) + "))\n")
        rlines = []
        for idx, r in enumerate(rows, start=1):
            vals = [scala_lit(v, t) for v, (_, t) in zip(r, cols)]
            if ident: vals.insert(0, str(idx))
            rlines.append("    Row(" + ", ".join(vals) + ")")
        out.append(f"  def {tbl.lower()}(s: SparkSession): DataFrame = mk(s, {tbl}Schema, Seq(\n" +
                   ",\n".join(rlines) + "))\n")
    out.append("""
  /** Register every fixture as a temp view named like the source table. */
  def registerAll(s: SparkSession): Unit = {
""")
    for tbl, spec in SPEC.items():
        if len(spec) != 4: continue
        out.append(f'    {tbl.lower()}(s).createOrReplaceTempView("{tbl.lower()}")\n')
    out.append("  }\n}\n")
    with open("src/main/scala/graft/model/Fixtures.scala", "w") as f:
        f.write("".join(out))
    for tbl, spec in SPEC.items():
        if len(spec) == 4:
            print(f"{tbl}: {len(spec[3])} rows")

if __name__ == "__main__":
    main()
