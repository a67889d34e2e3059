package graft

/** Guards the contract surface against documentation drift: every declared
  * query must be listed in SURVEY.md §8 (the judge-checked coverage map),
  * and every oracle entry must correspond to a declared query. */
class CoverageSpec extends SparkSpec {

  test("every SparkEntry.queries key appears in SURVEY.md §8") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val section8 = survey.substring(survey.indexOf("## 8."))
    val missing = SparkEntry.queries.keys.filterNot(section8.contains)
    assert(missing.isEmpty, s"queries missing from SURVEY §8: ${missing.toList.sorted}")
  }

  test("every oracleSql key is a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: ${orphans.toList.sorted}")
  }

  test("oracle coverage is total: every declared query is oracle-backed") {
    assert(SparkEntry.queries.size === 180)
    // Since r15 there are NO rows-only entries left: the six approximate
    // ANN operators (x_ann_{lsh,ivf,pq,ivfpq}, x_knn_join_{ivf,lsh}) —
    // whose ranked output depends on quantizer/hash-table internals no
    // portable SQL can replicate — register their recall CONTRACT
    // instead, via the x_approx_agg bound-check pattern: the entry joins
    // the raw top-k against the in-plan exact baseline and the oracle
    // recomputes the deterministic columns and asserts the recall flags
    // as literal TRUE. The raw top-k frames live in Similarity.rawAnn
    // (Recall harness + specs); drift past the registered bounds now
    // fails the hash gate mechanically.
    assert(SparkEntry.oracleSql.size === 180)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set.empty[String])
  }
}
