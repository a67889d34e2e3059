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

  test("oracle coverage matches the documented 173/180 split") {
    assert(SparkEntry.queries.size === 180)
    assert(SparkEntry.oracleSql.size === 173)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the 7 intrinsically non-oracle-able operators (ANN internals —
    // x_media_neardup routes through the IVF-PQ quantizers, same reason
    // as the x_ann_* family; the two approximate knn-join variants'
    // candidate coverage is likewise quantizer/hash-table-dependent, and
    // their recall is measured against the ORACLE-BACKED x_knn_join in
    // RECALL_r*.json), and only those — the multimodal feature pair
    // became oracle-backed in round 5 when the codecs became real, and
    // x_approx_agg in round 12 when it became a bound-check (exact side
    // oracle-checked, sketch-within-ε flags asserted as literal TRUE)
    assert(rowsOnly === Set("x_ann_lsh", "x_ann_ivf", "x_ann_pq",
      "x_ann_ivfpq", "x_media_neardup",
      "x_knn_join_ivf", "x_knn_join_lsh"))
  }
}
