package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared surrogate-key assignment (reference IDENTITY emulation,
  * SURVEY §7.4): a literal Unknown SK=0 row unioned before the generated
  * keys. One implementation, used by both the star and snowflake builders.
  *
  * Two key generators:
  *  - default (`scalable = false`): `row_number()` over a global
  *    natural-key order — REPRODUCIBLE SKs (same input → same SK on every
  *    run/engine; the DuckDB oracle can recompute them), but the window is
  *    single-partition, so it is the dimension-sized path;
  *  - `scalable = true`: `monotonically_increasing_id() + 1` —
  *    partition-encoded, collision-free, no global sort or single-partition
  *    window, fully parallel at any dimension size. SKs are NOT
  *    reproducible across runs or repartitionings; fact joins only need
  *    within-run CONSISTENCY (every consumer sees the same key→SK map),
  *    which the eager localCheckpoint pins: the assignment is materialized
  *    once, so forked consumers (fact build + audits) cannot observe two
  *    different evaluations. The +1 keeps partition 0's first id clear of
  *    the Unknown row's SK=0.
  */
object Sk {
  def withSk(df: DataFrame, skName: String, orderCol: String,
      unknown: DataFrame, scalable: Boolean = false): DataFrame =
    if (scalable) {
      val numbered = df.withColumn(skName, monotonically_increasing_id() + 1)
      unknown.unionByName(numbered.select(unknown.columns.map(col): _*))
        .localCheckpoint(true)
    } else {
      val numbered = df.withColumn(skName,
        row_number().over(Window.orderBy(col(orderCol))))
      unknown.unionByName(numbered.select(unknown.columns.map(col): _*))
    }
}
