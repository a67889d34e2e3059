package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared surrogate-key assignment (reference IDENTITY emulation,
  * SURVEY §7.4): a literal Unknown SK=0 row unioned before 1..n keys in
  * natural-key order. The global orderBy window is single-partition —
  * fine for dimension-sized inputs; for 100 TB dims swap in
  * `monotonically_increasing_id` (fact joins only need within-run SK
  * consistency, which both provide). One implementation, used by both
  * the star and snowflake builders. */
private[model] object Sk {
  def withSk(df: DataFrame, skName: String, orderCol: String,
      unknown: DataFrame): DataFrame = {
    val numbered = df.withColumn(skName,
      row_number().over(Window.orderBy(col(orderCol))))
    unknown.unionByName(numbered.select(unknown.columns.map(col): _*))
  }
}
