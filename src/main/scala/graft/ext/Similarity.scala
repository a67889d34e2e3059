package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** [EXT] Approximate-nearest-neighbor search over the embeddings table
  * (embedding: array<float>, 64-dim).
  *
  *  - brute force: exact cosine top-k — the correctness baseline. The dot
  *    product is a zip_with/aggregate Catalyst expression (codegen'd, no
  *    UDF); query side is broadcast so the big side never shuffles.
  *  - LSH: random-hyperplane signatures (planes derived from murmur3, so
  *    fully deterministic with no driver-side RNG state) → bucket join →
  *    exact rerank inside the bucket. At 100 TB the bucket join replaces
  *    the O(N·Q) nested loop with a shuffle on bucket ids; recall is tuned
  *    by plane count + multi-probe (flip-1-bit probing implemented below).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private val dotExpr =
    """aggregate(zip_with(v_q, v_c, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  private def withNorm(df: DataFrame): DataFrame = df
    .withColumn("norm", expr(
      """sqrt(aggregate(embedding, CAST(0 AS DOUBLE),
        |  (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))""".stripMargin))

  /** 6-bit random-hyperplane signature; plane weight (p, j) = ±1 from
    * murmur3(p*64 + j) — deterministic, identical on every executor. */
  private val bucketExpr =
    """aggregate(transform(sequence(0, 5), p ->
      |    IF(aggregate(zip_with(embedding,
      |           transform(sequence(0, 63),
      |             j -> IF(pmod(hash(p * 64 + j), 2) = 0,
      |                     CAST(1 AS DOUBLE), CAST(-1 AS DOUBLE))),
      |           (x, w) -> CAST(x AS DOUBLE) * w),
      |         CAST(0 AS DOUBLE), (a, v) -> a + v) > 0,
      |       shiftleft(1, p), 0)),
      |  0, (a, b) -> a + b)""".stripMargin

  val queries: Map[String, Q] = Map(
    // Exact cosine top-5 for the first 10 vectors (the ANN baseline).
    "x_ann_bruteforce" -> ((s, d) => {
      val all = withNorm(embeddings(s, d))
      val q = all.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("v_q"),
          col("norm").as("norm_q"))
      val c = all.select(col("vec_id").as("c_id"), col("embedding").as("v_c"),
        col("norm").as("norm_c"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("c_id"))
      c.join(broadcast(q), col("q_id") =!= col("c_id"))
        .withColumn("cosine", expr(dotExpr) / (col("norm_q") * col("norm_c")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("q_id", "rank")
    }),

    // LSH-bucketed ANN with flip-1-bit multi-probe, exact rerank in-bucket.
    "x_ann_lsh" -> ((s, d) => {
      val all = withNorm(embeddings(s, d)).withColumn("bucket", expr(bucketExpr))
      val cand = all.select(col("vec_id").as("c_id"), col("embedding").as("v_c"),
        col("norm").as("norm_c"), col("bucket").as("c_bucket"))
      // query probes: own bucket + each 1-bit flip (7 probes over 6 planes)
      val q = all.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("v_q"),
          col("norm").as("norm_q"),
          explode(expr(
            """array_union(array(bucket),
              |  transform(sequence(0, 5), p -> int(bucket ^ shiftleft(1, p))))"""
              .stripMargin)).as("probe"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("c_id"))
      cand.join(broadcast(q),
          col("probe") === col("c_bucket") && col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"), col("norm_q"), col("norm_c"),
          expr(dotExpr).as("dot"))
        .distinct() // same candidate can match several probes
        .withColumn("cosine", col("dot") / (col("norm_q") * col("norm_c")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("q_id", "rank")
    })
  )

  /** Not SQL-expressible portably → driver records rows-only checks. */
  val oracle: Map[String, String] = Map()
}
