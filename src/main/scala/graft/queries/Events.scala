package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** [EXT] Batch time-series queries on the events table (SURVEY §2.10 —
  * the reference models time series as batch snapshots; these are the
  * oracle-checkable batch twins of the Structured Streaming module in
  * graft.streaming). Timestamps are emitted as formatted strings so both
  * engines hash identically.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  private val hourFmt = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, Q] = Map(
    // Tumbling-window hourly rollup per event type.
    "e1_hourly_rollup" -> ((s, d) => events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), hourFmt).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("event_cnt"),
        sum(cents(col("value"))).as("value_cents"))
      .orderBy("hour", "event_type")),

    // Sessionization: 30-min inactivity gap starts a new session (lag window).
    "e2_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"),
          when(lag(col("ts"), 1).over(w).isNull
            || unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))
               > 1800L, 1).otherwise(0).as("is_new_session"))
        .groupBy(col("user_id"))
        .agg(sum(col("is_new_session")).as("session_cnt"),
          count(lit(1)).as("event_cnt"))
        .orderBy("user_id")
    }),

    // Latest event per user (argmax via row_number — dedup-keep-last idiom).
    "e3_latest_per_user" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy("user_id")
    }),

    // Daily active users + event mix (distinct agg on a time bucket).
    "e4_daily_active" -> ((s, d) => events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("active_users"),
        count(lit(1)).as("event_cnt"))
      .orderBy("day")),

    // Cohort retention: users grouped by first-seen day; how many of each
    // cohort return exactly 1 and 7 days later. One (user, day) distinct
    // activity set joined back to the cohort assignment — the standard
    // product-analytics shape.
    "e7_retention" -> ((s, d) => {
      val activity = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val cohort = activity.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      cohort
        .join(activity, "user_id")
        .groupBy(col("cohort_day"))
        .agg(countDistinct(col("user_id")).as("cohort_size"),
          countDistinct(when(datediff(col("day"), col("cohort_day")) === 1,
            col("user_id"))).as("d1_retained"),
          countDistinct(when(datediff(col("day"), col("cohort_day")) === 7,
            col("user_id"))).as("d7_retained"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("cohort_size"), col("d1_retained"), col("d7_retained"))
        .orderBy("cohort_day")
    }),

    // Time-weighted average: each event's value holds until the user's
    // next event; TWA = Σ(value·duration)/Σ(duration). Weights stay in
    // exact integer micros so the weighted sums are order-independent;
    // the final ratio is one fixed double shape.
    "e8_time_weighted" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("v_cents", round(col("value") * 100).cast("long"))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        .withColumn("dur_us", unix_micros(col("next_ts")) - unix_micros(col("ts")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("v_cents") * col("dur_us")).as("wsum"),
          sum(col("dur_us")).as("total_us"))
        .select(col("user_id"), col("n_intervals"), col("wsum"), col("total_us"),
          (col("wsum").cast("double") / col("total_us")).as("twa_cents"))
        .orderBy("user_id")
    }),

    // Daily-volume anomaly detection: days whose event count deviates from
    // the corpus mean by more than 2 sample standard deviations. Mean and
    // std derive from exact integer sums (n, Σc, Σc²) through ONE fixed
    // double expression on both engines (engine-native STDDEV streaming
    // algorithms differ — the Depth.scala variance policy). Two-pass shape:
    // tiny daily-count aggregate, broadcast stats, flag — corpus-size scan
    // happens once.
    "e9_daily_anomaly" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val stats = daily.agg(
        count(lit(1)).as("n"), sum(col("cnt")).as("s1"),
        sum(col("cnt") * col("cnt")).as("s2"))
      daily.crossJoin(stats)
        .withColumn("mean", col("s1").cast("double") / col("n"))
        .withColumn("std", sqrt(
          (col("s2").cast("double") - col("s1").cast("double")
            * col("s1") / col("n")) / (col("n") - 1)))
        .filter(abs(col("cnt") - col("mean")) > lit(2.0) * col("std"))
        .select(col("day"), col("cnt"), round(col("mean"), 6).as("mean"),
          round((col("cnt") - col("mean")) / col("std"), 6).as("z"))
        .orderBy("day")
    })
  )

  val oracle: Map[String, String] = Map(
    "e1_hourly_rollup" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS event_cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "e2_sessionize" ->
      """SELECT user_id, CAST(sum(is_new_session) AS BIGINT) AS session_cnt,
        |  count(*) AS event_cnt
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id
        |             ORDER BY date_trunc('microseconds', ts), event_id)
        |           IS NULL
        |         OR date_diff('second',
        |              lag(ts, 1) OVER (PARTITION BY user_id
        |                ORDER BY date_trunc('microseconds', ts), event_id),
        |              ts) > 1800
        |         THEN 1 ELSE 0 END AS is_new_session
        |  FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "e3_latest_per_user" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC)
        |      AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "e4_daily_active" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS active_users, count(*) AS event_cnt
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "e9_daily_anomaly" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1
        |), st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS s1,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS s2
        |  FROM daily
        |)
        |SELECT day, cnt,
        |  round(CAST(s1 AS DOUBLE) / n, 6) AS mean,
        |  round((cnt - CAST(s1 AS DOUBLE) / n)
        |    / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)), 6) AS z
        |FROM daily, st
        |WHERE abs(cnt - CAST(s1 AS DOUBLE) / n)
        |  > 2.0 * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
        |ORDER BY day""".stripMargin,
    "e7_retention" ->
      """WITH activity AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
        |)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |  count(DISTINCT a.user_id) AS cohort_size,
        |  count(DISTINCT CASE WHEN date_diff('day', cohort_day, day) = 1
        |    THEN a.user_id END) AS d1_retained,
        |  count(DISTINCT CASE WHEN date_diff('day', cohort_day, day) = 7
        |    THEN a.user_id END) AS d7_retained
        |FROM cohort c JOIN activity a USING (user_id)
        |GROUP BY c.cohort_day ORDER BY cohort_day""".stripMargin,
    "e8_time_weighted" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS v_cents,
        |    lead(ts, 1) OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('microseconds', ts), event_id) AS next_ts
        |  FROM events
        |)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(v_cents * (epoch_us(next_ts) - epoch_us(ts))) AS BIGINT) AS wsum,
        |  CAST(sum(epoch_us(next_ts) - epoch_us(ts)) AS BIGINT) AS total_us,
        |  CAST(CAST(sum(v_cents * (epoch_us(next_ts) - epoch_us(ts))) AS BIGINT)
        |      AS DOUBLE)
        |    / CAST(sum(epoch_us(next_ts) - epoch_us(ts)) AS BIGINT) AS twa_cents
        |FROM seq WHERE next_ts IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
