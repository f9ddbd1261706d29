package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** User-lifecycle batch (SURVEY §2 #131-133): the retention curve
  * with right-censoring (#131), funnel conversion-time percentiles
  * (#132) and dormancy segmentation (#133) — the lifecycle views
  * product analytics reads daily, completing the cohort family
  * (#24-28) the reference's retention jobs anchor.
  */
object Lifecycle {

  /** #131 RETENTION CURVE — fraction of users active d days after
    * their first activity, for offsets 0..14, aggregated across
    * cohorts with RIGHT-CENSORING: a user only counts in offset d's
    * denominator if the observation window actually extends d days
    * past their first day (the classic triangle→curve flatten; the
    * reference's cohort_retained (#25) is one cell of this curve).
    *
    * Scale shape: per-user first-day and the distinct (user, day)
    * activity set are map-side-combined aggs; offsets come from a
    * row-local ≤15-element explode on the per-user frame (never on
    * raw events); both the numerator join and the eligibility
    * explode are user-keyed — one shuffle family end-to-end. */
  def retentionCurve(s: SparkSession, dir: String): DataFrame = {
    val maxOffset = 14
    val ev = Tables.events(s, dir)
    val firstDay = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_day"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val maxDay = ev.agg(max(to_date(col("ts"))).as("max_day"))
    val retained = active.join(firstDay, Seq("user_id"))
      .select(col("user_id"), datediff(col("day"), col("first_day")).as("day_offset"))
      .filter(col("day_offset").between(0, maxOffset))
      .groupBy(col("day_offset")).agg(countDistinct(col("user_id")).as("n_retained"))
    val eligible = firstDay.crossJoin(broadcast(maxDay))
      .select(explode(sequence(lit(0),
        least(datediff(col("max_day"), col("first_day")), lit(maxOffset)))).as("day_offset"))
      .groupBy(col("day_offset")).agg(count(lit(1)).as("n_eligible"))
    eligible.join(retained, Seq("day_offset"), "left")
      .select(col("day_offset").cast("long").as("day_offset"),
        col("n_eligible"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        round(coalesce(col("n_retained"), lit(0L)).cast("double") / col("n_eligible"), 6)
          .as("retention"))
  }

  /** #132 FUNNEL TIMING — how long conversion takes, not just
    * whether it happens (#63 counts the funnel; this times it):
    * per converting user, hours from FIRST view to FIRST subsequent
    * purchase; report count + mean/median/p90 over users.
    *
    * Scale shape: per-user first-touch timestamps are ONE
    * map-side-combined conditional agg over the scan (no self-join
    * of the event stream); the percentile reduces the small
    * per-user frame. Deltas are exact integer microseconds divided
    * once — identical doubles on both engines. */
  def funnelTiming(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("first_view"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("first_purchase"))
      .filter(col("first_view").isNotNull && col("first_purchase").isNotNull &&
        col("first_purchase") > col("first_view"))
      .select(((col("first_purchase") - col("first_view")).cast("double")
        / lit(3600.0e6)).as("hours"))
    perUser.agg(
      count(lit(1)).as("n_converted"),
      round(avg(col("hours")), 6).as("mean_hours"),
      round(expr("percentile(hours, 0.5)"), 6).as("p50_hours"),
      round(expr("percentile(hours, 0.9)"), 6).as("p90_hours"))
  }

  /** #133 DORMANCY SEGMENTATION — users bucketed by days since
    * last activity as of the data horizon (active / cooling /
    * dormant / lost), with each bucket's share: the churn-risk
    * readout next to the retention curve.
    *
    * Scale shape: one map-side-combined per-user agg, a broadcast
    * scalar horizon, a row-local bucket expression and one tiny
    * agg; the share denominator is a window over the ≤4-row bucket
    * frame. */
  def dormancy(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val lastDay = ev.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"))
    val maxDay = ev.agg(max(to_date(col("ts"))).as("max_day"))
    val bucketed = lastDay.crossJoin(broadcast(maxDay))
      .select(datediff(col("max_day"), col("last_day")).as("idle_days"))
      .select(
        when(col("idle_days") <= 6, "0_active")
          .when(col("idle_days") <= 13, "1_cooling")
          .when(col("idle_days") <= 20, "2_dormant")
          .otherwise("3_lost").as("segment"))
      .groupBy(col("segment")).agg(count(lit(1)).as("n_users"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    bucketed.select(col("segment"), col("n_users"),
      round(col("n_users").cast("double") / sum(col("n_users")).over(w), 6).as("share"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retention_curve" -> retentionCurve _,
    "q_funnel_timing"   -> funnelTiming _,
    "q_dormancy"        -> dormancy _
  )

  val oracles: Map[String, String] = Map(
    "q_retention_curve" ->
      """WITH fd AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1),
        |active AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
        |ret AS (
        |  SELECT datediff('day', f.first_day, a.day) AS day_offset,
        |    COUNT(DISTINCT a.user_id) AS n_retained
        |  FROM active a JOIN fd f USING (user_id)
        |  WHERE datediff('day', f.first_day, a.day) BETWEEN 0 AND 14
        |  GROUP BY 1),
        |elig AS (
        |  SELECT UNNEST(range(0, LEAST(datediff('day', first_day, max_day), 14) + 1))
        |    AS day_offset
        |  FROM fd, mx),
        |eligc AS (SELECT day_offset, COUNT(*) AS n_eligible FROM elig GROUP BY 1)
        |SELECT CAST(e.day_offset AS BIGINT) AS day_offset, e.n_eligible,
        |  COALESCE(r.n_retained, 0) AS n_retained,
        |  ROUND(CAST(COALESCE(r.n_retained, 0) AS DOUBLE) / e.n_eligible, 6) AS retention
        |FROM eligc e LEFT JOIN ret r USING (day_offset)""".stripMargin,
    "q_funnel_timing" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view'
        |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_view,
        |    MIN(CASE WHEN event_type = 'purchase'
        |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_purchase
        |  FROM events GROUP BY user_id),
        |conv AS (
        |  SELECT CAST(first_purchase - first_view AS DOUBLE) / 3600e6 AS hours
        |  FROM pu
        |  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        |    AND first_purchase > first_view)
        |SELECT COUNT(*) AS n_converted,
        |  ROUND(AVG(hours), 6) AS mean_hours,
        |  ROUND(QUANTILE_CONT(hours, 0.5), 6) AS p50_hours,
        |  ROUND(QUANTILE_CONT(hours, 0.9), 6) AS p90_hours
        |FROM conv""".stripMargin,
    "q_dormancy" ->
      """WITH ld AS (
        |  SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day FROM events GROUP BY 1),
        |mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
        |b AS (
        |  SELECT CASE
        |    WHEN datediff('day', last_day, max_day) <= 6 THEN '0_active'
        |    WHEN datediff('day', last_day, max_day) <= 13 THEN '1_cooling'
        |    WHEN datediff('day', last_day, max_day) <= 20 THEN '2_dormant'
        |    ELSE '3_lost' END AS segment
        |  FROM ld, mx),
        |c AS (SELECT segment, COUNT(*) AS n_users FROM b GROUP BY 1)
        |SELECT segment, n_users,
        |  ROUND(CAST(n_users AS DOUBLE) / SUM(n_users) OVER (), 6) AS share
        |FROM c""".stripMargin
  )
}
