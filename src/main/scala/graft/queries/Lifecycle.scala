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

  /** #141 PEAK CONCURRENCY — the maximum number of simultaneously
    * active sessions per day (capacity planning's load gauge), via a
    * DISTRIBUTED SWEEP-LINE: each session contributes +1 at its start
    * and −1 at its end (inclusive ends: starts sort before ends at an
    * equal timestamp), each DAY runs its own ordered cumsum from
    * zero, and a per-day carry-in (the cumulative net of all prior
    * days' deltas — sessions still open at midnight) lifts the local
    * curve to the global one: peak(D) = carry_in(D) + max(0, local
    * running max). The naive formulation is ONE global ordered cumsum
    * — a single-partition sort that cannot scale; the split/carry
    * decomposition is the same partial-then-merge shape as the
    * incremental quantile partials (#108).
    *
    * Scale shape: sessionization is the existing #53 operator; the
    * sweep is one window per DAY partition (change points, not raw
    * events); the carry-in window runs over the tiny per-day frame. */
  def concurrency(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.operators.Sessionize.sessionWindows(
      Tables.events(s, dir), Seq("user_id"), "ts", Seq(col("ts"), col("event_id")))
      .select(col("session_start_us").as("start_us"),
        (col("session_start_us") + col("session_len_us")).as("end_us"))
    concurrencyOf(sess)
  }

  /** The sweep-line kernel on an arbitrary (start_us, end_us)
    * interval frame — factored for crafted-interval specs. */
  private[graft] def concurrencyOf(sess: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deltas = sess.select(col("start_us").as("us"), lit(1L).as("delta"))
      .unionByName(sess.select(col("end_us").as("us"), lit(-1L).as("delta")))
      .withColumn("day", to_date(timestamp_micros(col("us"))))
    val wDay = Window.partitionBy(col("day")).orderBy(col("us"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDay = deltas
      .withColumn("run", sum(col("delta")).over(wDay))
      .groupBy(col("day"))
      .agg(max(col("run")).as("local_peak"), sum(col("delta")).as("net"))
    // carry-in: sessions opened on earlier days and not yet closed —
    // a window over the per-DAY frame (tiny), not the change points
    val wDays = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perDay
      .withColumn("carry_in", coalesce(sum(col("net")).over(wDays), lit(0L)))
      .select(col("day"),
        (col("carry_in") + greatest(col("local_peak"), lit(0L))).as("peak_concurrency"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retention_curve" -> retentionCurve _,
    "q_funnel_timing"   -> funnelTiming _,
    "q_dormancy"        -> dormancy _,
    "q_concurrency"     -> concurrency _
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
        |FROM c""".stripMargin,
    "q_concurrency" ->
      """WITH g AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |        - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |s AS (
        |  SELECT user_id, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g),
        |sess AS (
        |  SELECT user_id, session_id, MIN(us) AS start_us, MAX(us) AS end_us
        |  FROM s GROUP BY 1, 2),
        |d AS (
        |  SELECT start_us AS us, 1 AS delta FROM sess
        |  UNION ALL SELECT end_us, -1 FROM sess),
        |dd AS (SELECT us, delta, CAST(make_timestamp(us) AS DATE) AS day FROM d),
        |r AS (
        |  SELECT day, delta,
        |    SUM(delta) OVER (PARTITION BY day ORDER BY us, delta DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM dd),
        |p AS (SELECT day, MAX(run) AS local_peak, SUM(delta) AS net FROM r GROUP BY 1),
        |c AS (
        |  SELECT day, local_peak,
        |    COALESCE(SUM(net) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry_in
        |  FROM p)
        |SELECT day, CAST(carry_in + GREATEST(local_peak, 0) AS BIGINT) AS peak_concurrency
        |FROM c""".stripMargin
  )
}
