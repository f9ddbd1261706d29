package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Channels, Cohort}
import graft.functions.Mappings

/** Reference-domain composites (SURVEY §2 #29-34): RFE, ROI,
  * attribution, revenue estimation, RPS factor, feature mapping. */
object Analytics {

  import CohortQueries.AsOf

  private def e28(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .filter(col("day") > date_sub(lit(AsOf).cast("date"), 28) &&
        col("day") <= lit(AsOf).cast("date"))

  /** #29 28-day recency / frequency / engagement per user+feature
    * (reference sql/mango_user_rfe_28d.sql: rfe_partial ⋈ active_days;
    * event_type ≙ feature_name). */
  def userRfe(s: SparkSession, dir: String): DataFrame = {
    val e = e28(s, dir)
    val active = e.groupBy(col("user_id"))
      .agg(countDistinct(col("day")).as("active_days"))
    val rfe = e.groupBy(col("user_id"), col("event_type"))
      .agg(
        datediff(lit(AsOf).cast("date"), max(col("day"))).cast("long").as("recency"),
        countDistinct(col("day")).as("frequency_days"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
    rfe.join(active, Seq("user_id"), "left")
      .select(
        col("user_id"), col("event_type"), col("active_days"),
        col("recency"), col("frequency_days"),
        round(col("frequency_days") / col("active_days"), 6).as("stickiness"),
        round(col("n_events") / col("frequency_days"), 6).as("value_event_count"),
        col("total_value"))
  }

  /** #29b the same 28-day RFE computed INCREMENTALLY (reference
    * sql/mango_user_rfe_daily_partial.sql + mango_user_rfe_28d.sql:
    * 96-110): per-day partial aggregates merged over the window,
    * instead of re-scanning 28 days of raw events. Gated by the SAME
    * oracle as [[userRfe]] — the merge must reproduce the direct
    * computation exactly, proving the partial algebra. At 100 TB the
    * daily job scans one day and 28 tiny partials, not the window. */
  def userRfePartial(s: SparkSession, dir: String): DataFrame = {
    val partials = graft.operators.Rfe.dailyPartial(Tables.events(s, dir))
    graft.operators.Rfe.merge(partials, AsOf)
  }

  /** #30 feature ROI: percentile RFE ⋈ retention rates ⋈ active users
    * per feature (reference sql/mango_feature_roi.sql rfe/rr/au). */
  def featureRoi(s: SparkSession, dir: String): DataFrame = {
    val e = e28(s, dir)
    val perUser = e.groupBy(col("user_id"), col("event_type"))
      .agg(countDistinct(col("day")).as("frequency_days"), count(lit(1)).as("n_events"))
    val rfe = perUser.groupBy(col("event_type")).agg(
      round(expr("percentile(frequency_days, 0.25)"), 6).as("frequency_days_25p"),
      round(expr("percentile(frequency_days, 0.5)"), 6).as("frequency_days_50p"),
      round(expr("percentile(frequency_days, 0.75)"), 6).as("frequency_days_75p"),
      round(expr("percentile(n_events, 0.5)"), 6).as("n_events_50p"))

    val occ = Cohort.occurrence(Tables.events(s, dir), "user_id", "ts", Seq("event_type"))
    val rr = Cohort.retentionMatrix(occ, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        round(sum(col("d1_retained")) / sum(col("daily_cohort_size")), 6).as("d1_retention"),
        round(sum(col("d7_retained")) / sum(col("daily_cohort_size")), 6).as("d7_retention"),
        round(sum(col("w1_retained")) / sum(col("weekly_cohort_size")), 6).as("w1_retention"))

    val au = Cohort.activeUserCount(occ, AsOf, Seq("event_type"))
      .select(col("event_type"), col("dau"), col("wau"), col("mau"))

    rfe.join(rr, Seq("event_type"), "left").join(au, Seq("event_type"), "left")
  }

  /** #30b channel ROI composite (reference sql/mango_channel_roi.sql:
    * per-CHANNEL percentile engagement profile ⋈ retention rates ⋈
    * active users, with the dashboard channel ordering): the channel-
    * cohort sibling of [[featureRoi]]. All three branches aggregate
    * the same events scan by the channel grouping; the final joins are
    * on a handful of channel rows. */
  def channelRoi(s: SparkSession, dir: String): DataFrame = {
    val ch = Mappings.channel(col("event_type"))
    val perUser = e28(s, dir).withColumn("channel", ch)
      .groupBy(col("user_id"), col("channel"))
      .agg(countDistinct(col("day")).as("frequency_days"))
    val rfe = perUser.groupBy(col("channel")).agg(
      round(expr("percentile(frequency_days, 0.25)"), 6).as("frequency_days_25p"),
      round(expr("percentile(frequency_days, 0.5)"), 6).as("frequency_days_50p"),
      round(expr("percentile(frequency_days, 0.75)"), 6).as("frequency_days_75p"))

    val occ = Cohort.occurrence(
      Tables.events(s, dir).withColumn("channel", ch), "user_id", "ts", Seq("channel"))
    val rr = Cohort.retentionMatrix(occ, Seq("channel"))
      .groupBy(col("channel"))
      .agg(
        round(sum(col("d1_retained")) / sum(col("daily_cohort_size")), 6).as("d1_retention"),
        round(sum(col("d7_retained")) / sum(col("daily_cohort_size")), 6).as("d7_retention"),
        round(sum(col("w1_retained")) / sum(col("weekly_cohort_size")), 6).as("w1_retention"))

    val au = Cohort.activeUserCount(occ, AsOf, Seq("channel"))
      .select(col("channel"), col("dau"), col("wau"), col("mau"))

    rfe.join(rr, Seq("channel"), "left").join(au, Seq("channel"), "left")
      .withColumn("channel_order", Mappings.channelOrder(col("channel")))
  }

  /** #31 multi-token channel attribution
    * (reference sql/mango_user_channels.sql; supplier ≙ channel dim,
    * signup-event props ≙ tracker settings). */
  def userChannels(s: SparkSession, dir: String): DataFrame = {
    val settings = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        (max(when(col("event_type") === "signup",
          get_json_object(col("props"), "$.k").cast("long"))) % 20)
          .cast("string").as("tracker_token"))
    val sup = Tables.supplier(s, dir)
    val channels = sup.select(
      col("s_name").as("network_name"),
      col("s_suppkey").cast("string").as("network_token"),
      concat(lit("c_"), col("s_name")).as("campaign_name"),
      (col("s_suppkey") * 10).cast("string").as("campaign_token"),
      concat(lit("a_"), col("s_name")).as("adgroup_name"),
      (col("s_suppkey") * 100).cast("string").as("adgroup_token"),
      concat(lit("cr_"), col("s_name")).as("creative_name"),
      (col("s_suppkey") * 1000 + 7).cast("string").as("creative_token"))
    Channels.attribute(settings, channels, "user_id")
  }

  /** #32 revenue estimation: volume × per-key rate
    * (reference sql/mango_revenue_google.sql: search volume ⋈ rps,
    * shaped into the revenue schema). */
  def revenueJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("entrypoint", get_json_object(col("props"), "$.k").cast("long") % 5)
    val vol = e.filter(col("event_type") === "click")
      .groupBy(col("day"), col("entrypoint"))
      .agg(count(lit(1)).as("volume"))
    val rps = e.filter(col("event_type") === "purchase")
      .groupBy(col("entrypoint"))
      .agg(round(avg(col("value")), 6).as("rps"))
    vol.join(broadcast(rps), Seq("entrypoint"), "left")
      .select(
        lit("estimated").as("conversion_status"),
        col("day").as("utc_date"),
        col("entrypoint"),
        col("volume").cast("double").as("sales_amount"),
        round(col("volume") * col("rps"), 6).as("payout"),
        lit("USD").as("currency"))
  }

  /** #33 revenue-per-search factor
    * (reference tasks/rps.py: RSF = TR / Σ(CS × CCI); rps = CCI × RSF). */
  def rpsFactor(s: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    val vol = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("volume"))
    val idx = customer.groupBy(col("c_nationkey"))
      .agg(round(avg(col("c_acctbal")), 6).as("cost_idx"))
    val df = vol.join(idx, Seq("c_nationkey"))
    val pkg = Tables.lineitem(s, dir).agg(round(sum(col("l_quantity")), 6).as("package"))
    val denom = df.agg(round(sum(col("volume") * col("cost_idx")), 6).as("denom"))
    df.crossJoin(broadcast(pkg)).crossJoin(broadcast(denom))
      .select(
        col("c_nationkey"), col("volume"), col("cost_idx"),
        round(col("cost_idx") * (col("package") / col("denom")), 6).as("rps"))
  }

  /** #34 event→feature rule mapping with multi-branch output
    * (reference udf_js/feature_mapping.sql + the three UNION ALL
    * branches of sql/mango_events_feature_mapping.sql: Feature /
    * Vertical / App). */
  def featureMapping(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("value"))
    val feature = e.select(
      lit("Feature").as("feature_type"),
      when(col("event_type") === "purchase" && col("value") > 100, "feature: purchase_large")
        .when(col("event_type") === "purchase", "feature: purchase_small")
        .when(col("event_type") === "signup", "feature: signup")
        .when(col("event_type") === "click", "feature: click")
        .when(col("event_type") === "view", "feature: view")
        .otherwise("feature: others").as("feature_name"),
      col("user_id"))
      .filter(col("feature_name") =!= "feature: others")
    val vertical = e.select(
      lit("Vertical").as("feature_type"),
      Mappings.channel(col("event_type")).as("feature_name"),
      col("user_id"))
    val app = e.select(lit("App").as("feature_type"), lit("App").as("feature_name"), col("user_id"))
    feature.unionByName(vertical).unionByName(app)
      .groupBy(col("feature_type"), col("feature_name"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_user_rfe"         -> userRfe _,
    "q_user_rfe_partial" -> userRfePartial _,
    "q_feature_roi"     -> featureRoi _,
    "q_channel_roi"     -> channelRoi _,
    "q_user_channels"   -> userChannels _,
    "q_revenue_join"    -> revenueJoin _,
    "q_rps_factor"      -> rpsFactor _,
    "q_feature_mapping" -> featureMapping _
  )

  private val e28Cte =
    """WITH e AS (
      |  SELECT *, CAST(ts AS DATE) AS day FROM events
      |  WHERE CAST(ts AS DATE) > DATE '2024-01-30' - 28
      |    AND CAST(ts AS DATE) <= DATE '2024-01-30')
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_user_rfe" ->
      (e28Cte +
        """, active AS (
          |  SELECT user_id, COUNT(DISTINCT day) AS active_days FROM e GROUP BY 1),
          |rfe AS (
          |  SELECT user_id, event_type,
          |    CAST(date_diff('day', MAX(day), DATE '2024-01-30') AS BIGINT) AS recency,
          |    COUNT(DISTINCT day) AS frequency_days,
          |    COUNT(*) AS n_events,
          |    ROUND(SUM(value), 6) AS total_value
          |  FROM e GROUP BY 1, 2)
          |SELECT rfe.user_id, rfe.event_type, active.active_days, rfe.recency,
          |  rfe.frequency_days,
          |  ROUND(rfe.frequency_days / active.active_days, 6) AS stickiness,
          |  ROUND(rfe.n_events / rfe.frequency_days, 6) AS value_event_count,
          |  rfe.total_value
          |FROM rfe LEFT JOIN active ON rfe.user_id = active.user_id""".stripMargin),
    // incremental partial+merge must be indistinguishable from the
    // direct window computation: same oracle, verbatim
    "q_user_rfe_partial" ->
      (e28Cte +
        """, active AS (
          |  SELECT user_id, COUNT(DISTINCT day) AS active_days FROM e GROUP BY 1),
          |rfe AS (
          |  SELECT user_id, event_type,
          |    CAST(date_diff('day', MAX(day), DATE '2024-01-30') AS BIGINT) AS recency,
          |    COUNT(DISTINCT day) AS frequency_days,
          |    COUNT(*) AS n_events,
          |    ROUND(SUM(value), 6) AS total_value
          |  FROM e GROUP BY 1, 2)
          |SELECT rfe.user_id, rfe.event_type, active.active_days, rfe.recency,
          |  rfe.frequency_days,
          |  ROUND(rfe.frequency_days / active.active_days, 6) AS stickiness,
          |  ROUND(rfe.n_events / rfe.frequency_days, 6) AS value_event_count,
          |  rfe.total_value
          |FROM rfe LEFT JOIN active ON rfe.user_id = active.user_id""".stripMargin),
    "q_feature_roi" ->
      (e28Cte +
        """, per_user AS (
          |  SELECT user_id, event_type, COUNT(DISTINCT day) AS frequency_days,
          |    COUNT(*) AS n_events
          |  FROM e GROUP BY 1, 2),
          |rfe AS (
          |  SELECT event_type,
          |    ROUND(quantile_cont(frequency_days, 0.25), 6) AS frequency_days_25p,
          |    ROUND(quantile_cont(frequency_days, 0.5), 6) AS frequency_days_50p,
          |    ROUND(quantile_cont(frequency_days, 0.75), 6) AS frequency_days_75p,
          |    ROUND(quantile_cont(n_events, 0.5), 6) AS n_events_50p
          |  FROM per_user GROUP BY 1),
          |daily AS (
          |  SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS occur_date FROM events),
          |occ0 AS (
          |  SELECT event_type, user_id, occur_date,
          |    MIN(occur_date) OVER (PARTITION BY event_type, user_id) AS cohort_date
          |  FROM daily),
          |occ AS (
          |  SELECT event_type, user_id, occur_date, cohort_date,
          |    CAST(date_diff('day', cohort_date, occur_date) AS BIGINT) AS occur_day,
          |    CAST(FLOOR(date_diff('day', cohort_date, occur_date) / 7.0) AS BIGINT) AS occur_week
          |  FROM occ0
          |  WHERE date_diff('day', cohort_date, occur_date) BETWEEN 0 AND 111),
          |rm AS (
          |  SELECT event_type, cohort_date,
          |    COUNT(DISTINCT CASE WHEN occur_day = 0 THEN user_id END) AS daily_cohort_size,
          |    COUNT(DISTINCT CASE WHEN occur_day = 1 THEN user_id END) AS d1_retained,
          |    COUNT(DISTINCT CASE WHEN occur_day = 7 THEN user_id END) AS d7_retained,
          |    COUNT(DISTINCT CASE WHEN occur_week = 0 THEN user_id END) AS weekly_cohort_size,
          |    COUNT(DISTINCT CASE WHEN occur_week = 1 THEN user_id END) AS w1_retained
          |  FROM occ GROUP BY 1, 2),
          |rr AS (
          |  SELECT event_type,
          |    ROUND(SUM(d1_retained) / SUM(daily_cohort_size), 6) AS d1_retention,
          |    ROUND(SUM(d7_retained) / SUM(daily_cohort_size), 6) AS d7_retention,
          |    ROUND(SUM(w1_retained) / SUM(weekly_cohort_size), 6) AS w1_retention
          |  FROM rm GROUP BY 1),
          |dau AS (
          |  SELECT event_type, COUNT(DISTINCT user_id) AS dau
          |  FROM occ WHERE occur_date = DATE '2024-01-30' GROUP BY 1),
          |wau AS (
          |  SELECT event_type, COUNT(DISTINCT user_id) AS wau
          |  FROM occ WHERE occur_date > DATE '2024-01-30' - 7 AND occur_date <= DATE '2024-01-30' GROUP BY 1),
          |mau AS (
          |  SELECT event_type, COUNT(DISTINCT user_id) AS mau
          |  FROM occ WHERE occur_date > DATE '2024-01-30' - 28 AND occur_date <= DATE '2024-01-30' GROUP BY 1),
          |au AS (
          |  SELECT dau.event_type, dau.dau, wau.wau, mau.mau
          |  FROM dau LEFT JOIN wau USING (event_type) LEFT JOIN mau USING (event_type))
          |SELECT rfe.event_type, rfe.frequency_days_25p, rfe.frequency_days_50p,
          |  rfe.frequency_days_75p, rfe.n_events_50p,
          |  rr.d1_retention, rr.d7_retention, rr.w1_retention,
          |  au.dau, au.wau, au.mau
          |FROM rfe LEFT JOIN rr USING (event_type) LEFT JOIN au USING (event_type)""".stripMargin),
    "q_channel_roi" ->
      ("""WITH ec AS (
         |  SELECT *, CAST(ts AS DATE) AS day,
         |    CASE
         |      WHEN event_type IS NULL THEN 'Unknown'
         |      WHEN event_type IN ('signup', 'view') THEN 'Organic'
         |      WHEN event_type IN ('click', 'purchase') THEN 'Paid'
         |      WHEN event_type IN ('error') THEN 'Diagnostic'
         |      ELSE 'Others' END AS channel
         |  FROM events),
         |e AS (
         |  SELECT * FROM ec
         |  WHERE day > DATE '2024-01-30' - 28 AND day <= DATE '2024-01-30'),
         |per_user AS (
         |  SELECT user_id, channel, COUNT(DISTINCT day) AS frequency_days
         |  FROM e GROUP BY 1, 2),
         |rfe AS (
         |  SELECT channel,
         |    ROUND(quantile_cont(frequency_days, 0.25), 6) AS frequency_days_25p,
         |    ROUND(quantile_cont(frequency_days, 0.5), 6) AS frequency_days_50p,
         |    ROUND(quantile_cont(frequency_days, 0.75), 6) AS frequency_days_75p
         |  FROM per_user GROUP BY 1),
         |daily AS (
         |  SELECT DISTINCT channel, user_id, CAST(ts AS DATE) AS occur_date FROM ec),
         |occ0 AS (
         |  SELECT channel, user_id, occur_date,
         |    MIN(occur_date) OVER (PARTITION BY channel, user_id) AS cohort_date
         |  FROM daily),
         |occ AS (
         |  SELECT channel, user_id, occur_date, cohort_date,
         |    CAST(date_diff('day', cohort_date, occur_date) AS BIGINT) AS occur_day,
         |    CAST(FLOOR(date_diff('day', cohort_date, occur_date) / 7.0) AS BIGINT) AS occur_week
         |  FROM occ0
         |  WHERE date_diff('day', cohort_date, occur_date) BETWEEN 0 AND 111),
         |rm AS (
         |  SELECT channel, cohort_date,
         |    COUNT(DISTINCT CASE WHEN occur_day = 0 THEN user_id END) AS daily_cohort_size,
         |    COUNT(DISTINCT CASE WHEN occur_day = 1 THEN user_id END) AS d1_retained,
         |    COUNT(DISTINCT CASE WHEN occur_day = 7 THEN user_id END) AS d7_retained,
         |    COUNT(DISTINCT CASE WHEN occur_week = 0 THEN user_id END) AS weekly_cohort_size,
         |    COUNT(DISTINCT CASE WHEN occur_week = 1 THEN user_id END) AS w1_retained
         |  FROM occ GROUP BY 1, 2),
         |rr AS (
         |  SELECT channel,
         |    ROUND(SUM(d1_retained) / SUM(daily_cohort_size), 6) AS d1_retention,
         |    ROUND(SUM(d7_retained) / SUM(daily_cohort_size), 6) AS d7_retention,
         |    ROUND(SUM(w1_retained) / SUM(weekly_cohort_size), 6) AS w1_retention
         |  FROM rm GROUP BY 1),
         |dau AS (
         |  SELECT channel, COUNT(DISTINCT user_id) AS dau
         |  FROM occ WHERE occur_date = DATE '2024-01-30' GROUP BY 1),
         |wau AS (
         |  SELECT channel, COUNT(DISTINCT user_id) AS wau
         |  FROM occ WHERE occur_date > DATE '2024-01-30' - 7 AND occur_date <= DATE '2024-01-30' GROUP BY 1),
         |mau AS (
         |  SELECT channel, COUNT(DISTINCT user_id) AS mau
         |  FROM occ WHERE occur_date > DATE '2024-01-30' - 28 AND occur_date <= DATE '2024-01-30' GROUP BY 1),
         |au AS (
         |  SELECT dau.channel, dau.dau, wau.wau, mau.mau
         |  FROM dau LEFT JOIN wau USING (channel) LEFT JOIN mau USING (channel))
         |SELECT rfe.channel, rfe.frequency_days_25p, rfe.frequency_days_50p,
         |  rfe.frequency_days_75p,
         |  rr.d1_retention, rr.d7_retention, rr.w1_retention,
         |  au.dau, au.wau, au.mau,
         |  CAST(CASE rfe.channel
         |    WHEN 'Overall' THEN 0 WHEN 'Organic' THEN 1 WHEN 'Paid' THEN 2
         |    WHEN 'Diagnostic' THEN 3 WHEN 'Unknown' THEN 99 WHEN 'Others' THEN 100
         |    ELSE 9999 END AS INTEGER) AS channel_order
         |FROM rfe LEFT JOIN rr USING (channel) LEFT JOIN au USING (channel)""".stripMargin),
    "q_user_channels" ->
      """WITH settings AS (
        |  SELECT user_id,
        |    CAST(MAX(CASE WHEN event_type = 'signup'
        |      THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) % 20 AS VARCHAR) AS tracker_token
        |  FROM events GROUP BY 1),
        |channels AS (
        |  SELECT s_name AS network_name, CAST(s_suppkey AS VARCHAR) AS network_token,
        |    'c_' || s_name AS campaign_name, CAST(s_suppkey * 10 AS VARCHAR) AS campaign_token,
        |    'a_' || s_name AS adgroup_name, CAST(s_suppkey * 100 AS VARCHAR) AS adgroup_token,
        |    'cr_' || s_name AS creative_name, CAST(s_suppkey * 1000 + 7 AS VARCHAR) AS creative_token
        |  FROM supplier),
        |matched AS (
        |  SELECT s.user_id, s.tracker_token, c.* FROM settings s JOIN channels c ON s.tracker_token = c.network_token
        |  UNION ALL
        |  SELECT s.user_id, s.tracker_token, c.* FROM settings s JOIN channels c ON s.tracker_token = c.campaign_token
        |  UNION ALL
        |  SELECT s.user_id, s.tracker_token, c.* FROM settings s JOIN channels c ON s.tracker_token = c.adgroup_token
        |  UNION ALL
        |  SELECT s.user_id, s.tracker_token, c.* FROM settings s JOIN channels c ON s.tracker_token = c.creative_token
        |  UNION ALL
        |  SELECT user_id, tracker_token, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        |  FROM settings WHERE tracker_token IS NULL),
        |named AS (
        |  SELECT user_id, tracker_token,
        |    COALESCE(network_name, 'unknown') AS network_name,
        |    COALESCE(network_token, '0') AS network_token,
        |    COALESCE(campaign_name, 'unknown') AS campaign_name,
        |    COALESCE(campaign_token, '0') AS campaign_token,
        |    COALESCE(adgroup_name, 'unknown') AS adgroup_name,
        |    COALESCE(adgroup_token, '0') AS adgroup_token,
        |    COALESCE(creative_name, 'unknown') AS creative_name,
        |    COALESCE(creative_token, '0') AS creative_token
        |  FROM matched)
        |SELECT * FROM named
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY user_id ORDER BY creative_token ASC, network_token ASC) = 1""".stripMargin,
    "q_revenue_join" ->
      """WITH e AS (
        |  SELECT *, CAST(ts AS DATE) AS day,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS entrypoint
        |  FROM events),
        |vol AS (
        |  SELECT day, entrypoint, COUNT(*) AS volume FROM e
        |  WHERE event_type = 'click' GROUP BY 1, 2),
        |rps AS (
        |  SELECT entrypoint, ROUND(AVG(value), 6) AS rps FROM e
        |  WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT 'estimated' AS conversion_status, vol.day AS utc_date, vol.entrypoint,
        |  CAST(vol.volume AS DOUBLE) AS sales_amount,
        |  ROUND(vol.volume * rps.rps, 6) AS payout,
        |  'USD' AS currency
        |FROM vol LEFT JOIN rps ON vol.entrypoint = rps.entrypoint""".stripMargin,
    "q_rps_factor" ->
      """WITH vol AS (
        |  SELECT c_nationkey, COUNT(*) AS volume
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
        |idx AS (
        |  SELECT c_nationkey, ROUND(AVG(c_acctbal), 6) AS cost_idx FROM customer GROUP BY 1),
        |df AS (SELECT vol.c_nationkey, volume, cost_idx FROM vol JOIN idx USING (c_nationkey)),
        |pkg AS (SELECT ROUND(SUM(l_quantity), 6) AS package FROM lineitem),
        |denom AS (SELECT ROUND(SUM(volume * cost_idx), 6) AS denom FROM df)
        |SELECT c_nationkey, volume, cost_idx,
        |  ROUND(cost_idx * (package / denom), 6) AS rps
        |FROM df, pkg, denom""".stripMargin,
    "q_feature_mapping" ->
      """WITH e AS (SELECT user_id, event_type, value FROM events),
        |feature AS (
        |  SELECT 'Feature' AS feature_type,
        |    CASE
        |      WHEN event_type = 'purchase' AND value > 100 THEN 'feature: purchase_large'
        |      WHEN event_type = 'purchase' THEN 'feature: purchase_small'
        |      WHEN event_type = 'signup' THEN 'feature: signup'
        |      WHEN event_type = 'click' THEN 'feature: click'
        |      WHEN event_type = 'view' THEN 'feature: view'
        |      ELSE 'feature: others' END AS feature_name,
        |    user_id
        |  FROM e),
        |feature_kept AS (
        |  SELECT * FROM feature WHERE feature_name <> 'feature: others'),
        |vertical AS (
        |  SELECT 'Vertical' AS feature_type,
        |    CASE
        |      WHEN event_type IS NULL THEN 'Unknown'
        |      WHEN event_type IN ('signup', 'view') THEN 'Organic'
        |      WHEN event_type IN ('click', 'purchase') THEN 'Paid'
        |      WHEN event_type IN ('error') THEN 'Diagnostic'
        |      ELSE 'Others' END AS feature_name,
        |    user_id
        |  FROM e),
        |app AS (SELECT 'App' AS feature_type, 'App' AS feature_name, user_id FROM e),
        |u AS (
        |  SELECT * FROM feature_kept UNION ALL SELECT * FROM vertical UNION ALL SELECT * FROM app)
        |SELECT feature_type, feature_name, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users
        |FROM u GROUP BY 1, 2""".stripMargin
  )
}
