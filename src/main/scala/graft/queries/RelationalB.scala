package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.Sessionize

/** Relational / ETL core operators, second batch (SURVEY §2 #6-23). */
object RelationalB {

  /** #6 multi-key LEFT JOIN of two conformed aggregates
    * (reference sql/mango_user_rfe_28d.sql joins rfe_partial ⋈
    * rfe_session on client_id+feature+country). */
  def joinMultikeyLeft(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 6).as("purchase_value"), count(lit(1)).as("purchases"))
    val errors = e.filter(col("event_type") === "error")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("errors"))
    purchases.join(errors, Seq("user_id", "day"), "left")
  }

  /** #7 anti-join: keys absent from the other side
    * (reference sql/mango_feature_cohort_date.sql "ec.client_id IS
    * NULL" left-join-null idiom → Spark left_anti). */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(s, dir)
    val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    customer
      .join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** #8 semi-join: existence filter
    * (reference sql/mango_user_rfe_daily_partial.sql cohort lookup). */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    val heavy = Tables.lineitem(s, dir).filter(col("l_quantity") >= 49)
    part
      .join(heavy, part("p_partkey") === heavy("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
  }

  /** #9 UNION ALL of conformed branches + downstream agg
    * (reference sql/mango_cohort_user_occurrence.sql). */
  def unionAll(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val b1 = e.filter(col("event_type") === "purchase")
      .select(lit("channel").as("measure_type"), col("user_id"), to_date(col("ts")).as("day"))
    val b2 = e.filter(col("event_type").isin("click", "view"))
      .select(lit("feature").as("measure_type"), col("user_id"), to_date(col("ts")).as("day"))
    b1.unionByName(b2)
      .groupBy(col("measure_type"), col("day"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
  }

  /** #12 LEAD window: inter-event gap stats per user
    * (reference sql/mango_user_rfe_daily_session.sql LEAD …
    * OVER (PARTITION BY client_id … ORDER BY timestamp)). */
  def windowLead(s: SparkSession, dir: String): DataFrame =
    Sessionize
      .withGaps(Tables.events(s, dir), Seq("user_id"), "ts", Seq(col("ts"), col("event_id")))
      .groupBy(col("user_id"))
      .agg(
        count(col("gap_us")).as("n_gaps"),
        // average in seconds: summation-order double noise at µs
        // magnitude (~1e10) exceeds 6 decimals; at seconds it doesn't
        round(avg(col("gap_us") / 1e6), 2).as("avg_gap_sec"),
        max(col("gap_us")).as("max_gap_us"))

  /** #13 top-N per group (reference udf/order_channels.sql ordering +
    * rank-limit idiom).
    *
    * Via the bounded map-side [[graft.plans.TopKAgg]], NOT a
    * row_number window: o_orderpriority has 5 distinct values, so a
    * window would sort the whole table on ≤5 tasks no matter how big
    * the cluster is. The aggregate sends at most k rows per group per
    * map task to the shuffle; identical tie-break (price desc, key
    * asc) keeps the same oracle. */
  def topnPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_totalprice").cast("double"),
        col("o_orderkey").cast("long"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(3).toColumn)
      .flatMap { case (prio, top) =>
        top.zipWithIndex.map { case ((price, key), i) => (prio, (i + 1).toLong, key, price) }
      }
      .toDF("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
  }

  /** #14 PERCENTILE_CONT by partition
    * (reference sql/mango_feature_roi.sql rfe CTE). */
  def percentileGroups(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("value_25p"),
        round(expr("percentile(value, 0.5)"), 6).as("value_50p"),
        round(expr("percentile(value, 0.75)"), 6).as("value_75p"),
        count(lit(1)).as("n"))

  /** #15 pivot aggregation (reference tasks/rps.py:147
    * pd.pivot_table(index=country, values=volume, aggfunc=sum)). */
  def pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum(col("value")), 6))

  /** #16 unpivot/melt wide→long (inverse of the rps pivot; stack()). */
  def unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"),
        countDistinct(col("user_id")).as("users"))
      .selectExpr(
        "day",
        """stack(3,
          |  'n_events', cast(n_events as double),
          |  'total_value', total_value,
          |  'users', cast(users as double)) as (metric, val)""".stripMargin)

  /** #17 UNNEST → rows (reference sql/mango_events.sql
    * UNNEST(events)): token explosion + frequency. */
  def explodeUnnest(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))

  /** #19 kv-array lookup per entity: the reference's
    * `MAX((SELECT value FROM UNNEST(settings) WHERE key=…))`
    * (reference sql/mango_user_channels.sql tracker_settings)
    * re-expressed as conditional aggregation — same semantics, stays
    * in whole-stage codegen with map-side partial aggregation. */
  def kvExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        round(max(when(col("event_type") === "signup", col("value"))), 6).as("signup_value"),
        round(max(when(col("event_type") === "purchase", col("value"))), 6).as("max_purchase"),
        max(to_date(col("ts"))).as("execution_date"))

  /** #23 CROSS JOIN UNNEST + bounded filter + sum
    * (reference sql/mango_revenue_google.sql vol CTE: UNNEST(searches)
    * WHERE value<10000 AND key LIKE '%google%'). */
  def crossUnnestSum(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 5 && col("token").contains("a"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("volume"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_multikey_left" -> joinMultikeyLeft _,
    "q_anti_join"          -> antiJoin _,
    "q_semi_join"          -> semiJoin _,
    "q_union_all"          -> unionAll _,
    "q_window_lead"        -> windowLead _,
    "q_topn_per_group"     -> topnPerGroup _,
    "q_percentile_groups"  -> percentileGroups _,
    "q_pivot"              -> pivot _,
    "q_unpivot"            -> unpivot _,
    "q_explode_unnest"     -> explodeUnnest _,
    "q_kv_extract"         -> kvExtract _,
    "q_cross_unnest_sum"   -> crossUnnestSum _
  )

  val oracles: Map[String, String] = Map(
    "q_join_multikey_left" ->
      """WITH p AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    ROUND(SUM(value), 6) AS purchase_value, COUNT(*) AS purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS errors
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT p.user_id, p.day, p.purchase_value, p.purchases, e.errors
        |FROM p LEFT JOIN e ON p.user_id = e.user_id AND p.day = e.day""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "q_semi_join" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 49)""".stripMargin,
    "q_union_all" ->
      """WITH u AS (
        |  SELECT 'channel' AS measure_type, user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'feature' AS measure_type, user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE event_type IN ('click', 'view'))
        |SELECT measure_type, day, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users
        |FROM u GROUP BY 1, 2""".stripMargin,
    "q_window_lead" ->
      """WITH g AS (
        |  SELECT user_id,
        |    LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |      - epoch_us(CAST(ts AS TIMESTAMP)) AS gap_us
        |  FROM events)
        |SELECT user_id, COUNT(gap_us) AS n_gaps,
        |  ROUND(AVG(gap_us / 1e6), 2) AS avg_gap_sec, MAX(gap_us) AS max_gap_us
        |FROM g GROUP BY 1""".stripMargin,
    "q_topn_per_group" ->
      """SELECT o_orderpriority,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rank,
        |  o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY rank <= 3""".stripMargin,
    "q_percentile_groups" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.25), 6) AS value_25p,
        |  ROUND(quantile_cont(value, 0.5), 6) AS value_50p,
        |  ROUND(quantile_cont(value, 0.75), 6) AS value_75p,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
        |  ROUND(SUM(CASE WHEN event_type = 'error' THEN value END), 6) AS error,
        |  ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
        |  ROUND(SUM(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
        |  ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 6) AS view
        |FROM events GROUP BY 1""".stripMargin,
    "q_unpivot" ->
      """WITH base AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
        |    ROUND(SUM(value), 6) AS total_value, COUNT(DISTINCT user_id) AS users
        |  FROM events GROUP BY 1)
        |SELECT day, 'n_events' AS metric, CAST(n_events AS DOUBLE) AS val FROM base
        |UNION ALL SELECT day, 'total_value', total_value FROM base
        |UNION ALL SELECT day, 'users', CAST(users AS DOUBLE) FROM base""".stripMargin,
    "q_explode_unnest" ->
      """SELECT token, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY 1""".stripMargin,
    "q_kv_extract" ->
      """SELECT user_id,
        |  ROUND(MAX(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup_value,
        |  ROUND(MAX(CASE WHEN event_type = 'purchase' THEN value END), 6) AS max_purchase,
        |  MAX(CAST(ts AS DATE)) AS execution_date
        |FROM events GROUP BY 1""".stripMargin,
    "q_cross_unnest_sum" ->
      """SELECT lang, token, COUNT(*) AS volume FROM (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE LENGTH(token) >= 5 AND token LIKE '%a%'
        |GROUP BY 1, 2""".stripMargin
  )
}
