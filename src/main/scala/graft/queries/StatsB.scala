package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Second statistical batch (SURVEY §2 #126-130): seasonal
  * decomposition (#126), Gini revenue concentration (#127), CUBE
  * aggregation with grouping ids (#128), decile banding (#129) and
  * relational set operations (#130) — the remaining
  * reporting-surface shapes after the #118-125 batch.
  */
object StatsB {

  /** #126 DAY-OF-WEEK SEASONALITY + ADJUSTED SERIES — the seasonal
    * index every ops dashboard applies before comparing a Tuesday to
    * a Sunday: per-weekday mean daily volume relative to the overall
    * mean, and each day's volume deflated by its weekday index
    * (ratio-to-moving-average decomposition, the weekday half).
    *
    * Cross-engine note: Spark's dayofweek is 1-based Sunday, DuckDB's
    * is 0-based Sunday — the Spark side subtracts 1.
    *
    * Scale shape: raw events collapse in ONE map-side-combined daily
    * agg; the weekday profile and the overall mean are two tiny aggs
    * over the daily frame, broadcast back; every ratio is computed
    * from exact integer counts in the same operation order on both
    * engines. */
  def seasonality(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", (dayofweek(col("day")) - 1).cast("long"))
    val prof = daily.groupBy(col("dow"))
      .agg((sum(col("n")).cast("double") / count(lit(1))).as("dow_avg"))
    val overall = daily.agg(
      (sum(col("n")).cast("double") / count(lit(1))).as("overall_avg"))
    daily.join(broadcast(prof), Seq("dow"))
      .crossJoin(broadcast(overall))
      .select(col("day"), col("dow"), col("n"),
        round(col("dow_avg") / col("overall_avg"), 6).as("dow_index"),
        round(col("n") / (col("dow_avg") / col("overall_avg")), 6).as("adjusted"))
  }

  /** #127 GINI CONCENTRATION — how concentrated is order revenue
    * across customers, per market segment (the inequality summary a
    * marketplace reports; the same statistic profiles corpus token
    * concentration across sources). G = 2·Σ r·x / (n·Σx) − (n+1)/n
    * over revenues ranked ascending with a key tie-break.
    *
    * Scale shape: per-customer revenue is one map-side-combined agg
    * (rounded to 6dp so the rank order is engine-stable), the rank is
    * a per-segment distributed sort, and the Gini reduces in ONE
    * final agg; only customers with orders participate (inner join —
    * zero-revenue customers are a reporting choice, documented). */
  def gini(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(s, dir).as("o")
      .join(Tables.customer(s, dir).as("c"),
        col("o.o_custkey") === col("c.c_custkey"))
      .groupBy(col("c.c_mktsegment").as("segment"), col("c.c_custkey").as("custkey"))
      .agg(round(sum(col("o.o_totalprice")), 6).as("rev"))
    val w = Window.partitionBy(col("segment")).orderBy(col("rev"), col("custkey"))
    rev.withColumn("r", row_number().over(w).cast("long"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        // money at 2dp: summing thousands of 6dp-rounded doubles can
        // drift past the 6th decimal across engines; 2dp is stable
        round(sum(col("rev")), 2).as("total_rev"),
        sum(col("r").cast("double") * col("rev")).as("wsum"))
      .select(col("segment"), col("n_customers"), col("total_rev"),
        round(lit(2.0) * col("wsum")
            / (col("n_customers").cast("double") * col("total_rev"))
          - (col("n_customers") + 1).cast("double") / col("n_customers"),
          6).as("gini"))
  }

  /** #128 CUBE AGGREGATION — all 2² grouping combinations of
    * (returnflag, linestatus) in one pass with a grouping id (the
    * OLAP subtotal surface next to #60's GROUPING SETS; Spark's
    * leftmost-column-is-MSB id convention matches DuckDB's
    * GROUPING()).
    *
    * Scale shape: CUBE is one expand (×4) + one map-side-combined
    * hash agg — subtotals never re-scan the table. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 6).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("n"), col("sum_qty"))

  /** #129 DECILE BANDING — customers cut into 10 equal-frequency
    * account-balance bands (ntile with a key tie-break so band
    * membership is deterministic), per-band population and balance
    * envelope: the score-banding step behind credit tiers, LTV
    * deciles, quality buckets.
    *
    * Scale shape: ntile is one distributed sort (the exact-quantile
    * cost, same family as #14's percentiles); the per-band stats are
    * one map-side-combined agg over the banded rows. */
  def ntileDeciles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 6).as("min_bal"),
        round(max(col("c_acctbal")), 6).as("max_bal"),
        round(avg(col("c_acctbal")), 6).as("avg_bal"))
  }

  /** #130 SET OPERATIONS — INTERSECT / EXCEPT over user cohorts
    * (purchasers who also clicked, minus anyone who hit an error):
    * the relational set algebra the engine must expose beyond joins.
    *
    * Scale shape: Spark executes both as distinct hash aggregations
    * with map-side partials over the keyed shuffle — the same cost
    * envelope as a semi/anti join on the user key. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // value-qualified cohorts: the synthetic data is dense (every user
    // has every event type), so unqualified cohorts would make the set
    // algebra vacuous
    def cohort(t: String, minValue: Double) =
      ev.filter(col("event_type") === t && col("value") > minValue)
        .select(col("user_id")).distinct()
    cohort("purchase", 100)
      .intersect(cohort("click", 100))
      .except(cohort("error", 250))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seasonality"   -> seasonality _,
    "q_gini"          -> gini _,
    "q_cube_agg"      -> cubeAgg _,
    "q_ntile_deciles" -> ntileDeciles _,
    "q_set_ops"       -> setOps _
  )

  val oracles: Map[String, String] = Map(
    "q_seasonality" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |dd AS (SELECT day, n, dayofweek(day) AS dow FROM daily),
        |prof AS (
        |  SELECT dow, CAST(SUM(n) AS DOUBLE) / COUNT(*) AS dow_avg
        |  FROM dd GROUP BY dow),
        |o AS (SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS overall_avg FROM dd)
        |SELECT dd.day, CAST(dd.dow AS BIGINT) AS dow, dd.n,
        |  ROUND(p.dow_avg / o.overall_avg, 6) AS dow_index,
        |  ROUND(dd.n / (p.dow_avg / o.overall_avg), 6) AS adjusted
        |FROM dd JOIN prof p USING (dow), o""".stripMargin,
    "q_gini" ->
      """WITH rev AS (
        |  SELECT c.c_mktsegment AS segment, c.c_custkey AS custkey,
        |    ROUND(SUM(o.o_totalprice), 6) AS rev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT segment, rev,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY segment ORDER BY rev, custkey) AS BIGINT) AS r
        |  FROM rev)
        |SELECT segment, COUNT(*) AS n_customers,
        |  ROUND(SUM(rev), 2) AS total_rev,
        |  ROUND(2.0 * SUM(CAST(r AS DOUBLE) * rev)
        |      / (CAST(COUNT(*) AS DOUBLE) * ROUND(SUM(rev), 2))
        |    - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
        |FROM ranked GROUP BY segment""".stripMargin,
    "q_cube_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n, ROUND(SUM(l_quantity), 6) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q_ntile_deciles" ->
      """WITH banded AS (
        |  SELECT c_acctbal,
        |    CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS decile
        |  FROM customer)
        |SELECT decile, COUNT(*) AS n,
        |  ROUND(MIN(c_acctbal), 6) AS min_bal,
        |  ROUND(MAX(c_acctbal), 6) AS max_bal,
        |  ROUND(AVG(c_acctbal), 6) AS avg_bal
        |FROM banded GROUP BY decile""".stripMargin,
    "q_set_ops" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 100
        |INTERSECT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND value > 100
        |EXCEPT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 250""".stripMargin
  )
}
