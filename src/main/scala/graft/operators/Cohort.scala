package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort / retention / active-user analytics.
  *
  * Re-expresses the reference's cohort DAG
  * (reference sql/mango_user_occurrence.sql,
  * sql/mango_cohort_retained_users.sql,
  * sql/mango_active_user_count.sql,
  * sql/mango_feature_active_user_count.sql) as composable
  * DataFrame→DataFrame operators.
  *
  * Scale notes: `occurrence` is ONE shuffle, partitioned by
  * (dims, user) — the cohort date comes from a window min over the
  * same partitioning, not a self-join, so the partial aggregation is
  * map-side combined and there is no second exchange. Everything
  * downstream (retention matrix, active-user counts) groups by lower-
  * cardinality keys derived from the same rows.
  */
object Cohort {

  /** One row per (dims, user, active-date) with cohort_date and
    * occur_day/week/month derivation
    * (reference sql/mango_user_occurrence.sql). */
  def occurrence(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      dims: Seq[String] = Nil,
      maxDay: Int = 112): DataFrame = {
    val keyCols = (dims :+ userCol).map(col)
    val daily = events
      .select((dims.map(col) :+ col(userCol) :+ to_date(col(tsCol)).as("occur_date")): _*)
      .distinct()
    val w = Window.partitionBy(keyCols: _*)
    daily
      .withColumn("cohort_date", min(col("occur_date")).over(w))
      .withColumn("occur_day", datediff(col("occur_date"), col("cohort_date")).cast("long"))
      .filter(col("occur_day") >= 0 && col("occur_day") < maxDay)
      .withColumn("occur_week", floor(col("occur_day") / 7).cast("long"))
      .withColumn("occur_month", floor(col("occur_day") / 28).cast("long"))
  }

  /** Retention matrix over an occurrence frame: distinct users seen
    * exactly N days/weeks/months after their cohort date
    * (reference sql/mango_cohort_retained_users.sql). */
  def retentionMatrix(occ: DataFrame, dims: Seq[String], userCol: String = "user_id"): DataFrame = {
    def at(c: String, n: Int): Column =
      countDistinct(when(col(c) === n, col(userCol))).as(s"${c.charAt(6)}${n}_retained")
    occ
      .groupBy((dims :+ "cohort_date").map(col): _*)
      .agg(
        countDistinct(when(col("occur_day") === 0, col(userCol))).as("daily_cohort_size"),
        at("occur_day", 1), at("occur_day", 3), at("occur_day", 7), at("occur_day", 14),
        countDistinct(when(col("occur_week") === 0, col(userCol))).as("weekly_cohort_size"),
        at("occur_week", 1), at("occur_week", 2), at("occur_week", 3),
        countDistinct(when(col("occur_month") === 0, col(userCol))).as("monthly_cohort_size"),
        at("occur_month", 1))
  }

  /** DAU/WAU/MAU (+ new-user variants) as of a date, per dims
    * (reference sql/mango_active_user_count.sql: dau/wau/mau CTEs
    * left-joined on the dims). The wau/mau sides are computed from
    * the same occurrence rows — three aggregations over one shuffle
    * input, joined on low-cardinality dims. */
  def activeUserCount(occ: DataFrame, asOf: String, dims: Seq[String], userCol: String = "user_id"): DataFrame = {
    val d = lit(asOf).cast("date")
    val u = col(userCol)
    val isNew = col("occur_day") === 0
    val inWau = col("occur_date") > date_sub(d, 7)
    // The reference computes dau/wau/mau as three scans LEFT JOINed on
    // the dims (sql/mango_active_user_count.sql). One conditional-
    // distinct aggregation over the 28-day slice produces identical
    // rows (dau>0 ⇒ wau,mau>0, so the join never actually nulls) in a
    // SINGLE shuffle instead of three agg jobs + two joins; the dau>0
    // filter reproduces the dau-driven join base exactly.
    occ.filter(col("occur_date") > date_sub(d, 28) && col("occur_date") <= d)
      .groupBy(dims.map(col): _*)
      .agg(
        countDistinct(when(col("occur_date") === d && isNew, u)).as("new_dau"),
        countDistinct(when(col("occur_date") === d, u)).as("dau"),
        countDistinct(when(inWau && isNew, u)).as("new_wau"),
        countDistinct(when(inWau, u)).as("wau"),
        countDistinct(when(isNew, u)).as("new_mau"),
        countDistinct(u).as("mau"))
      .filter(col("dau") > 0)
      .select((dims.map(col) :+ col("new_dau") :+ col("dau") :+ col("new_wau") :+
        col("wau") :+ col("new_mau") :+ col("mau")): _*)
  }
}
