package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental RFE (recency / frequency / engagement) via per-day
  * partial aggregates (reference sql/mango_user_rfe_daily_partial.sql
  * materializes one small partial table per day; sql/mango_user_rfe_28d
  * .sql:96-110 then merges the last 28 partials instead of re-scanning
  * 28 days of raw events).
  *
  * This is THE scale technique for sliding-window user metrics: the
  * daily job scans only that day's raw events (one partition at 100 TB
  * table scale), emits a tiny (user, feature, day) partial, and the
  * 28-day window becomes a merge of 28 small tables — turning a daily
  * 28-day raw re-scan into a 1-day scan plus 28 cheap reads. Because a
  * partial row is unique per (user, feature, day), distinct-day counts
  * collapse to plain `count(*)` over partial rows — the expensive
  * `countDistinct` never touches raw events again.
  *
  * Algebra: every RFE column is decomposable — recency = max(day),
  * frequency = count of partial rows, event counts and value sums add.
  * [[merge]] therefore reproduces the direct 28-day computation
  * EXACTLY (same oracle output), not approximately.
  */
object Rfe {

  /** One day's (or any slice's) partial aggregate: the only stage that
    * reads raw events. Output is per (user_id, event_type, day) —
    * unique on that triple, which later turns distinct-day counting
    * into row counting. */
  def dailyPartial(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events.withColumn("day", to_date(col(tsCol)))
      .groupBy(col("user_id"), col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))

  /** Merge partials for the 28-day window ending at `asof` into the
    * full RFE profile — identical output to the direct computation
    * over raw events, at the cost of reading partials only. */
  def merge(partials: DataFrame, asof: String, windowDays: Int = 28): DataFrame = {
    val w = partials.filter(
      col("day") > date_sub(lit(asof).cast("date"), windowDays) &&
        col("day") <= lit(asof).cast("date"))
    val active = w.select(col("user_id"), col("day")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("active_days"))
    val rfe = w.groupBy(col("user_id"), col("event_type"))
      .agg(
        datediff(lit(asof).cast("date"), max(col("day"))).cast("long").as("recency"),
        count(lit(1)).as("frequency_days"), // partial rows ARE distinct days
        sum(col("n_events")).as("n_events"),
        round(sum(col("value_sum")), 6).as("total_value"))
    rfe.join(active, Seq("user_id"), "left")
      .select(
        col("user_id"), col("event_type"), col("active_days"),
        col("recency"), col("frequency_days"),
        round(col("frequency_days") / col("active_days"), 6).as("stickiness"),
        round(col("n_events") / col("frequency_days"), 6).as("value_event_count"),
        col("total_value"))
  }
}
