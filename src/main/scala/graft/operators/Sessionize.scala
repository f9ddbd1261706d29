package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LEAD-based sessionization with an idle-gap cap.
  *
  * Re-expresses the reference's vertical session-time computation
  * (reference sql/mango_user_rfe_daily_session.sql
  * vertical_session_event / vertical_session_time CTEs): each event's
  * dwell is the gap to the next event in the same partition, gaps
  * above the cap (default 30 min) are discarded as idle.
  *
  * All time arithmetic is in integer microseconds (unix_micros) so
  * results are exactly reproducible across engines. One shuffle,
  * partitioned by the session keys; no global sort.
  */
object Sessionize {

  /** Per-event gap to the next event (µs), null for the last event. */
  def withGaps(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      order: Seq[Column]): DataFrame = {
    val w  = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val us = unix_micros(col(tsCol))
    events
      .withColumn("__us", us)
      .withColumn("gap_us", lead(col("__us"), 1).over(w) - col("__us"))
      .drop("__us")
  }

  /** Gap-split session windows: a new session starts when the gap
    * from the previous event exceeds `gapUs`. Cumulative-sum session
    * ids over one (key)-partitioned window — the batch analogue of
    * the streaming state machine in
    * [[graft.streaming.EventsStream.sessionize]]. */
  def sessionWindows(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      order: Seq[Column],
      gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val w  = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val us = unix_micros(col(tsCol))
    val withFlag = events
      .withColumn("__us", us)
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1L).otherwise(lit(0L)))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withFlag
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(
        min(col("__us")).as("session_start_us"),
        (max(col("__us")) - min(col("__us"))).as("session_len_us"),
        count(lit(1)).as("n_events"))
  }

  /** Daily session time per key: sum of capped gaps
    * (gap > capUs counts 0, mirroring the reference's
    * `CASE WHEN diff > 30*60*1000 THEN 0 ELSE diff END`). */
  def dailySessionTime(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      order: Seq[Column],
      capUs: Long = 30L * 60 * 1000 * 1000): DataFrame =
    withGaps(events, keys, tsCol, order)
      .withColumn("day", to_date(col(tsCol)))
      .groupBy((keys :+ "day").map(col): _*)
      .agg(
        sum(when(col("gap_us") > capUs, 0L).otherwise(col("gap_us"))).as("session_time_us"),
        count(lit(1)).as("n_events"))
}
