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

  /** INCREMENTAL session windows — the daily-job shape for
    * sessionization at 100 TB: each day is sessionized
    * INDEPENDENTLY (partition (key, day) — in production that pass
    * runs once per day over one day of events and is stored), and a
    * boundary-stitch pass merges sessions that straddle midnight.
    * Re-sessionizing the full history every day re-sorts every
    * user's entire event stream; this shape sorts one day and then
    * works on SESSION rows (orders of magnitude fewer).
    *
    * The stitch is a connected-components resolve
    * ([[graft.dedup.Resolve.connectedComponents]]) over session
    * nodes: an edge links day d's LAST session to day d+1's FIRST
    * session when the cross-midnight gap is within `gapUs`; chains
    * spanning several midnights merge transitively. The CC input is
    * only boundary-adjacent session pairs, so the fixpoint loop
    * runs over a frame proportional to users-active-at-midnight,
    * not events.
    *
    * Node ids pack (key, epochday, per-day session ordinal) into one
    * long: the ordinal field is sized to the ACTUAL gap (a day holds
    * at most day/gap + 1 sessions, since each new session needs a
    * > gap idle stretch — 6 bits at the 30-min default), epochday
    * gets 15 bits (through 2059), the key the remaining top bits.
    * Gaps above one day are rejected (the adjacent-day stitch can't
    * merge across an empty day).
    *
    * Output is identical to [[sessionWindows]] over the full
    * history — the equivalence is the correctness gate. */
  def sessionWindowsIncremental(
      events: DataFrame,
      key: String,
      tsCol: String,
      order: Seq[Column],
      gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val dayUs = 86400L * 1000 * 1000
    // the day-split + adjacent-day stitch presumes a gap below one
    // day (a longer gap would have to merge across EMPTY days, which
    // the epochday→epochday-1 edge join cannot see)
    require(gapUs > 0 && gapUs <= dayUs,
      s"gapUs must be in (0, 1 day]; got $gapUs")
    // per-day session ordinal bound: each new session needs a > gap
    // idle stretch, so a day holds at most dayUs/gapUs + 1 sessions —
    // size the ordinal bit field to the ACTUAL gap instead of
    // assuming the 30-minute default's 6 bits
    val sidBits = 64 - java.lang.Long.numberOfLeadingZeros(dayUs / gapUs + 1)
    // 1. the daily job: per-(key, day) sessionization
    val withDay = events.withColumn("__day", to_date(col(tsCol)))
    val daily = sessionWindows(withDay, Seq(key, "__day"), tsCol, order, gapUs)
    val sess = daily
      .withColumn("end_us", col("session_start_us") + col("session_len_us"))
      .withColumn("epochday",
        datediff(col("__day"), lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("nid",
        shiftleft(col(key), 15 + sidBits) +
          shiftleft(col("epochday"), sidBits) + col("session_id"))
    // 2. boundary edges: last session of day d ↔ first session of day
    // d+1 for the same key, when the cross-midnight gap fits
    val lastOf = sess.groupBy(col(key), col("epochday"))
      .agg(expr("max_by(nid, session_id)").as("src"),
        expr("max_by(end_us, session_id)").as("last_end"))
    val firstOf = sess.groupBy(col(key), col("epochday"))
      .agg(expr("min_by(nid, session_id)").as("dst"),
        expr("min_by(session_start_us, session_id)").as("first_start"))
      .withColumn("epochday", col("epochday") - 1)
    val edges = lastOf.join(firstOf, Seq(key, "epochday"))
      .filter(col("first_start") - col("last_end") <= gapUs)
      .select(col("src"), col("dst"))
    // 3. transitive merge over session NODES (tiny), isolated
    // sessions stay themselves
    val labels = graft.dedup.Resolve.connectedComponents(edges)
      .withColumnRenamed("id", "nid").withColumnRenamed("c", "grp")
    val merged = sess.join(labels, Seq("nid"), "left")
      .withColumn("grp", coalesce(col("grp"), col("nid")))
      .groupBy(col(key), col("grp"))
      .agg(min(col("session_start_us")).as("session_start_us"),
        (max(col("end_us")) - min(col("session_start_us"))).as("session_len_us"),
        sum(col("n_events")).as("n_events"))
    // 4. ordinal ids — a window over SESSION rows, not events
    val w = Window.partitionBy(col(key)).orderBy(col("session_start_us"))
    merged.select(col(key),
      (row_number().over(w) - 1).cast("long").as("session_id"),
      col("session_start_us"), col("session_len_us"), col("n_events"))
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
