package graft.pipelines

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** INCREMENTAL MATERIALIZED VIEW maintenance — the operational
  * composition of the partial-aggregate pattern (#98/#104/#108: store
  * mergeable per-day partials, derive any view from them) with the
  * versioned snapshot table: each refresh folds ONE day's delta into
  * the stored partials and republishes the merged view as a new
  * time-travel version, so the raw event history is scanned exactly
  * once per day — never re-scanned — and every published view state
  * stays pinnable.
  *
  * Layout under a view root:
  * {{{
  *   <root>/partials/__date=D/…    per-day mergeable partial aggregates
  *   <root>/view/…                 Snapshots table of the merged view
  * }}}
  *
  * The maintained view here is the daily-ops staple: per event type,
  * total events, total value and distinct users. COUNT(DISTINCT) does
  * not merge from plain counts, so the partial keeps the per-day
  * DISTINCT (type, user) HLL sketch (`hll_sketch_agg` — lossless
  * union at equal lgK, the #98 result) alongside exact counters.
  *
  * Idempotence: re-running a day overwrites ONLY that day's partial
  * partition (dynamic partition overwrite — the Backfill contract)
  * and recommits the merged view; the Snapshots pointer swap makes
  * the publish atomic. A crash between partial write and view commit
  * leaves the view at the previous version with the partial already
  * durable — the re-run converges.
  */
object IncrementalView {

  private def partialsPath(root: String) = s"$root/partials"
  private def viewRoot(root: String) = s"$root/view"

  /** Fold one day's delta into the stored partials and republish the
    * merged view. `delta` must hold exactly the rows of `date`
    * (the daily-job contract); returns the committed view version. */
  def refresh(spark: SparkSession, root: String, delta: DataFrame, date: String): Long = {
    val partial = delta
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        expr("hll_sketch_agg(user_id, 12)").as("users_hll"))
      .withColumn("__date", lit(date))
    partial.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__date")
      .parquet(partialsPath(root))
    publish(spark, root)
  }

  /** Recompute the merged view FROM PARTIALS ONLY and commit it as a
    * new snapshot version (also the recovery path after a crash
    * between partial write and commit). */
  def publish(spark: SparkSession, root: String): Long = {
    val merged = spark.read.parquet(partialsPath(root))
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        round(sum(col("sum_value")), 6).as("sum_value"),
        expr("hll_sketch_estimate(hll_union_agg(users_hll, true))").as("approx_users"))
    Snapshots.commit(merged, viewRoot(root))
  }

  /** The published view at its latest (or a pinned) version. */
  def read(spark: SparkSession, root: String): DataFrame =
    Snapshots.read(spark, viewRoot(root))
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame =
    Snapshots.readVersion(spark, viewRoot(root), v)

  /** The DIRECT (non-incremental) formulation over the full event
    * history — the equivalence gate the spec holds `refresh` to. */
  def direct(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("approx_users"))
}
