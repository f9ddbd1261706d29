package graft.pipelines

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Writers

/** Date-range backfill orchestration, mirroring the reference's
  * backfill surface (reference tasks/bigquery.py:411-414 `backfill`:
  * loop `daily_run` over `get_date_range`; :42-56 `get_backfill_dates`
  * from per-task `backfill_days`; utils/marshalling.py:277-303
  * `lookback_dates`/`lookfoward_dates`).
  *
  * Spark-first: the reference re-runs the whole daily DAG once per
  * date because BigQuery jobs are date-templated; here a backfill is
  * ONE distributed job — filter the frame to the date range and
  * dynamic-partition-overwrite every affected date partition in a
  * single pass. Re-running the same range rewrites the same
  * partitions to the same bytes (idempotent), and untouched dates are
  * never read or written. A per-day loop remains only as an
  * orchestrator convenience for schedulers that checkpoint per date.
  */
object Backfill {

  /** [start, end) — reference get_date_range's half-open semantics. */
  def dateRange(start: LocalDate, endExclusive: LocalDate): Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.isBefore(endExclusive)).toSeq

  /** reference lookback_dates: date - period days. */
  def lookbackDate(date: LocalDate, period: Int): LocalDate = date.minusDays(period.toLong)

  /** reference lookfoward_dates: date + period days. */
  def lookforwardDate(date: LocalDate, period: Int): LocalDate = date.plusDays(period.toLong)

  /** reference get_backfill_dates: the as-of date minus each
    * configured backfill_days entry. */
  def backfillDates(asOf: LocalDate, backfillDays: Seq[Int]): Seq[LocalDate] =
    backfillDays.map(d => lookbackDate(asOf, d))

  /** Backfill [start, end) in ONE distributed pass: only the range's
    * partitions are overwritten (partitionOverwriteMode=dynamic),
    * other dates untouched. Idempotent: re-running produces identical
    * output. */
  def run(
      df: DataFrame, dateCol: String, start: LocalDate, endExclusive: LocalDate,
      prefix: String, stage: String, task: String, source: String): Unit = {
    val ranged = df.filter(
      to_date(col(dateCol)) >= lit(start.toString) &&
        to_date(col(dateCol)) < lit(endExclusive.toString))
    Writers.overwriteDatePartitions(ranged, prefix, stage, task, source, dateCol)
  }

  /** Per-day loop variant for schedulers that need day-granular
    * checkpointing (the reference's backfill shape). Each day is its
    * own dynamic-partition overwrite, so a crashed backfill resumes
    * safely from the failed date. */
  def runPerDay(
      df: DataFrame, dateCol: String, dates: Seq[LocalDate],
      prefix: String, stage: String, task: String, source: String): Unit =
    dates.foreach { d =>
      val day = df.filter(to_date(col(dateCol)) === lit(d.toString))
      Writers.overwriteDatePartitions(day, prefix, stage, task, source, dateCol)
    }
}
