package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** The adjust-trackers task surface (reference tasks/adjust.py:38-46
  * `transform_adjust_trackers`): the one reference transform whose
  * whole job is stamping the run's execution date onto the extracted
  * trackers feed — run daily with the reference default of
  * "yesterday" (reference tasks/adjust.py:15 DEFAULTS =
  * lookback_dates(utcnow, 1), our [[graft.pipelines.Backfill
  * .lookbackDate]]).
  *
  * Expressed as a transform factory for [[ConfiguredTask]]: the stamp
  * is a literal column, so it folds into whatever plan the source
  * extract produced (zero extra passes — a constant projection on the
  * scan). */
object Adjust {

  /** `transform_adjust_trackers`: stamp `execution_date` as a
    * timestamp (the reference casts to datetime64[ns]). */
  def stampExecutionDate(executionDate: LocalDate): DataFrame => DataFrame =
    df => df.withColumn("execution_date",
      lit(executionDate.toString).cast("timestamp"))

  /** The reference's default run date: one day back from "now". */
  def defaultExecutionDate(today: LocalDate): LocalDate =
    graft.pipelines.Backfill.lookbackDate(today, 1)
}
