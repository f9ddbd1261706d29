package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-scoped deduplication operators.
  *
  * Re-expresses the reference's two dedup idioms Spark-first:
  *  - `RANK() OVER (PARTITION BY client_id ORDER BY ...) = 1`
  *    (reference sql/mango_user_channels.sql:118-121, "dedup creative
  *    level"): [[rankDedup]].
  *  - snapshot upsert "do_updates_inserts" + drop_duplicates
  *    (reference tasks/revenue.py:147-195): [[snapshotMerge]].
  *
  * Both are single-shuffle window plans partitioned by the dedup key —
  * no global sort, scales linearly with key cardinality.
  */
object Dedup {

  /** Keep exactly one row per key: the first under `order`.
    * Uses row_number (not rank) so ties cannot produce >1 row per key;
    * callers pass a total order (include a unique tiebreak column).
    */
  def rankDedup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merge an old snapshot with a new one: union, drop exact duplicate
    * rows. The reference appends yesterday's transformed frame to
    * today's and relies on drop_duplicates for idempotent re-runs.
    */
  def snapshotMerge(old: DataFrame, fresh: DataFrame): DataFrame =
    old.unionByName(fresh).distinct()

  /** Upsert keeping the latest version per business key. */
  def latestPerKey(df: DataFrame, keys: Seq[String], versionOrder: Seq[Column]): DataFrame =
    rankDedup(df, keys, versionOrder)
}
