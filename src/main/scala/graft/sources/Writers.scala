package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Date-partitioned sinks mirroring the reference's load surface.
  *
  * The reference writes one file per (stage, task, source, date) plus
  * a `latest` snapshot copy (reference tasks/base.py load_to_fs,
  * convert_latest_file, get_filepath's
  * `{prefix}{stage}-{task}-{source}/{filename}` layout).
  *
  * Spark-first: `partitionBy(dateCol)` writes all dates in ONE
  * distributed pass (the reference loops over dates driver-side);
  * downstream readers get partition pruning for free.
  */
object Writers {

  def pathFor(prefix: String, stage: String, task: String, source: String): String =
    s"$prefix/$stage-$task-$source"

  /** Write parquet partitioned by a date column. */
  def datePartitionedParquet(
      df: DataFrame, prefix: String, stage: String, task: String, source: String,
      dateCol: String): Unit =
    df.withColumn("__date", to_date(col(dateCol)).cast("string"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__date")
      .parquet(pathFor(prefix, stage, task, source))

  /** Write newline-delimited JSON partitioned by date
    * (the reference's jsonl destination format). */
  def datePartitionedJsonl(
      df: DataFrame, prefix: String, stage: String, task: String, source: String,
      dateCol: String): Unit =
    df.withColumn("__date", to_date(col(dateCol)).cast("string"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__date")
      .json(pathFor(prefix, stage, task, source))

  /** CSV single-directory sink. */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** ORC date-partitioned sink (columnar alternative; same pruning
    * properties as parquet on the read side). */
  def datePartitionedOrc(
      df: DataFrame, prefix: String, stage: String, task: String, source: String,
      dateCol: String): Unit =
    df.withColumn("__date", to_date(col(dateCol)).cast("string"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__date")
      .orc(pathFor(prefix, stage, task, source))

  /** Avro date-partitioned sink (row-oriented interchange; the
    * export format warehouse load surfaces consume). */
  def datePartitionedAvro(
      df: DataFrame, prefix: String, stage: String, task: String, source: String,
      dateCol: String): Unit =
    df.withColumn("__date", to_date(col(dateCol)).cast("string"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__date")
      .format(Readers.AvroProvider)
      .save(pathFor(prefix, stage, task, source))

  /** Daily-cleanup + reload as ONE dynamic partition overwrite:
    * the reference deletes the execution date's rows then re-appends
    * (reference sql/cleanup_generic.sql + tasks/bigquery.py
    * daily_cleanup/run_query). With partitionOverwriteMode=dynamic
    * only the partitions present in `df` are replaced; other dates are
    * untouched. Idempotent daily re-runs, no delete scan. */
  def overwriteDatePartitions(
      df: DataFrame, prefix: String, stage: String, task: String, source: String,
      dateCol: String): Unit =
    df.withColumn("__date", to_date(col(dateCol)).cast("string"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__date")
      .parquet(pathFor(prefix, stage, task, source))

  /** MERGE-style upsert into a date-partitioned parquet table
    * (reference tasks/revenue.py do_updates_inserts at the storage
    * layer): existing rows for incoming keys are replaced, new keys
    * appended, and ONLY the date partitions present in the incoming
    * frame are rewritten (dynamic partition overwrite) — untouched
    * dates are never read or written. The incoming frame wins ties.
    *
    * Reads the CURRENT rows of the affected partitions only (partition
    * pruning via the date filter), anti-joins out updated keys, unions
    * the incoming rows, rewrites those partitions. Scale cost is
    * proportional to the affected partitions, not the table.
    *
    * Durability: the merged frame is STAGED to a sibling temp prefix
    * as a complete, committed parquet write BEFORE the target is
    * touched. Any failure while computing or staging the merge leaves
    * the target byte-identical; only after the staged write commits is
    * the target overwritten — from a re-read of durable staged files,
    * never from recomputable lineage over the partitions being
    * truncated (a `localCheckpoint` here would lose data if an
    * executor died mid-overwrite on a real cluster).
    */
  /** Durable stage-to-temp-and-swap write, the ONE implementation of
    * the sequence every self-overwriting writer needs (upsert,
    * compaction): write the frame as a complete committed parquet
    * under `<path>.staging` (clearing any leftover from a previous
    * failed run), then overwrite the target FROM A RE-READ of the
    * staged files — never from recomputable lineage over the
    * partitions being replaced — then drop staging. A failure at any
    * point leaves the target either byte-identical or fully
    * rewritten, never half-truncated. With `partitionCol` set the
    * final write is a dynamic partition overwrite (untouched
    * partitions are never written); the caller must have CAST the
    * partition column to a canonical string so the staged directory
    * names are byte-identical to the target's (a re-inferred value
    * like date 2024-1-5 → 2024-01-05 would land in a NEW directory
    * and leave the old one alive — duplicated rows). */
  private[sources] def stageAndSwap(
      df: DataFrame, path: String, partitionCol: Option[String]): Unit = {
    val spark = df.sparkSession
    val staging = path + ".staging"
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val fs = stagingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stagingPath, true)
    val w0 = df.write.mode(SaveMode.Overwrite)
    partitionCol.fold(w0)(c => w0.partitionBy(c)).parquet(staging)
    val back = spark.read.parquet(staging)
    val w1 = back.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
    partitionCol.fold(w1)(c => w1.partitionBy(c)).parquet(path)
    fs.delete(stagingPath, true)
  }

  def upsertDatePartitions(
      df: DataFrame, prefix: String, stage: String, task: String, source: String,
      dateCol: String, keys: Seq[String]): Unit = {
    val path = pathFor(prefix, stage, task, source)
    val spark = df.sparkSession
    val incoming = df.withColumn("__date", to_date(col(dateCol)).cast("string"))
    if (scala.util.Try(spark.read.parquet(path).schema).isSuccess) {
      val existing = spark.read.parquet(path)
      val affectedDates = incoming.select(col("__date")).distinct()
      val kept = existing
        .join(broadcast(affectedDates), Seq("__date"), "left_semi") // prune to affected partitions
        .join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti") // drop updated keys
      stageAndSwap(kept.unionByName(incoming), path, Some("__date"))
    } else {
      incoming.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__date")
        .parquet(path)
    }
  }

  /** Bucketed table for co-located joins: repeated joins/aggs on the
    * bucket keys skip their shuffle entirely. The 100 TB layout tool:
    * bucket fact tables by join key at write time, pay the shuffle
    * once. */
  def bucketedTable(df: DataFrame, table: String, keys: Seq[String], numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head)
      .format("parquet")
      .saveAsTable(table)

  /** Path of the `latest` snapshot: a SIBLING of the dated table
    * (reference convert_latest_file writes latest.{ext} beside the
    * dated files) — nesting it under the partitioned table root would
    * corrupt whole-table reads with a conflicting directory layout. */
  def latestPath(prefix: String, stage: String, task: String, source: String): String =
    pathFor(prefix, stage, task, source) + "-latest"

  /** `latest` snapshot for a KNOWN date: overwrite a stable path with
    * that date's rows. Single scan — prefer this overload when the
    * orchestrator already knows the as-of date. */
  def writeLatest(
      df: DataFrame, prefix: String, stage: String, task: String, source: String,
      dateCol: String, date: String): Unit =
    df.filter(to_date(col(dateCol)) === lit(date))
      .write.mode(SaveMode.Overwrite)
      .parquet(latestPath(prefix, stage, task, source))

  /** `latest` snapshot, max date derived from the data. The max-date
    * probe and the filtered write both read `df`, so it is persisted
    * across the two passes instead of recomputing its whole lineage. */
  def writeLatest(
      df: DataFrame, prefix: String, stage: String, task: String, source: String,
      dateCol: String): Unit = {
    val cached = df.persist()
    try {
      // max over zero rows is null: an empty (but valid) extract still
      // gets a `latest` snapshot — an empty one — instead of an NPE
      val maxDate = Option(cached.agg(max(to_date(col(dateCol)))).head.getDate(0))
      maxDate match {
        case Some(d) => writeLatest(cached, prefix, stage, task, source, dateCol, d.toString)
        case None =>
          cached.write.mode(SaveMode.Overwrite)
            .parquet(latestPath(prefix, stage, task, source))
      }
    } finally cached.unpersist()
  }
}
