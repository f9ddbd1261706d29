package graft.config

/** Typed task configuration mirroring the reference's per-environment
  * config modules (reference configs package: SOURCES / SCHEMA /
  * DESTINATIONS dictionaries consumed by EtlTask).
  *
  * The reference keys everything off nested dicts; here the same
  * surface is case classes, so misconfigured tasks fail at compile
  * time rather than mid-run.
  */
final case class SourceConfig(
    name: String,
    sourceType: String,                  // file | gcs | bq | api | const (reference base.py extract)
    fileFormat: String = "jsonl",        // jsonl | json | csv | parquet | orc
    path: Option[String] = None,
    dateFormat: String = "yyyy-MM-dd",
    dateFields: Seq[String] = Nil,
    timezone: Option[String] = None,     // reference convert_df tz_localize
    load: Boolean = true,
    cache: Boolean = true,               // reference @check_extract_cache
    iterator: Seq[String] = Nil)         // reference paged/iterator sources

final case class DestinationConfig(
    prefix: String,
    fileFormat: String = "parquet",
    dateField: Option[String] = None,    // reference load_to_fs by-date split
    writeLatest: Boolean = false)        // reference convert_latest_file

final case class TaskConfig(
    task: String,
    stage: String,                       // raw | staging | production
    sources: Seq[SourceConfig],
    destination: DestinationConfig,
    schema: Seq[(String, String)] = Nil) // validated post-transform

object TaskConfig {
  /** The revenue task's shape from the reference
    * (reference configs/revenue.py), keyed to the synthetic tables. */
  def revenueExample(prefix: String): TaskConfig = TaskConfig(
    task = "revenue",
    stage = "staging",
    sources = Seq(
      SourceConfig("orders", "file", fileFormat = "parquet", path = Some("orders.parquet"),
        dateFields = Seq("o_orderdate")),
      SourceConfig("rates", "const", load = false)),
    destination = DestinationConfig(prefix, dateField = Some("o_orderdate"), writeLatest = true),
    schema = Seq("o_orderkey" -> "bigint", "o_totalprice" -> "double"))

  /** The adjust task's shape from the reference (reference
    * configs/adjust.py consumed by tasks/adjust.py): one trackers
    * feed in, execution_date stamped by
    * [[graft.operators.Adjust.stampExecutionDate]], written with a
    * latest snapshot. Keyed to the synthetic nation table as the
    * trackers dim stand-in. */
  def adjustExample(prefix: String): TaskConfig = TaskConfig(
    task = "adjust",
    stage = "staging",
    sources = Seq(
      SourceConfig("adjust_trackers", "file", fileFormat = "parquet",
        path = Some("nation.parquet"))),
    destination = DestinationConfig(prefix, dateField = Some("execution_date"),
      writeLatest = true),
    schema = Seq("n_nationkey" -> "int", "execution_date" -> "timestamp"))
}
