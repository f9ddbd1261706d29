package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.config.TaskConfig
import graft.sources.{ApiSource, Extract, Readers, Writers}

/** A [[GraftTask]] driven entirely by a [[TaskConfig]] — the closed
  * loop of the reference's design, where the per-environment config
  * dicts are the ONLY thing that differs between tasks
  * (reference tasks/base.py EtlTask consuming the configs package:
  * sources are extracted per SourceConfig, transforms applied by
  * name, the result written per DestinationConfig).
  *
  * Construction is cheap and lazy: extraction plans are built when the
  * task runs, so one config can be validated, dry-run ('e'/'t' steps)
  * or fully loaded ('l') like the reference's step argument.
  *
  * @param schemas   per-source explicit read schema (schema inference
  *                  at scale is an extra full scan — always declared)
  * @param fetchers  transports for api-type sources
  * @param constRows inline rows for const-type sources
  */
final class ConfiguredTask(
    val spark: SparkSession,
    cfg: TaskConfig,
    baseDir: String,
    rawDir: String = "",
    schemas: Map[String, StructType] = Map.empty,
    fetchers: Map[String, ApiSource.Fetcher] = Map.empty,
    constRows: Map[String, (Seq[(String, Double)], (String, String))] = Map.empty,
    override val transforms: Map[String, DataFrame => DataFrame] = Map.empty)
    extends GraftTask {

  override def schema: Seq[(String, String)] = cfg.schema

  /** The declared schema gates only LOADED sources; auxiliary
    * (load=false) lookup/const inputs pass through unvalidated, like
    * the reference's per-destination validation. */
  override def schemaFor(source: String): Seq[(String, String)] =
    if (cfg.sources.find(_.name == source).forall(_.load)) cfg.schema else Nil

  def sources: Map[String, () => DataFrame] =
    cfg.sources.map { sc =>
      sc.name -> (() =>
        sc.sourceType match {
          case "const" =>
            val (rows, cols) = constRows.getOrElse(sc.name,
              sys.error(s"const source ${sc.name} needs rows"))
            Readers.const(spark, rows, cols)
          case _ =>
            Extract(spark, sc,
              schemas.getOrElse(sc.name, sys.error(s"source ${sc.name} needs a schema")),
              baseDir, rawDir, fetchers.get(sc.name))
        })
    }.toMap

  def load(source: String, df: DataFrame): Unit = {
    val d = cfg.destination
    // sources flagged load=false are extract-only (reference const/
    // lookup sources feed transforms but are never written)
    if (cfg.sources.find(_.name == source).forall(_.load)) {
      d.dateField match {
        case Some(dateCol) =>
          Writers.overwriteDatePartitions(df, d.prefix, cfg.stage, cfg.task, source, dateCol)
          if (d.writeLatest)
            Writers.writeLatest(df, d.prefix, cfg.stage, cfg.task, source, dateCol)
        case None =>
          df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(Writers.pathFor(d.prefix, cfg.stage, cfg.task, source))
      }
    }
  }
}
