package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.config.SourceConfig

/** Config-driven extract dispatch (reference tasks/base.py:609-630
  * `EtlTask.extract`: route each source config to
  * extract_via_fs / extract_via_api / extract_via_bq, then normalize
  * timezones). This is the piece that turns a [[SourceConfig]] into a
  * DataFrame — one place where sourceType, format, cache flag, paging
  * iterators and timezone localization all take effect.
  */
object Extract {

  /** @param baseDir directory for file-type sources (cfg.path is
    *                resolved under it)
    * @param rawDir  raw-cache directory for api-type sources
    * @param fetcher transport for api-type sources (None for others)
    */
  def apply(
      spark: SparkSession,
      cfg: SourceConfig,
      schema: StructType,
      baseDir: String = "",
      rawDir: String = "",
      fetcher: Option[ApiSource.Fetcher] = None): DataFrame = {
    val df = cfg.sourceType match {
      case "file" =>
        val path = Paths.get(baseDir, cfg.path.getOrElse(cfg.name)).toString
        cfg.fileFormat match {
          case "parquet"        => Readers.parquet(spark, path, Some(schema))
          case "csv"            => Readers.csv(spark, path, schema)
          case "json" | "jsonl" => Readers.jsonl(spark, path, schema)
          case "orc"            => Readers.orc(spark, path, schema)
          case other            => sys.error(s"unsupported file format: $other")
        }
      case "api" =>
        val f = fetcher.getOrElse(sys.error(s"api source ${cfg.name} needs a fetcher"))
        if (!cfg.cache) {
          // cache disabled: drop exactly this source's cache directory
          // so the fetch re-runs (reference runs the undecorated
          // extract); sibling sources sharing rawDir are untouched
          val dir = ApiSource.sourceDir(rawDir, cfg.name)
          if (Files.isDirectory(dir)) {
            val it = Files.list(dir).iterator()
            while (it.hasNext) Files.delete(it.next())
            Files.delete(dir)
          }
        }
        val iterators = if (cfg.iterator.nonEmpty) cfg.iterator else Seq("")
        ApiSource.extract(spark, cfg.name, schema, f, rawDir, iterators)._1
      case "jdbc" | "warehouse" =>
        Readers.jdbc(spark, cfg.path.getOrElse(sys.error("jdbc source needs url in path")), cfg.name)
      case other =>
        sys.error(s"unsupported sourceType: $other")
    }
    // reference convert_df tz_localize: normalize naive local
    // timestamps to UTC per config
    cfg.timezone.fold(df)(tz =>
      cfg.dateFields.foldLeft(df)((d, f) => Readers.localToUtc(d, f, tz)))
  }
}
