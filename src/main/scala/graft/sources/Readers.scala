package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Format readers mirroring the reference's extract surface.
  *
  * The reference converts raw API/GCS/file payloads to DataFrames per
  * source config: json / jsonl / csv with optional header, date-field
  * parsing and timezone normalization to UTC
  * (reference utils/marshalling.py convert_df; tasks/base.py
  * extract_via_fs). Spark-first: every reader is a distributed
  * `spark.read` with an explicit schema (schema inference at 100 TB is
  * a full extra scan — never rely on it in production paths).
  */
object Readers {

  /** Newline-delimited JSON (the reference's default interchange). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV with optional explicit header names
    * (reference convert_df: `names=config["header"]`). */
  def csv(spark: SparkSession, path: String, schema: StructType, hasHeader: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", hasHeader.toString).csv(path)

  /** Parquet with schema assertion: fail fast on drift instead of
    * silently nulling columns. */
  def parquet(spark: SparkSession, path: String, expected: Option[StructType] = None): DataFrame = {
    val df = spark.read.parquet(path)
    expected.foreach { s =>
      val missing = s.fields.filterNot(f => df.schema.fieldNames.contains(f.name))
      require(missing.isEmpty, s"missing columns: ${missing.map(_.name).mkString(",")}")
    }
    df
  }

  /** ORC with explicit schema (columnar alternative to parquet;
    * same pushdown/pruning properties). */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Provider class for the Avro file source: present in spark-sql
    * but not service-registered in this build, so the fully-qualified
    * name is used instead of the `avro` short name. */
  val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Avro with explicit schema — the row-oriented interchange format
    * of warehouse export/import surfaces. Partition pruning on
    * directory columns works as with any file source; Avro itself has
    * no column pruning, so prefer parquet/ORC for analytic tables and
    * Avro for row-at-a-time interchange. */
  def avro(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format(AvroProvider).load(path)

  /** Directory-of-media-files source (`binaryFile` format): each file
    * becomes one row keyed by a stable 64-bit hash of its path, with
    * the raw bytes in `media` — the ingestion front door for the
    * multimodal decode path ([[graft.multimodal.BinaryDocs]] keys on
    * `(doc_id, media)`). `glob` pushes the extension filter into the
    * FILE LISTING (non-matching files are never opened, let alone
    * read); at scale, cap per-file bytes with
    * `spark.sql.sources.binaryFile.maxLength` so one oversized blob
    * can't blow an executor, and land decoded features to parquet
    * rather than re-reading raw media per query. */
  def binaryFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"),
        xxhash64(col("path")).as("doc_id"),
        col("content").as("media"))
  }

  /** XML source (built into Spark 4): `rowTag` names the repeating
    * element that becomes a row. The odd one out of the file surface —
    * XML feeds are interchange, not analytics; land them to parquet at
    * ingest. */
  def xml(spark: SparkSession, path: String, rowTag: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).format("xml").load(path)

  /** Warehouse source over JDBC — the public-knowledge equivalent of
    * the reference's warehouse extract (reference tasks/base.py:559-594
    * `extract_via_bq`: run a query against the warehouse, get a
    * frame). Always pass `partition` in production: without it the
    * whole table streams through ONE task; with it every executor
    * reads its own slice `[lower, upper)` of the partition column in
    * parallel.
    *
    * @param partition (column, lowerBound, upperBound, numPartitions)
    */
  def jdbc(
      spark: SparkSession, url: String, table: String,
      partition: Option[(String, Long, Long, Int)] = None,
      props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val parted = partition.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c)
        .option("lowerBound", lo)
        .option("upperBound", hi)
        .option("numPartitions", n)
    }
    props.foldLeft(parted) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** Const/inline source (reference tasks/base.py extract_via_const). */
  def const(spark: SparkSession, rows: Seq[(String, Double)], cols: (String, String)): DataFrame = {
    import spark.implicits._
    rows.toDF(cols._1, cols._2)
  }

  /** Normalize a naive local-time timestamp column from `tz` to UTC
    * (reference convert_df: tz_localize + tz_convert). */
  def localToUtc(df: DataFrame, tsCol: String, tz: String): DataFrame =
    df.withColumn(tsCol, to_utc_timestamp(col(tsCol), tz))
}
