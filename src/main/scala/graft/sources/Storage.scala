package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Filesystem-vs-object-store path abstraction (reference
  * tasks/base.py:387-449 `extract_via_gcs` / :823-877 `load_to_gcs`:
  * the same task reads/writes either a local path or a cloud bucket
  * depending on the configured prefix).
  *
  * Spark-first: object-store IO IS path IO — every `spark.read`/
  * `write` goes through the Hadoop FileSystem API, so a remote store
  * is just a URI scheme (`gs://bucket/...`, `s3a://bucket/...`) plus
  * connector configuration on the session; no separate client code
  * path, and the read stays fully distributed (each executor fetches
  * its own object ranges). This object centralizes prefix resolution
  * and the connector settings that matter at scale.
  */
object Storage {

  /** True when the prefix addresses a remote object store. */
  def isRemote(prefix: String): Boolean = {
    val scheme = java.net.URI.create(prefix).getScheme
    scheme != null && scheme != "file"
  }

  /** Resolve the reference's `{prefix}{stage}-{task}-{source}` layout
    * against either a local directory or a remote bucket prefix. */
  def resolve(prefix: String, stage: String, task: String, source: String): String =
    s"${prefix.stripSuffix("/")}/$stage-$task-$source"

  /** Object-store tuning that matters at scale, applied per session:
    * object stores have no cheap rename, so commit with the
    * Hadoop v2 / manifest-style algorithm instead of rename-based v1,
    * and avoid _SUCCESS marker churn on huge jobs. (Settings are
    * public Hadoop/Spark configuration, connector jars provisioned by
    * the cluster image.) */
  def configureForObjectStore(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    conf.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", false)
  }

  /** Read parquet from any prefix (local or remote) — one distributed
    * scan either way. */
  def readParquet(spark: SparkSession, prefix: String, stage: String, task: String,
      source: String): DataFrame =
    spark.read.parquet(resolve(prefix, stage, task, source))

  /** Write parquet to any prefix; applies object-store committer
    * settings when the target is remote. */
  def writeParquet(df: DataFrame, prefix: String, stage: String, task: String,
      source: String, dateCol: String): Unit = {
    if (isRemote(prefix)) configureForObjectStore(df.sparkSession)
    Writers.datePartitionedParquet(df, prefix, stage, task, source, dateCol)
  }
}
