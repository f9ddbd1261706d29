package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** View-style task (reference tasks/bigquery.py:351-369 `BqViewTask`:
  * publish a query as a view instead of materializing a table).
  *
  * Spark-first this is one line — a temp view over a lazy DataFrame is
  * exactly a non-materialized query: downstream SQL referencing the
  * view inlines its plan, so Catalyst optimizes through the boundary
  * (filter pushdown into the view's scan, column pruning of unused
  * view columns) the way BigQuery does for its views.
  */
object Views {

  /** Publish a frame as a (session-scoped) view. */
  def publish(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Publish a SQL query as a view (the BqViewTask shape: view body is
    * SQL over already-registered tables/views). */
  def publishSql(spark: SparkSession, name: String, sql: String): Unit =
    spark.sql(sql).createOrReplaceTempView(name)
}
