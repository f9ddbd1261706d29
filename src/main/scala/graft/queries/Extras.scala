package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.functions.JsonEvents

/** Additional operator coverage: nested-JSON unnest and sketch
  * aggregates. */
object Extras {

  /** #48 nested JSON array → rows (reference
    * udf_js/json_extract_events.sql + utils/marshalling.py
    * json_unnest): a JSON-array string column is parsed with an
    * explicit schema and exploded to typed rows. The array is built
    * in-query from `props` so the parse path is exercised end-to-end. */
  def jsonUnnest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("k0", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("arr",
        concat(lit("["), col("props"), lit(",{\"k\": "), col("k0") + 1, lit("}]")))
    JsonEvents.jsonArrayToRows(e, "arr", StructType(Seq(StructField("k", LongType))))
      .select(col("event_id"), JsonEvents.field("e", "k").as("k"))
  }

  /** #49 sketch aggregates: HLL distinct + approximate percentile
    * (TypedImperativeAggregate machinery; rows-only check — sketch
    * estimates are engine-specific by construction, so no cross-engine
    * oracle). */
  def approxSketch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_approx"),
        count(lit(1)).as("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_unnest"   -> jsonUnnest _,
    "q_approx_sketch" -> approxSketch _
  )

  /** q_approx_sketch intentionally has no oracle (rows-only check). */
  val oracles: Map[String, String] = Map(
    "q_json_unnest" ->
      """WITH j AS (
        |  SELECT event_id,
        |    '[' || props || ',{"k": ' ||
        |      (CAST(json_extract_string(props, '$.k') AS BIGINT) + 1) || '}]' AS arr
        |  FROM events),
        |u AS (SELECT event_id, unnest(json_transform(arr, '[{"k":"BIGINT"}]')) AS e FROM j)
        |SELECT event_id, e.k AS k FROM u""".stripMargin
  )
}
