package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-JSON event extraction.
  *
  * The reference parses a JSON array of events out of a string column
  * with a JavaScript UDF (reference udf_js/json_extract_events.sql:
  * `JSON.parse` + per-element struct building) and flattens nested
  * arrays driver-side (reference utils/marshalling.py json_unnest).
  * Spark-first re-expression: `from_json` with an explicit array-of-
  * struct schema + `explode` — fully codegen'd, no JS engine, no
  * driver loop, and the schema is declared rather than inferred.
  */
object JsonEvents {

  /** Parse a JSON-array string column into rows of typed structs.
    * @param schema element struct type of the array
    */
  def jsonArrayToRows(df: DataFrame, jsonCol: String, schema: StructType, as: String = "e"): DataFrame =
    df.withColumn(as, explode(from_json(col(jsonCol), ArrayType(schema))))

  /** Typed lookup into a parsed event struct. */
  def field(eventCol: String, name: String): Column = col(s"$eventCol.$name")
}
