package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ARRAY<STRUCT<key,value>> normalization — the reference ships these
  * as BigQuery JavaScript UDFs; here they are higher-order `transform`
  * expressions, so they run inside whole-stage codegen instead of a JS
  * sandbox per row.
  */
object KvArrays {

  /** Normalize a settings kv-array: lowercase keys and values, null
    * value → "" (reference udf_js/cleanup_settings.sql; null array
    * stays null, like the JS early-return). */
  def cleanupSettings(settings: Column): Column =
    transform(settings, s => struct(
      lower(s.getField("key")).as("key"),
      lower(coalesce(s.getField("value"), lit(""))).as("value")))

  /** Normalize an event-extra kv-array with the reference's per-key
    * data patches: negative session_time clamps to "0", url_counts is
    * off-by-one corrected (reference udf_js/cleanup_extra.sql). */
  def cleanupExtra(extra: Column): Column =
    transform(extra, e => {
      val k = lower(e.getField("key"))
      val v = lower(coalesce(e.getField("value"), lit("")))
      val patched = when(k === "session_time" && v.cast("long") < 0, lit("0"))
        .when(k === "url_counts", (v.cast("long") + 1).cast("string"))
        .otherwise(v)
      struct(k.as("key"), patched.as("value"))
    })

  /** All capture-group tuples of `regex` over a string column
    * (reference utils/regex.py find_all_groups): one struct
    * (g1..gN) per match, as an array column. */
  def findAllGroups(s: Column, regex: String, groups: Int): Column =
    transform(regexp_extract_all(s, lit(regex), lit(0)),
      m => struct((1 to groups).map(g => regexp_extract(m, regex, g).as(s"g$g")): _*))
}
