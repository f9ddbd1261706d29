package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column anonymization (reference utils/anonymizer.py: replaces ids,
  * IPs and monetary values in datasets before they leave production).
  *
  * The reference anonymizes driver-side with `random`; here masking is
  * DETERMINISTIC (hash-derived) so anonymized datasets are
  * reproducible and joins on masked keys still line up across tables —
  * the property that matters when anonymizing 100 TB once and sharing
  * it.
  */
object Anonymize {

  /** Irreversible stable pseudonym for an id column. */
  def hashId(c: Column): Column = sha2(c.cast("string"), 256)

  /** Mask an IPv4 address: keep the /16 prefix, zero the host part
    * (reference anonymizer "ip" type). */
  def maskIp(c: Column): Column =
    regexp_replace(c, "^(\\d+\\.\\d+)\\.\\d+\\.\\d+$", "$1.0.0")

  /** Deterministic perturbation of a numeric column: ±scale% jitter
    * derived from an md5 of the row key (reference anonymizer
    * float/int randomization, made reproducible). md5+ascii rather
    * than Murmur3 so the derivation is engine-portable. */
  def perturb(value: Column, key: Column, scale: Double = 0.1): Column = {
    val h = md5(key.cast("string"))
    val units = (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 1000
    val jitter = (units / 1000.0 - 0.5) * 2 * scale
    round(value * (lit(1.0) + jitter), 6)
  }

  /** Bucket a value into a coarse band (k-anonymity style). */
  def band(value: Column, width: Double): Column =
    (floor(value / width) * width).cast("double")

  /** Config-driven NESTED anonymization (reference
    * utils/anonymizer.py:101-233 anonymize_data + extract_elem: walk
    * parsed JSON and replace the values at configured dotted paths).
    *
    * Spark-first: the JSON string is parsed ONCE against a declared
    * schema, every configured path is rewritten in place with
    * `Column.withField` (native nested-struct update — supports
    * `a.b.c` paths and stays inside codegen; no UDF, no re-parse per
    * path), then serialized back. Values are replaced with the
    * deterministic [[hashId]] pseudonym rather than the reference's
    * `random` so repeated runs and cross-table joins agree.
    *
    * @param paths dotted struct paths to anonymize, e.g.
    *              `Seq("user.id", "device.ip")`
    */
  def nestedJson(
      json: Column,
      schema: org.apache.spark.sql.types.DataType,
      paths: Seq[String]): Column = {
    val parsed = from_json(json, schema)
    val masked = paths.foldLeft(parsed) { (c, p) =>
      val current = p.split('.').foldLeft(c)((acc, f) => acc.getField(f))
      c.withField(p, hashId(current))
    }
    to_json(masked)
  }
}
