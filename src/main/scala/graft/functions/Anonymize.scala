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
}
