package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot join keys.
  *
  * AQE's skew-join split handles most runtime skew; explicit salting
  * remains the tool when one side has a pathologically hot key and the
  * other side is small enough to replicate: the big side scatters each
  * key over `salt` sub-partitions, the small side is replicated
  * `salt`-ways, so a hot key's rows land on `salt` reducers instead of
  * one.
  */
object Skew {

  /** Inner join big (skewed) with small on `keys`, scattering the big
    * side uniformly over `salt` sub-keys. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(abs(hash(monotonically_increasing_id())), lit(salt)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }
}
