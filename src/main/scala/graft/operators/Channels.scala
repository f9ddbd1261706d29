package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User acquisition-channel attribution.
  *
  * Re-expresses reference sql/mango_user_channels.sql: a per-user
  * settings frame (tracker token) is matched against a channel
  * dimension on ANY of the four token levels (network / campaign /
  * adgroup / creative), unmatched users get a NULL branch, IFNULL
  * defaults are applied, and a rank-over-creative dedup keeps one
  * attribution row per user.
  *
  * Spark-first shape: the reference emits five near-identical UNION
  * ALL branches; here the four token-level joins are generated from a
  * list, each a broadcast hash join (the channel dim is small by
  * construction), and the dedup is a single row_number window over
  * user_id.
  */
object Channels {

  val tokenLevels: Seq[String] =
    Seq("network_token", "campaign_token", "adgroup_token", "creative_token")

  /** @param settings one row per user: (user col, `tracker_token`)
    * @param channels dim with the four *_token and *_name columns
    */
  def attribute(settings: DataFrame, channels: DataFrame, userCol: String): DataFrame = {
    val chanCols = channels.columns
    val matched = tokenLevels.map { lvl =>
      settings.join(broadcast(channels), settings("tracker_token") === channels(lvl))
        .select(col(userCol) +: col("tracker_token") +: chanCols.map(channels(_)): _*)
    }.reduce(_ unionByName _)
    val unmatched = settings
      .filter(col("tracker_token").isNull)
      .select(col(userCol) +: col("tracker_token") +: chanCols.map(c => lit(null).cast("string").as(c)): _*)

    val all = matched.unionByName(unmatched)
    val named = all.select(
      col(userCol),
      col("tracker_token"),
      coalesce(col("network_name"), lit("unknown")).as("network_name"),
      coalesce(col("network_token"), lit("0")).as("network_token"),
      coalesce(col("campaign_name"), lit("unknown")).as("campaign_name"),
      coalesce(col("campaign_token"), lit("0")).as("campaign_token"),
      coalesce(col("adgroup_name"), lit("unknown")).as("adgroup_name"),
      coalesce(col("adgroup_token"), lit("0")).as("adgroup_token"),
      coalesce(col("creative_name"), lit("unknown")).as("creative_name"),
      coalesce(col("creative_token"), lit("0")).as("creative_token"))
    // dedup creative level (reference mango_user_channels.sql:118-121)
    Dedup.rankDedup(named, Seq(userCol),
      Seq(col("creative_token").asc, col("network_token").asc))
  }
}
