package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CASE-chain dimension mappings.
  *
  * The reference ships these as persistent BigQuery SQL UDFs
  * (reference udf/map_markets.sql, udf/map_channels.sql,
  * udf/map_verticals.sql, udf/match_target_countries.sql). Here they
  * are `Column -> Column` functions built from `when/otherwise`
  * chains, so they stay inside whole-stage codegen and are constant-
  * foldable by Catalyst.
  */
object Mappings {

  /** Market grouping for a nation/country dimension.
    * Mirrors udf/map_markets.sql's shape (named groups, Unknown for
    * null, Others fallback) over the synthetic nation names.
    */
  def market(nation: Column): Column =
    when(nation.isNull, "Unknown")
      .when(nation.isin("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"), "APAC")
      .when(nation.isin("NATION_6", "NATION_7", "NATION_8", "NATION_9", "NATION_10"), "EMEA")
      .when(nation.isin("NATION_11", "NATION_12", "NATION_13", "NATION_14", "NATION_15"), "AMER")
      .when(nation.isin("NATION_16", "NATION_17", "NATION_18", "NATION_19", "NATION_20"), "AFRICA")
      .otherwise("Others")

  /** Channel grouping for an acquisition/event channel.
    * Mirrors udf/map_channels.sql's Earned/Owned/Paid grouping shape.
    */
  def channel(name: Column): Column =
    when(name.isNull, "Unknown")
      .when(name.isin("signup", "view"), "Organic")
      .when(name.isin("click", "purchase"), "Paid")
      .when(name.isin("error"), "Diagnostic")
      .otherwise("Others")

  /** Target-market membership test (udf/match_target_countries.sql). */
  def isTargetMarket(nation: Column): Column =
    nation.isin("CHINA", "INDIA", "INDONESIA", "JAPAN", "VIETNAM", "FRANCE", "GERMANY")

  /** Dashboard sort rank for channel groups
    * (reference udf/order_channels.sql shape: known groups first,
    * Unknown=99, Others=100, else 9999). */
  def channelOrder(channel: Column): Column =
    when(channel === "Overall", 0)
      .when(channel === "Organic", 1)
      .when(channel === "Paid", 2)
      .when(channel === "Diagnostic", 3)
      .when(channel === "Unknown", 99)
      .when(channel === "Others", 100)
      .otherwise(9999).cast("int")

  /** Dashboard sort rank for markets (reference udf/order_markets.sql). */
  def marketOrder(market: Column): Column =
    when(market === "Overall", 0)
      .when(market === "APAC", 1)
      .when(market === "EMEA", 2)
      .when(market === "AMER", 3)
      .when(market === "AFRICA", 4)
      .when(market === "Unknown", 99)
      .when(market === "Others", 100)
      .otherwise(9999).cast("int")

  /** Country → principal UTC offset string, mirroring the reference's
    * get_country_tz_str (reference utils/marshalling.py:253-351: most-
    * common zone per country, rendered as ±HH:MM). */
  def countryTzOffset(country: Column): Column =
    when(country.isNull, "+00:00")
      .when(country === "ID", "+07:00")
      .when(country === "IN", "+05:30")
      .when(country.isin("TW", "HK", "SG", "MY", "PH", "CN"), "+08:00")
      .when(country === "TH", "+07:00")
      .when(country === "VN", "+07:00")
      .when(country === "BD", "+06:00")
      .when(country === "MM", "+06:30")
      .when(country.isin("KH", "LA"), "+07:00")
      .when(country === "BN", "+08:00")
      .when(country === "DE", "+01:00")
      .when(country === "US", "-05:00")
      .otherwise("+00:00")
}
