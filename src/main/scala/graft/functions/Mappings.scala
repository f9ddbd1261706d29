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

  /** Vertical grouping for a cohort name
    * (reference udf/map_verticals.sql shape: named verticals plus
    * feature→vertical rollups, unmatched → empty string). */
  def vertical(cohortName: Column): Column =
    when(cohortName === "Browser", "vertical: browser")
      .when(cohortName === "Shopping", "vertical: shopping")
      .when(cohortName === "Game", "vertical: game")
      .when(cohortName === "feature: purchase_large", "shopping: large purchases")
      .when(cohortName === "feature: purchase_small", "shopping: small purchases")
      .when(cohortName === "feature: view", "vertical: browser")
      .otherwise("")

  /** Vertical membership test (udf/match_verticals.sql: cohort level
    * AND name both in the vertical set). */
  def isVertical(cohortLevel: Column, cohortName: Column): Column =
    cohortLevel.isin("Vertical", "Feature") &&
      cohortName.isin("Browser", "Shopping", "Game",
        "feature: purchase_large", "feature: purchase_small", "feature: view")

  /** Attribution-level sort rank
    * (udf/order_channel_levels.sql: appstore < network < campaign <
    * adgroup < creative). */
  def channelLevelOrder(level: Column): Column =
    when(level === "appstore", 0)
      .when(level === "network", 1)
      .when(level === "campaign", 2)
      .when(level === "adgroup", 3)
      .when(level === "creative", 4)
      .otherwise(9999).cast("int")

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

  /** Dashboard sort rank for verticals (reference
    * udf/order_verticals.sql: top-level verticals 1-5, feature-level
    * rollups 11-15, else 9999) — completes the map/match/order triple
    * of the verticals family. */
  def verticalOrder(feature: Column): Column =
    when(feature === "vertical: browser", 1)
      .when(feature === "vertical: shopping", 2)
      .when(feature === "vertical: game", 3)
      .when(feature === "vertical: lifestyle", 4)
      .when(feature === "vertical: travel", 5)
      .when(feature === "shopping: shopping tab_swipe", 11)
      .when(feature === "shopping: shopping content_tab", 12)
      .when(feature === "game: game content_tab", 13)
      .when(feature === "lifestyle: lifestyle content_tab", 14)
      .when(feature === "travel: travel content_tab", 15)
      .otherwise(9999).cast("int")

  /** Dashboard sort KEY for target countries (reference
    * udf/order_target_countries.sql). Unlike the integer ranks this
    * family sorts by STRING: synthetic rows first ('!!' Overall, '00'
    * Target Markets), the target-market ISO codes in dashboard order
    * ('01'-'14'), Others at '999', null/empty last ('~'), and any
    * other country sorted by its own code. */
  def targetCountryOrder(country: Column): Column =
    when(country === "Overall", "!!")
      .when(country === "Target Markets", "00")
      .when(country === "IN", "01")
      .when(country === "ID", "02")
      .when(country === "TW", "03")
      .when(country === "HK", "04")
      .when(country === "SG", "05")
      .when(country === "PH", "06")
      .when(country === "VN", "07")
      .when(country === "TH", "08")
      .when(country === "MY", "09")
      .when(country === "BD", "10")
      .when(country === "MM", "11")
      .when(country === "KH", "12")
      .when(country === "LA", "13")
      .when(country === "BN", "14")
      .when(country === "Others", "999")
      .when(country.isNull || country === "", "~")
      .otherwise(country)

  /** Target-country membership test (reference
    * udf/match_target_countries.sql: the 14 target-market ISO codes). */
  def isTargetCountry(country: Column): Column =
    country.isin("IN", "ID", "TW", "HK", "SG", "PH", "VN",
      "TH", "MY", "BD", "MM", "KH", "LA", "BN")

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

  /** Complete ISO-3166 alpha-2 → principal UTC offset table,
    * mirroring the reference's pytz-backed mapping (reference
    * utils/marshalling.py:200-276 get_country_tz/get_country_tz_str:
    * pytz.country_timezones, most-common zone per country, rendered
    * ±HH:MM; the XK→CET workaround included). Offsets are the zones'
    * STANDARD offsets — deterministic, where the reference's
    * `utcoffset(now)` flips with DST at run time. Derived from public
    * tzdb zone data. */
  private val CountryTzTable: Map[String, String] = Map(
    // Europe — CET block
    "AD" -> "+01:00", "AL" -> "+01:00", "AT" -> "+01:00", "BA" -> "+01:00",
    "BE" -> "+01:00", "CH" -> "+01:00", "CZ" -> "+01:00", "DE" -> "+01:00",
    "DK" -> "+01:00", "ES" -> "+01:00", "FR" -> "+01:00", "GI" -> "+01:00",
    "HR" -> "+01:00", "HU" -> "+01:00", "IT" -> "+01:00", "LI" -> "+01:00",
    "LU" -> "+01:00", "MC" -> "+01:00", "ME" -> "+01:00", "MK" -> "+01:00",
    "MT" -> "+01:00", "NL" -> "+01:00", "NO" -> "+01:00", "PL" -> "+01:00",
    "RS" -> "+01:00", "SE" -> "+01:00", "SI" -> "+01:00", "SJ" -> "+01:00",
    "SK" -> "+01:00", "SM" -> "+01:00", "VA" -> "+01:00", "XK" -> "+01:00",
    // Europe — western / eastern
    "GB" -> "+00:00", "IE" -> "+00:00", "IS" -> "+00:00", "PT" -> "+00:00",
    "FO" -> "+00:00", "GG" -> "+00:00", "IM" -> "+00:00", "JE" -> "+00:00",
    "AX" -> "+02:00", "BG" -> "+02:00", "CY" -> "+02:00", "EE" -> "+02:00",
    "FI" -> "+02:00", "GR" -> "+02:00", "LT" -> "+02:00", "LV" -> "+02:00",
    "MD" -> "+02:00", "RO" -> "+02:00", "UA" -> "+02:00",
    "BY" -> "+03:00", "RU" -> "+03:00", "TR" -> "+03:00",
    // Americas
    "AG" -> "-04:00", "AI" -> "-04:00", "AR" -> "-03:00", "AW" -> "-04:00",
    "BB" -> "-04:00", "BL" -> "-04:00", "BM" -> "-04:00", "BO" -> "-04:00",
    "BQ" -> "-04:00", "BR" -> "-03:00", "BS" -> "-05:00", "BZ" -> "-06:00",
    "CA" -> "-05:00", "CL" -> "-04:00", "CO" -> "-05:00", "CR" -> "-06:00",
    "CU" -> "-05:00", "CW" -> "-04:00", "DM" -> "-04:00", "DO" -> "-04:00",
    "EC" -> "-05:00", "FK" -> "-03:00", "GD" -> "-04:00", "GF" -> "-03:00",
    "GL" -> "-03:00", "GP" -> "-04:00", "GT" -> "-06:00", "GY" -> "-04:00",
    "HN" -> "-06:00", "HT" -> "-05:00", "JM" -> "-05:00", "KN" -> "-04:00",
    "KY" -> "-05:00", "LC" -> "-04:00", "MF" -> "-04:00", "MQ" -> "-04:00",
    "MS" -> "-04:00", "MX" -> "-06:00", "NI" -> "-06:00", "PA" -> "-05:00",
    "PE" -> "-05:00", "PM" -> "-03:00", "PR" -> "-04:00", "PY" -> "-03:00",
    "SR" -> "-03:00", "SV" -> "-06:00", "SX" -> "-04:00", "TC" -> "-05:00",
    "TT" -> "-04:00", "US" -> "-05:00", "UY" -> "-03:00", "VC" -> "-04:00",
    "VE" -> "-04:00", "VG" -> "-04:00", "VI" -> "-04:00",
    // Africa
    "AO" -> "+01:00", "BF" -> "+00:00", "BI" -> "+02:00", "BJ" -> "+01:00",
    "BW" -> "+02:00", "CD" -> "+01:00", "CF" -> "+01:00", "CG" -> "+01:00",
    "CI" -> "+00:00", "CM" -> "+01:00", "CV" -> "-01:00", "DJ" -> "+03:00",
    "DZ" -> "+01:00", "EG" -> "+02:00", "EH" -> "+01:00", "ER" -> "+03:00",
    "ET" -> "+03:00", "GA" -> "+01:00", "GH" -> "+00:00", "GM" -> "+00:00",
    "GN" -> "+00:00", "GQ" -> "+01:00", "GW" -> "+00:00", "KE" -> "+03:00",
    "KM" -> "+03:00", "LR" -> "+00:00", "LS" -> "+02:00", "LY" -> "+02:00",
    "MA" -> "+01:00", "MG" -> "+03:00", "ML" -> "+00:00", "MR" -> "+00:00",
    "MU" -> "+04:00", "MW" -> "+02:00", "MZ" -> "+02:00", "NA" -> "+02:00",
    "NE" -> "+01:00", "NG" -> "+01:00", "RE" -> "+04:00", "RW" -> "+02:00",
    "SC" -> "+04:00", "SD" -> "+02:00", "SH" -> "+00:00", "SL" -> "+00:00",
    "SN" -> "+00:00", "SO" -> "+03:00", "SS" -> "+02:00", "ST" -> "+00:00",
    "SZ" -> "+02:00", "TD" -> "+01:00", "TG" -> "+00:00", "TN" -> "+01:00",
    "TZ" -> "+03:00", "UG" -> "+03:00", "YT" -> "+03:00", "ZA" -> "+02:00",
    "ZM" -> "+02:00", "ZW" -> "+02:00",
    // Middle East / Central & South Asia
    "AE" -> "+04:00", "AF" -> "+04:30", "AM" -> "+04:00", "AZ" -> "+04:00",
    "BH" -> "+03:00", "BD" -> "+06:00", "BT" -> "+06:00", "GE" -> "+04:00",
    "IL" -> "+02:00", "IN" -> "+05:30", "IO" -> "+06:00", "IQ" -> "+03:00",
    "IR" -> "+03:30", "JO" -> "+03:00", "KG" -> "+06:00", "KW" -> "+03:00",
    "KZ" -> "+05:00", "LB" -> "+02:00", "LK" -> "+05:30", "MV" -> "+05:00",
    "NP" -> "+05:45", "OM" -> "+04:00", "PK" -> "+05:00", "PS" -> "+02:00",
    "QA" -> "+03:00", "SA" -> "+03:00", "SY" -> "+03:00", "TJ" -> "+05:00",
    "TM" -> "+05:00", "UZ" -> "+05:00", "YE" -> "+03:00",
    // East / Southeast Asia
    "BN" -> "+08:00", "CC" -> "+06:30", "CN" -> "+08:00", "CX" -> "+07:00",
    "HK" -> "+08:00", "ID" -> "+07:00", "JP" -> "+09:00", "KH" -> "+07:00",
    "KP" -> "+09:00", "KR" -> "+09:00", "LA" -> "+07:00", "MM" -> "+06:30",
    "MN" -> "+08:00", "MO" -> "+08:00", "MY" -> "+08:00", "PH" -> "+08:00",
    "SG" -> "+08:00", "TH" -> "+07:00", "TL" -> "+09:00", "TW" -> "+08:00",
    "VN" -> "+07:00",
    // Oceania / Pacific
    "AS" -> "-11:00", "AU" -> "+10:00", "CK" -> "-10:00", "FJ" -> "+12:00",
    "FM" -> "+11:00", "GU" -> "+10:00", "KI" -> "+12:00", "MH" -> "+12:00",
    "MP" -> "+10:00", "NC" -> "+11:00", "NF" -> "+11:00", "NR" -> "+12:00",
    "NU" -> "-11:00", "NZ" -> "+12:00", "PF" -> "-10:00", "PG" -> "+10:00",
    "PN" -> "-08:00", "PW" -> "+09:00", "SB" -> "+11:00", "TK" -> "+13:00",
    "TO" -> "+13:00", "TV" -> "+12:00", "UM" -> "-11:00", "VU" -> "+11:00",
    "WF" -> "+12:00", "WS" -> "+13:00",
    // Remote territories
    "AQ" -> "+00:00", "GS" -> "-02:00", "HM" -> "+05:00", "TF" -> "+05:00")

  /** Country → principal UTC offset string, mirroring the reference's
    * get_country_tz_str (reference utils/marshalling.py:200-276: most-
    * common zone per country, rendered as ±HH:MM; null/unknown →
    * +00:00, case-insensitive input). One map-literal lookup —
    * constant-foldable, codegen-friendly, no 250-branch CASE chain. */
  def countryTzOffset(country: Column): Column =
    coalesce(element_at(typedLit(CountryTzTable), upper(country)), lit("+00:00"))

  /** The full mapping, for config/broadcast use. */
  def countryTzTable: Map[String, String] = CountryTzTable
}
