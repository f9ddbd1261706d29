package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Anonymize, Mappings}

class MappingsExtSpec extends AnyFunSuite {
  import TestSpark._

  test("country tz table covers the full ISO set with known anchors") {
    import spark.implicits._
    val table = Mappings.countryTzTable
    assert(table.size >= 230, s"only ${table.size} countries mapped")
    // reference doctest anchor plus spot checks across regions
    val anchors = Map(
      "TW" -> "+08:00", "IN" -> "+05:30", "ID" -> "+07:00", "NP" -> "+05:45",
      "MM" -> "+06:30", "DE" -> "+01:00", "GB" -> "+00:00", "US" -> "-05:00",
      "BR" -> "-03:00", "JP" -> "+09:00", "AU" -> "+10:00", "NZ" -> "+12:00",
      "IR" -> "+03:30", "XK" -> "+01:00", "WS" -> "+13:00", "AS" -> "-11:00")
    anchors.foreach { case (c, tz) => assert(table(c) == tz, s"$c") }
    // column function: case-insensitive, unknown/null -> +00:00
    val out = Seq(Some("tw"), Some("ZZ"), None).toDF("c")
      .select(Mappings.countryTzOffset(col("c"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("+08:00", "+00:00", "+00:00"))
    // every offset well-formed
    assert(table.values.forall(_.matches("""[+-]\d2:[0-5]\d""".replace("""\d2""", """\d\d"""))))
  }

  test("vertical and target-country orderings match the reference CASE tables") {
    import spark.implicits._
    // verticals: top-level 1-5, feature-level 11-15, unknown 9999
    val vCases = Seq(
      "vertical: browser" -> 1, "vertical: shopping" -> 2, "vertical: game" -> 3,
      "vertical: lifestyle" -> 4, "vertical: travel" -> 5,
      "shopping: shopping tab_swipe" -> 11, "shopping: shopping content_tab" -> 12,
      "game: game content_tab" -> 13, "lifestyle: lifestyle content_tab" -> 14,
      "travel: travel content_tab" -> 15, "something else" -> 9999)
    val vOut = vCases.map(_._1).toDF("f")
      .select(col("f"), Mappings.verticalOrder(col("f")).as("o"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    vCases.foreach { case (f, o) => assert(vOut(f) == o, f) }

    // target countries: STRING sort key — synthetic rows first, the 14
    // target codes '01'-'14', Others '999', null/empty last, passthrough
    val cCases = Seq(
      "Overall" -> "!!", "Target Markets" -> "00", "IN" -> "01", "ID" -> "02",
      "TW" -> "03", "HK" -> "04", "SG" -> "05", "PH" -> "06", "VN" -> "07",
      "TH" -> "08", "MY" -> "09", "BD" -> "10", "MM" -> "11", "KH" -> "12",
      "LA" -> "13", "BN" -> "14", "Others" -> "999", "" -> "~", "US" -> "US")
    val cOut = cCases.map(_._1).toDF("c")
      .select(col("c"), Mappings.targetCountryOrder(col("c")).as("o"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cCases.foreach { case (c, o) => assert(cOut(c) == o, c) }
    val nullOut = Seq(Option.empty[String]).toDF("c")
      .select(Mappings.targetCountryOrder(col("c"))).head.getString(0)
    assert(nullOut == "~")
    // membership test agrees with the ordering's target set
    val members = cCases.map(_._1).toDF("c")
      .select(col("c"), Mappings.isTargetCountry(col("c")).as("m"))
      .collect().filter(_.getBoolean(1)).map(_.getString(0)).toSet
    assert(members == Set("IN", "ID", "TW", "HK", "SG", "PH", "VN",
      "TH", "MY", "BD", "MM", "KH", "LA", "BN"))
  }

  test("kv-array cleanup mirrors the reference JS UDF semantics") {
    import spark.implicits._
    import graft.functions.KvArrays
    val df = Seq(1).toDF("i").select(array(
      struct(lit("Session_Time").as("key"), lit("-5").as("value")),
      struct(lit("URL_counts").as("key"), lit("3").as("value")),
      struct(lit("Other").as("key"), lit(null.asInstanceOf[String]).as("value"))).as("extra"))
    val out = df.select(KvArrays.cleanupExtra(col("extra")).as("e"))
      .selectExpr("inline(e)").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("session_time") == "0")   // negative clamped
    assert(out("url_counts") == "4")     // off-by-one patched
    assert(out("other") == "")           // null -> ""
    val settings = df.select(KvArrays.cleanupSettings(col("extra")).as("e"))
      .selectExpr("inline(e)").collect().map(_.getString(0)).toSeq
    assert(settings == Seq("session_time", "url_counts", "other"))
    // null array stays null (JS early-return)
    val n = Seq(1).toDF("i")
      .select(KvArrays.cleanupSettings(
        lit(null).cast("array<struct<key:string,value:string>>")))
      .head
    assert(n.isNullAt(0))
  }

  test("regex find-all-groups returns every match's capture tuple") {
    import spark.implicits._
    import graft.functions.KvArrays
    val out = Seq("a=1;b=22;c=333").toDF("s")
      .select(KvArrays.findAllGroups(col("s"), "([a-z])=(\\d+)", 2).as("g"))
      .selectExpr("inline(g)").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("a", "1"), ("b", "22"), ("c", "333")))
  }

  test("vertical mapping and ordering mirror the reference udf family") {
    import spark.implicits._
    val v = Seq("Shopping", "feature: view", "nope").toDF("c")
      .select(Mappings.vertical(col("c"))).collect().map(_.getString(0)).toSeq
    assert(v == Seq("vertical: shopping", "vertical: browser", ""))
    val lv = Seq("appstore", "creative", "x").toDF("c")
      .select(Mappings.channelLevelOrder(col("c"))).collect().map(_.getInt(0)).toSeq
    assert(lv == Seq(0, 4, 9999))
    val m = Seq(("Vertical", "Shopping"), ("App", "Shopping"))
      .toDF("l", "n")
      .select(Mappings.isVertical(col("l"), col("n"))).collect().map(_.getBoolean(0)).toSeq
    assert(m == Seq(true, false))
  }

  test("nested anonymizer rewrites only the configured paths") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("user", StructType(Seq(
        StructField("id", StringType), StructField("name", StringType)))),
      StructField("device", StructType(Seq(
        StructField("ip", StringType), StructField("os", StringType)))),
      StructField("n", LongType)))
    val json = """{"user":{"id":"u42","name":"kept"},"device":{"ip":"1.2.3.4","os":"android"},"n":7}"""
    val out = Seq(json).toDF("j")
      .select(Anonymize.nestedJson(col("j"), schema, Seq("user.id", "device.ip")).as("a"))
      .head.getString(0)
    assert(!out.contains("u42") && !out.contains("1.2.3.4"))
    assert(out.contains("kept") && out.contains("android") && out.contains("7"))
    // deterministic: same input -> same pseudonym
    val out2 = Seq(json).toDF("j")
      .select(Anonymize.nestedJson(col("j"), schema, Seq("user.id", "device.ip")).as("a"))
      .head.getString(0)
    assert(out == out2)
  }
}
