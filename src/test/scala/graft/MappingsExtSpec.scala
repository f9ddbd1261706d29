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
