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
