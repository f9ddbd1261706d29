package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Readers, Tables, Writers}
import graft.validation.Checks

class EtlSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("jsonl/csv readers roundtrip with explicit schema") {
    val tmp = Files.createTempDirectory("graft-io").toString
    val df = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    df.write.json(s"$tmp/jsonl")
    df.write.option("header", "true").csv(s"$tmp/csv")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    assert(Readers.jsonl(spark, s"$tmp/jsonl", schema).count() == df.count())
    assert(Readers.csv(spark, s"$tmp/csv", schema).count() == df.count())
  }

  test("localToUtc shifts naive timestamps") {
    import spark.implicits._
    val df = Seq("2024-01-01 08:00:00").toDF("t")
      .select(col("t").cast("timestamp").as("t"))
    val utc = Readers.localToUtc(df, "t", "Asia/Taipei").head.getTimestamp(0)
    assert(utc.toString.startsWith("2024-01-01 00:00:00"))
  }

  test("date-partitioned writer + latest snapshot") {
    val tmp = Files.createTempDirectory("graft-w").toString
    val df = Tables.orders(spark, sf).limit(500)
    Writers.datePartitionedParquet(df, tmp, "staging", "revenue", "orders", "o_orderdate")
    val back = spark.read.parquet(Writers.pathFor(tmp, "staging", "revenue", "orders"))
    assert(back.count() == 500)
    // partition pruning is available on the __date partition column
    assert(back.schema.fieldNames.contains("__date"))

    Writers.writeLatest(df, tmp, "staging", "revenue", "orders_latest", "o_orderdate")
    val latest = spark.read.parquet(Writers.latestPath(tmp, "staging", "revenue", "orders_latest"))
    val maxDate = df.agg(max(to_date(col("o_orderdate")))).head.getDate(0)
    assert(latest.select(to_date(col("o_orderdate"))).distinct().head.getDate(0) == maxDate)
  }

  test("validation checks pass on conforming frame and fail on violation") {
    val df = Tables.orders(spark, sf)
    Checks.requireSchema(df, Seq("o_orderkey" -> LongType, "o_totalprice" -> DoubleType))
    Checks.requireNonNull(df, Seq("o_orderkey", "o_custkey"))
    Checks.requireMinRows(df, 100)
    assertThrows[IllegalArgumentException] {
      Checks.requireSchema(df, Seq("missing_col" -> LongType))
    }
    assertThrows[IllegalArgumentException] {
      Checks.requireMinRows(df, 10000000L)
    }
    val withNulls = df.withColumn("o_orderkey",
      when(col("o_orderkey") % 2 === 0, col("o_orderkey")))
    assertThrows[IllegalArgumentException] {
      Checks.requireNonNull(withNulls, Seq("o_orderkey"))
    }
    // volume-drift gate vs previous period
    Checks.requireCountWithinDrift(df, df.sample(0.9, seed = 7), tolerance = 0.5)
    assertThrows[IllegalArgumentException] {
      Checks.requireCountWithinDrift(df, df.limit(10), tolerance = 0.5)
    }
  }

  test("orc date-partitioned writer roundtrips with pruning layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = Tables.orders(spark, sf).limit(500)
    Writers.datePartitionedOrc(df, tmp, "staging", "revenue", "orders_orc", "o_orderdate")
    val back = spark.read.orc(Writers.pathFor(tmp, "staging", "revenue", "orders_orc"))
    assert(back.count() == 500)
    assert(back.columns.contains("__date"))
  }

  test("const source") {
    val df = Readers.const(spark, Seq(("package", 1000000.0)), ("name", "package"))
    assert(df.head.getDouble(1) == 1000000.0)
  }

  test("avro date-partitioned writer roundtrips with partition pruning layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-avro").toString
    val df = Tables.orders(spark, sf).limit(500)
    Writers.datePartitionedAvro(df, tmp, "staging", "revenue", "orders_avro", "o_orderdate")
    val path = Writers.pathFor(tmp, "staging", "revenue", "orders_avro")
    val back = spark.read.format(Readers.AvroProvider).load(path)
    assert(back.count() == 500)
    assert(back.columns.contains("__date"))
    // directory-partition pruning still applies to a row-format source
    // (partition-column inference reads __date back as a DATE)
    val oneDate = back.select(col("__date").cast("string")).head().getString(0)
    val pruned = back.filter(col("__date").cast("string") === oneDate)
    assert(pruned.count() > 0 && pruned.count() < 500)
  }

  test("avro reader applies the explicit schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-avro").toString
    val df = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice")).limit(100)
    df.write.format(Readers.AvroProvider).save(s"$tmp/avro")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_totalprice", DoubleType)))
    val back = Readers.avro(spark, s"$tmp/avro", schema)
    assert(back.schema == schema)
    assert(back.count() == 100)
  }

  test("xml reader parses rowTag elements with the explicit schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-xml").toString
    val xml =
      """<orders>
        |  <order><id>1</id><total>10.5</total></order>
        |  <order><id>2</id><total>20.25</total></order>
        |  <order><id>3</id><total>30.0</total></order>
        |</orders>""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/orders.xml"), xml)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("total", DoubleType)))
    val back = Readers.xml(spark, s"$tmp/orders.xml", "order", schema)
    assert(back.count() == 3)
    assert(back.filter(col("id") === 2L).head().getDouble(1) == 20.25)
  }

  test("orc roundtrip with pushdown-capable scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    df.write.orc(s"$tmp/orc")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_totalprice", DoubleType)))
    val back = Readers.orc(spark, s"$tmp/orc", schema)
    assert(back.count() == df.count())
    val plan = back.filter(col("o_totalprice") > 100000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("orc"))
  }
}
