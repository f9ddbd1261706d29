package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every registered query runs and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query with an oracle has matching column sets are non-empty") {
    // column names must line up with the oracle aliases (driver sorts
    // columns by name before hashing)
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("q_agg_group aggregates are correct on a known slice") {
    val df = SparkEntry.queries("q_agg_group")(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("count_order")).head.getLong(0)
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter("l_shipdate <= timestamp'1998-09-02'").count()
    assert(total == base)
  }

  test("q_window_rank_dedup yields one row per customer") {
    val df = SparkEntry.queries("q_window_rank_dedup")(spark, sf)
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
