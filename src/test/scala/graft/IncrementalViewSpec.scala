package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.IncrementalView
import graft.sources.{Snapshots, Tables}

class IncrementalViewSpec extends AnyFunSuite {
  import TestSpark._

  private def byDay(df: DataFrame, day: String): DataFrame =
    df.filter(to_date(col("ts")) === lit(day))

  private def rowsOf(df: DataFrame): Set[(String, Long, Double, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getLong(3))).toSet

  test("incremental refresh ≡ direct aggregation after every day, including the HLL distinct") {
    val root = Files.createTempDirectory("iview").toString + "/v"
    val ev = Tables.events(spark, sf)
    val days = ev.select(to_date(col("ts")).cast("string").as("d"))
      .distinct().orderBy(col("d")).limit(3).collect().map(_.getString(0))
    assert(days.length == 3)
    var seen: DataFrame = null
    for (day <- days) {
      val delta = byDay(ev, day)
      IncrementalView.refresh(spark, root, delta, day)
      seen = if (seen == null) delta else seen.unionByName(delta)
      // partial-merge must equal the direct full-history aggregation
      // EXACTLY (hll union is lossless at equal lgK)
      assert(rowsOf(IncrementalView.read(spark, root)) ==
        rowsOf(IncrementalView.direct(seen)), s"divergence after $day")
    }
  }

  test("re-running a day is idempotent in values and publishes a new pinnable version") {
    val root = Files.createTempDirectory("iview2").toString + "/v"
    val ev = Tables.events(spark, sf)
    val days = ev.select(to_date(col("ts")).cast("string").as("d"))
      .distinct().orderBy(col("d")).limit(2).collect().map(_.getString(0))
    IncrementalView.refresh(spark, root, byDay(ev, days(0)), days(0))
    val v1 = IncrementalView.refresh(spark, root, byDay(ev, days(1)), days(1))
    val before = rowsOf(IncrementalView.read(spark, root))
    // daily-job retry: same day replayed (partition overwritten, not doubled)
    val v2 = IncrementalView.refresh(spark, root, byDay(ev, days(1)), days(1))
    assert(v2 == v1 + 1, "retry publishes a fresh version")
    assert(rowsOf(IncrementalView.read(spark, root)) == before,
      "replaying a day must not change the view")
    // time travel: the pre-retry version is still pinnable
    assert(rowsOf(IncrementalView.readVersion(spark, root, v1)) == before)
    // day-1-only state (version 0) equals the direct day-1 view
    assert(rowsOf(IncrementalView.readVersion(spark, root, 0)) ==
      rowsOf(IncrementalView.direct(byDay(ev, days(0)))))
    assert(Snapshots.versions(root + "/view").size == 3)
  }
}
