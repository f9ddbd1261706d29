package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("user_channels: exactly one attribution row per user") {
    val df = SparkEntry.queries("q_user_channels")(spark, sf)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("user_channels: users without tracker get unknown defaults") {
    val df = SparkEntry.queries("q_user_channels")(spark, sf)
    val unk = df.filter(col("tracker_token").isNull)
    assert(unk.filter(col("network_name") =!= "unknown").count() == 0)
  }

  test("user_rfe: stickiness bounded by 1") {
    val df = SparkEntry.queries("q_user_rfe")(spark, sf)
    assert(df.filter(col("stickiness") > 1.0).count() == 0)
  }

  test("rps_factor: rps proportional to cost_idx") {
    val rows = SparkEntry.queries("q_rps_factor")(spark, sf)
      .select(col("cost_idx"), col("rps")).collect()
    val ratios = rows.filter(_.getDouble(0) > 0).map(r => r.getDouble(1) / r.getDouble(0))
    assert(ratios.max - ratios.min < 1e-6)
  }

  test("feature_mapping: App branch counts all events") {
    val df = SparkEntry.queries("q_feature_mapping")(spark, sf)
    val appN = df.filter(col("feature_type") === "App").select(sum("n")).head.getLong(0)
    val base = Tables_events_count
    assert(appN == base)
  }

  private lazy val Tables_events_count: Long =
    graft.sources.Tables.events(spark, sf).count()

  test("daily pipeline composes all stage outputs") {
    val out = graft.pipelines.DailyPipeline.run(spark, sf)
    assert(out.occurrence.count() > 0)
    assert(out.retention.count() > 0)
    assert(out.featureRoi.count() > 0)
    assert(out.userChannels.count() > 0)
    assert(out.revenue.count() > 0)
  }
}
