package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CohortSpec extends AnyFunSuite {
  import TestSpark._

  test("occurrence: cohort_date is never after occur_date") {
    val occ = SparkEntry.queries("q_user_occurrence")(spark, sf)
    assert(occ.filter(col("cohort_date") > col("occur_date")).count() == 0)
  }

  test("occurrence: exactly one cohort_date per user") {
    val occ = SparkEntry.queries("q_user_occurrence")(spark, sf)
    val multi = occ.groupBy("user_id")
      .agg(countDistinct("cohort_date").as("n"))
      .filter(col("n") > 1)
    assert(multi.count() == 0)
  }

  test("active user count: dau <= wau <= mau") {
    val row = SparkEntry.queries("q_active_user_count")(spark, sf).head()
    val dau = row.getAs[Long]("dau"); val wau = row.getAs[Long]("wau")
    val mau = row.getAs[Long]("mau")
    assert(dau <= wau && wau <= mau)
  }

  test("sessionize: session time non-negative and capped per gap") {
    val df = SparkEntry.queries("q_sessionize")(spark, sf)
    assert(df.filter(col("session_time_us") < 0).count() == 0)
  }

  test("retention: retained users never exceed weekly cohort size upper bound") {
    val df = SparkEntry.queries("q_cohort_retained")(spark, sf)
    // d1 retained can exceed the *daily* cohort of a later date but the
    // weekly cohort of its own row bounds same-week retention
    assert(df.filter(col("w1_retained") > col("monthly_cohort_size")).count() == 0)
  }
}
