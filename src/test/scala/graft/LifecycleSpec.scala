package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LifecycleSpec extends AnyFunSuite {
  import TestSpark._

  test("retention_curve: offset 0 is total and 100%, eligibility is monotone non-increasing") {
    val df = SparkEntry.queries("q_retention_curve")(spark, sf).cache()
    val rows = df.orderBy(col("day_offset")).collect()
    assert(rows.nonEmpty)
    val d0 = rows.head
    assert(d0.getAs[Long]("day_offset") == 0L)
    // everyone is active on their own first day
    assert(d0.getAs[Long]("n_retained") == d0.getAs[Long]("n_eligible"))
    assert(math.abs(d0.getAs[Double]("retention") - 1.0) < 1e-9)
    // censoring only removes users as offsets grow
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_eligible") >= b.getAs[Long]("n_eligible"))
    }
    // retained never exceeds eligible
    assert(df.filter(col("n_retained") > col("n_eligible")).count() == 0)
    df.unpersist()
  }

  test("retention_curve: right-censoring replay on a crafted two-cohort frame") {
    import spark.implicits._
    // horizon = day 10. u1 first day 0 (eligible through offset 10>14? no, 10),
    // u2 first day 9 (eligible offsets 0 and 1 only)
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-03"),
      (2L, "2024-01-10"), (2L, "2024-01-11"), (0L, "2024-01-01")
    ).toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("date").as("day"))
    val fd = ev.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val mx = ev.agg(max(col("day")).as("max_day"))
    val elig = fd.crossJoin(broadcast(mx))
      .select(explode(sequence(lit(0),
        least(datediff(col("max_day"), col("first_day")), lit(14)))).as("day_offset"))
      .groupBy(col("day_offset")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(elig(0) == 3)  // all three users
    assert(elig(1) == 3)  // u2 still eligible at offset 1 (day 11 == horizon)
    assert(elig(2) == 2)  // u2 censored from offset 2 on
  }

  test("funnel_timing: converted users positive, percentiles ordered") {
    val df = SparkEntry.queries("q_funnel_timing")(spark, sf).cache()
    assert(df.count() == 1)
    val r = df.head()
    assert(r.getAs[Long]("n_converted") > 0)
    assert(r.getAs[Double]("p50_hours") > 0.0)
    assert(r.getAs[Double]("p50_hours") <= r.getAs[Double]("p90_hours") + 1e-9)
    // the mean lies within [min, max] — and for a right-skewed delay
    // distribution must be >= some of the mass; just bound vs p90·10
    assert(r.getAs[Double]("mean_hours") > 0.0)
    df.unpersist()
  }

  test("dormancy: buckets partition the user base, shares sum to 1") {
    val df = SparkEntry.queries("q_dormancy")(spark, sf).cache()
    val total = df.agg(sum(col("n_users"))).head().getLong(0)
    val users = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(total == users)
    val shareSum = df.agg(sum(col("share"))).head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-4)
    df.unpersist()
  }

  test("concurrency sweep-line: crafted overlaps, midnight carry-in, touching endpoints") {
    import spark.implicits._
    val day = 86400L * 1000 * 1000 // µs
    // day0: [10,20], [15,30] overlap → peak 2; [40,50] alone
    // [day0 23h, day1 +1h] spans midnight → day1 starts with carry_in 1
    // day1: [+0.5h, +3h] overlaps the carried session until +1h → peak 2
    // day2: two sessions touching at an endpoint: [10,20],[20,30] →
    //   inclusive ends: the start sorts before the end → peak 2
    val h = 3600L * 1000 * 1000
    val sess = Seq(
      (10L, 20L), (15L, 30L), (40L, 50L),
      (23 * h, day + h),
      (day + h / 2, day + 3 * h),
      (2 * day + 10L, 2 * day + 20L), (2 * day + 20L, 2 * day + 30L)
    ).toDF("start_us", "end_us")
    val got = graft.queries.Lifecycle.concurrencyOf(sess).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got == Map("1970-01-01" -> 2L, "1970-01-02" -> 2L, "1970-01-03" -> 2L))
  }

  test("concurrency: a day of only session ends still reports the carried peak") {
    import spark.implicits._
    val day = 86400L * 1000 * 1000
    // two sessions open across midnight, both closing on day1 with no
    // new starts: day1's local running max is negative — peak must be
    // the carry-in (2), not carry_in + a negative run
    val sess = Seq((10L, day + 10L), (20L, day + 20L)).toDF("start_us", "end_us")
    val got = graft.queries.Lifecycle.concurrencyOf(sess).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got == Map("1970-01-01" -> 2L, "1970-01-02" -> 2L))
  }
}
