package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsBSpec extends AnyFunSuite {
  import TestSpark._

  test("seasonality: weekday indexes average to 1 weighted by day counts, adjusted conserves volume") {
    val df = SparkEntry.queries("q_seasonality")(spark, sf).cache()
    assert(df.count() > 0)
    // deflating by the weekday index conserves total volume up to rounding:
    // sum(adjusted) == sum(n / (dow_avg/overall)) and each dow group's
    // n-sum / dow_avg = count-of-days in group, so both sides total n_days * overall
    val t = df.agg(sum(col("n")).as("raw"), sum(col("adjusted")).as("adj")).head()
    val raw = t.getLong(0).toDouble
    val adj = t.getDouble(1)
    assert(math.abs(raw - adj) / raw < 1e-3, s"adjusted volume drifted: raw=$raw adj=$adj")
    // index is positive and finite everywhere
    assert(df.filter(col("dow_index") <= 0.0).count() == 0)
    df.unpersist()
  }

  test("gini: bounds hold and a uniform distribution scores ~0") {
    val df = SparkEntry.queries("q_gini")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("gini") < -0.01 || col("gini") > 1.0).count() == 0)
    df.unpersist()
    // crafted check: equal revenues -> G = (2*(1+2+..n)/n - (n+1)) / n ... = 0
    import spark.implicits._
    val rev = Seq(("s", 1L, 10.0), ("s", 2L, 10.0), ("s", 3L, 10.0), ("s", 4L, 10.0))
      .toDF("segment", "custkey", "rev")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("segment")).orderBy(col("rev"), col("custkey"))
    val g = rev.withColumn("r", row_number().over(w).cast("long"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("rev")).as("tot"),
        sum(col("r").cast("double") * col("rev")).as("wsum"))
      .select((lit(2.0) * col("wsum") / (col("n").cast("double") * col("tot"))
        - (col("n") + 1).cast("double") / col("n")).as("gini"))
      .head().getDouble(0)
    assert(math.abs(g) < 1e-12)
  }

  test("cube_agg: every grouping combination present, subtotals consistent") {
    val df = SparkEntry.queries("q_cube_agg")(spark, sf).cache()
    val gids = df.select(col("gid")).distinct().collect().map(_.getLong(0)).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
    val total = df.filter(col("gid") === 3).agg(sum(col("n"))).head().getLong(0)
    val detail = df.filter(col("gid") === 0).agg(sum(col("n"))).head().getLong(0)
    assert(total == detail, s"grand total $total != detail sum $detail")
    // each marginal slice also sums to the grand total
    for (g <- Seq(1, 2)) {
      val m = df.filter(col("gid") === g).agg(sum(col("n"))).head().getLong(0)
      assert(m == total, s"gid=$g marginal $m != $total")
    }
    df.unpersist()
  }

  test("ntile_deciles: 10 near-equal bands with non-overlapping balance ranges") {
    val df = SparkEntry.queries("q_ntile_deciles")(spark, sf).cache()
    assert(df.count() == 10)
    val sizes = df.select(col("n")).collect().map(_.getLong(0))
    assert(sizes.max - sizes.min <= 1, s"ntile bands uneven: ${sizes.mkString(",")}")
    // band boundaries are monotone: decile d's max <= decile d+1's min
    // (ties may share a boundary value)
    val rows = df.orderBy(col("decile")).collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_bal") <= b.getAs[Double]("min_bal") + 1e-9)
    }
    df.unpersist()
  }

  test("set_ops: result users all purchased and clicked above threshold, none errored big") {
    val df = SparkEntry.queries("q_set_ops")(spark, sf).cache()
    assert(df.count() > 0, "set algebra is vacuous at this SF")
    val ev = graft.sources.Tables.events(spark, sf)
    def cohort(t: String, v: Double) =
      ev.filter(col("event_type") === t && col("value") > v)
        .select(col("user_id")).distinct()
    assert(df.join(cohort("purchase", 100), Seq("user_id"), "left_anti").count() == 0)
    assert(df.join(cohort("click", 100), Seq("user_id"), "left_anti").count() == 0)
    assert(df.join(cohort("error", 250), Seq("user_id"), "left_semi").count() == 0)
    // and it is maximal: the semi/anti-join replay has the same size
    val expect = cohort("purchase", 100)
      .join(cohort("click", 100), Seq("user_id"), "left_semi")
      .join(cohort("error", 250), Seq("user_id"), "left_anti").count()
    assert(df.count() == expect)
    df.unpersist()
  }
}
