package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EvaluationSpec extends AnyFunSuite {
  import TestSpark._

  test("auc_rank: matches the all-pairs Mann-Whitney definition") {
    val df = SparkEntry.queries("q_auc_rank")(spark, sf).cache()
    val row = df.head()
    val auc = row.getDouble(row.fieldIndex("auc"))
    assert(auc >= 0.0 && auc <= 1.0)
    // independent recomputation straight from the definition:
    // AUC = P(score+ > score-) + 0.5 P(score+ = score-), over all
    // (positive, negative) pairs — tiny at the spec SF
    val cutoff = lit("2024-01-03").cast("date")
    val users = graft.sources.Tables.events(spark, sf)
      .filter(to_date(col("ts")) <= cutoff)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
      .cache()
    val pos = users.filter(col("label") === 1).select(col("score").as("sp"))
    val neg = users.filter(col("label") === 0).select(col("score").as("sn"))
    val pair = pos.crossJoin(neg)
      .agg(sum(when(col("sp") > col("sn"), 1.0)
        .when(col("sp") === col("sn"), 0.5).otherwise(0.0)).as("wins"),
        count(lit(1)).as("pairs")).head()
    val expected = BigDecimal(pair.getDouble(0) / pair.getLong(1).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(auc == expected, s"rank-statistic AUC $auc != all-pairs AUC $expected")
    assert(row.getLong(row.fieldIndex("n_pos")) == pos.count())
    assert(row.getLong(row.fieldIndex("n_neg")) == neg.count())
    users.unpersist(); df.unpersist()
  }

  test("chi2_indep: nonnegative, right dof, equals a driver-side fold in cell order") {
    val df = SparkEntry.queries("q_chi2_indep")(spark, sf)
    val row = df.head()
    val chi2 = row.getDouble(row.fieldIndex("chi2"))
    assert(chi2 >= 0.0)
    // recompute from raw contingency counts, folding cells in the same
    // (seg, pri) order the query's running cumsum uses
    val cells = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("o"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val n = cells.map(_._3).sum.toDouble
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble).toMap
    var acc = 0.0
    for ((s0, p0, o) <- cells) {
      val e = rt(s0) * ct(p0) / n
      acc += (o.toDouble - e) * (o.toDouble - e) / e
    }
    val expected = BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(chi2 == expected, s"chi2 $chi2 != folded $expected")
    assert(row.getLong(row.fieldIndex("dof")) ==
      (rt.size - 1).toLong * (ct.size - 1).toLong)
  }

  test("bootstrap_ci: interval brackets, replicates complete, deterministic") {
    val df = SparkEntry.queries("q_bootstrap_ci")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("ci_lo") >= col("ci_hi")).count() == 0,
      "degenerate interval")
    assert(df.filter(col("n_reps") =!= 64).count() == 0,
      "a replicate went empty — Bernoulli(1/2) must populate all 64")
    // point estimate inside the interval (a half-sample bootstrap at
    // these counts never misses by construction of the planted data)
    assert(df.filter(col("mean_value") < col("ci_lo") ||
      col("mean_value") > col("ci_hi")).count() == 0)
    val again = SparkEntry.queries("q_bootstrap_ci")(spark, sf)
    assert(df.except(again).isEmpty && again.except(df).isEmpty,
      "bootstrap is not replay-deterministic")
    df.unpersist()
  }

  test("calibration: complete quintile partition with monotone mean score") {
    val df = SparkEntry.queries("q_calibration")(spark, sf)
      .orderBy(col("band")).cache()
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val cutoff = lit("2024-01-03").cast("date")
    val totalUsers = graft.sources.Tables.events(spark, sf)
      .filter(to_date(col("ts")) <= cutoff)
      .select(col("user_id")).distinct().count()
    assert(rows.map(r => r.getLong(r.fieldIndex("n_users"))).sum == totalUsers)
    val ms = rows.map(r => r.getDouble(r.fieldIndex("mean_score")))
    assert(ms.zip(ms.tail).forall { case (a, b) => b >= a },
      s"mean score not monotone across score-ordered bands: ${ms.mkString(",")}")
    val rates = rows.map(r => r.getDouble(r.fieldIndex("conv_rate")))
    assert(rates.forall(r => r >= 0.0 && r <= 1.0))
    df.unpersist()
  }

  test("text_normalize: composed output, canonical whitespace, NFC kernel semantics") {
    val df = SparkEntry.queries("q_text_normalize")(spark, sf).cache()
    assert(df.count() > 0)
    // every cleaned text starts with the COMPOSED form and carries no
    // raw whitespace artifacts
    assert(df.filter(!col("clean").startsWith("Caf\u00E9")).count() == 0,
      "NFC did not compose e+COMBINING ACUTE to é")
    assert(df.filter(col("clean").rlike("[\\u00A0\\t\\r\\n]|  ")).count() == 0,
      "whitespace not canonicalized")
    // composition strictly shortens the decorated text (combining
    // marks merge, doubled spaces collapse)
    assert(df.filter(col("len_clean") >= col("len_raw")).count() == 0)
    df.unpersist()
    // kernel semantics straight on the expression: idempotent, equals
    // java.text.Normalizer, composed/decomposed forms converge
    import org.apache.spark.unsafe.types.UTF8String
    val dec = "Café Ångström"
    val once = graft.plans.NfcNormalizeKernel.compute(UTF8String.fromString(dec)).toString
    assert(once == java.text.Normalizer.normalize(dec, java.text.Normalizer.Form.NFC))
    assert(once == "Caf\u00E9 \u00C5ngstr\u00F6m") // composed
    assert(graft.plans.NfcNormalizeKernel.compute(UTF8String.fromString(once)).toString == once)
    // SQL registration exposes the kernel
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(s"SELECT nfc_normalize('$dec') AS x").head().getString(0)
    assert(viaSql == once)
  }
}
