package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsCSpec extends AnyFunSuite {
  import TestSpark._

  test("ks_drift: statistic in [0,1] and split/carry equals the naive global-window KS") {
    val df = SparkEntry.queries("q_ks_drift")(spark, sf).cache()
    assert(df.count() == 1)
    val row = df.head()
    val d = row.getDouble(row.fieldIndex("d_stat"))
    assert(d >= 0.0 && d <= 1.0, s"KS statistic out of range: $d")

    // independent recomputation: one GLOBAL ordered cumsum (the
    // single-partition formulation the bucketed plan replaces)
    val split = lit("2024-01-16").cast("timestamp")
    val counts = graft.sources.Tables.events(spark, sf)
      .select(col("value"), col("ts").as("tts"))
      .groupBy(col("value").as("v"))
      .agg(sum(when(col("tts") < split, 1L).otherwise(0L)).as("n1"),
        sum(when(col("tts") >= split, 1L).otherwise(0L)).as("n2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts.agg(sum("n1").as("t1"), sum("n2").as("t2")).head()
    val (t1, t2) = (tot.getLong(0), tot.getLong(1))
    val naive = counts
      .withColumn("c1", sum(col("n1")).over(w))
      .withColumn("c2", sum(col("n2")).over(w))
      .select(col("v"), abs(col("c1") * t2 - col("c2") * t1).as("dnum"))
      .orderBy(col("dnum").desc, col("v")).limit(1).head()
    val expected = BigDecimal(naive.getLong(1).toDouble / (t1.toDouble * t2.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d == expected, s"bucketed KS $d != naive KS $expected")
    assert(row.getDouble(row.fieldIndex("at_value")) == naive.getDouble(0))
    df.unpersist()
  }

  test("survival_km: monotone non-increasing, bounded, and first step is 1 - d/r") {
    val df = SparkEntry.queries("q_survival_km")(spark, sf)
      .orderBy(col("t")).cache()
    val rows = df.collect()
    assert(rows.nonEmpty, "no death times — censor cutoff leaves nothing to estimate")
    val surv = rows.map(r => r.getDouble(r.fieldIndex("survival")))
    assert(surv.forall(s => s >= 0.0 && s <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"survival not non-increasing: ${surv.mkString(",")}")
    val h = rows.head
    val (r0, d0) = (h.getLong(h.fieldIndex("n_risk")), h.getLong(h.fieldIndex("n_deaths")))
    val expect0 = BigDecimal(math.exp(math.log((r0 - d0).toDouble / r0.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(surv.head == expect0, s"first KM step ${surv.head} != 1 - d/r $expect0")
    // at-risk counts strictly decrease across death times
    val risks = rows.map(r => r.getLong(r.fieldIndex("n_risk")))
    assert(risks.zip(risks.tail).forall { case (a, b) => b < a })
    df.unpersist()
  }

  test("survival_km: censored subjects deflate deaths below the subject count") {
    // with the 2024-01-03 interim cutoff some users have not purchased
    // yet — total deaths must be strictly fewer than subjects at risk
    // at t=0 (otherwise the censoring path is dead code on this data)
    val df = SparkEntry.queries("q_survival_km")(spark, sf).cache()
    val totalDeaths = df.agg(sum("n_deaths")).head().getLong(0)
    val maxRisk = df.agg(max("n_risk")).head().getLong(0)
    assert(totalDeaths < maxRisk,
      s"no censoring happened: deaths=$totalDeaths risk0=$maxRisk")
    df.unpersist()
  }

  test("random_walk: visits conserve walks × steps and the walk is deterministic") {
    val df = SparkEntry.queries("q_random_walk")(spark, sf).cache()
    val nVisits = df.agg(sum("n_visits")).head().getLong(0)
    // seeds = co-purchase graph nodes (parts sharing an order with
    // another part) ≡ 0 mod 97; each contributes exactly 4 visits
    // (step 0 + 3 hops, walks never strand on a bidirected graph)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val multi = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_partkey")).as("np"))
      .filter(col("np") >= 2)
    val seeds = li.join(multi, "l_orderkey")
      .select(col("l_partkey")).distinct()
      .filter(pmod(col("l_partkey"), lit(97)) === 0).count()
    assert(nVisits == 4 * seeds, s"visit mass $nVisits != 4 × $seeds seeds")
    assert(df.filter(col("n_walks") > col("n_visits")).count() == 0)
    // determinism: a second evaluation yields the identical frame
    val again = SparkEntry.queries("q_random_walk")(spark, sf)
    assert(df.except(again).isEmpty && again.except(df).isEmpty,
      "random walk is not replay-deterministic")
    df.unpersist()
  }
}
