package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Fit

/** Crafted-fixture specs for the model-fitting batch (#159-163).
  * Each kernel is driven with inputs whose closed-form answer is known
  * exactly, so the assertions are equality at the query's own rounding
  * — not tolerance bands. */
class FitSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def dec(df: org.apache.spark.sql.DataFrame, cols: String*) =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("decimal(18,0)")))

  test("ols: exact line y=2x+300 recovers slope 2, intercept $3, r2 1") {
    val pts = Seq(
      ("A", 100L, 500L), ("A", 200L, 700L), ("A", 300L, 900L),
      // B: same x spread, y NOT on a line -> r2 strictly < 1
      ("B", 100L, 100L), ("B", 200L, 300L), ("B", 300L, 200L))
      .toDF("segment", "x", "y")
    val out = Fit.olsOf(dec(pts, "x", "y")).orderBy("segment").collect()
    val a = out(0)
    assert(a.getAs[Long]("n") == 3L)
    assert(a.getAs[Double]("slope") == 2.0)
    assert(a.getAs[Double]("intercept") == 3.0) // 300 cents = $3
    assert(a.getAs[Double]("r2") == 1.0)
    val b = out(1)
    assert(b.getAs[Double]("r2") > 0 && b.getAs[Double]("r2") < 1)
    // B closed-form: slope = (3*140000-600*600)/(3*140000-600*600)…
    // compute from the same sufficient statistics in the same op order
    val (n, sx, sy, sxy, sxx) = (3.0, 600.0, 600.0, 130000.0, 140000.0)
    val slopeB = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(b.getAs[Double]("slope") ==
      BigDecimal(slopeB).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("acf: alternating daily series gives the exact lag-k identity") {
    // 8 days alternating 1,3: xc = ±8 (n·x − S), den = 512
    val daily = (0 until 8)
      .map(i => (java.sql.Date.valueOf(s"2024-01-0${i + 1}"),
        if (i % 2 == 0) 1L else 3L))
      .toDF("d", "x")
    val acf = Fit.acfOf(daily).orderBy("lag").collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf")).toMap
    assert(acf(1) == -0.875) // 7 pairs × (−64) / 512
    assert(acf(2) == 0.75)   // 6 pairs × (+64) / 512
    assert(acf(7) == -0.125) // 1 pair × (−64) / 512
  }

  test("acf: constant series yields NULL (den=0), never a crash") {
    val daily = (1 to 5)
      .map(i => (java.sql.Date.valueOf(s"2024-02-0$i"), 7L)).toDF("d", "x")
    val rows = Fit.acfOf(daily).collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(rows.head.fieldIndex("acf"))))
  }

  test("benford: digit counts conserve the row total and chi2 is one global value") {
    val cents = Seq(1L, 19L, 123L, 2L, 25L, 34L).toDF("cents")
    val out = Fit.benfordOf(cents).orderBy("digit").collect()
    val byDigit = out.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
    assert(byDigit == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
    assert(out.map(_.getAs[Long]("n")).sum == 6L) // every row counted once
    val chi2s = out.map(_.getAs[Double]("chi2")).distinct
    assert(chi2s.length == 1 && chi2s.head >= 0.0)
    val shares = out.map(_.getAs[Double]("obs_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-6)
  }

  test("zipf: slope matches a sequential same-order replay and sits near -1 on 1/r counts") {
    val counts = (1 to 50)
      .map(r => (f"term$r%03d", (100000L / r))).toDF("term", "cnt")
    val row = Fit.zipfOf(counts).head()
    assert(row.getAs[Long]("n_terms") == 50L)
    // replay: rank by (cnt desc, term), cumsum in rank order — the same
    // IEEE op sequence the window runs
    val ranked = (1 to 50).map { r => (math.log(r.toDouble), math.log((100000L / r).toDouble)) }
    var (k, slx, sly, slxy, slxx) = (0.0, 0.0, 0.0, 0.0, 0.0)
    for ((lx, ly) <- ranked) {
      k += 1; slx += lx; sly += ly; slxy += lx * ly; slxx += lx * lx
    }
    val slope = (k * slxy - slx * sly) / (k * slxx - slx * slx)
    val expect = BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("slope") == expect)
    assert(slope < -0.9 && slope > -1.1, s"1/r counts should fit near -1, got $slope")
  }

  test("decay: half-life replay — yesterday counts half, horizon 31d drops") {
    val ev = Seq(
      (1L, 100L, 0), (1L, 100L, 1), (1L, 100L, 2), // 1 + .5 + .25
      (1L, 999L, 31),                              // beyond horizon
      (2L, 250L, 0))                               // 2.5 exactly
      .toDF("user_id", "cents", "age")
    val out = Fit.decayOf(ev).orderBy("user_id").collect()
    assert(out(0).getAs[Long]("n_events") == 3L)
    assert(out(0).getAs[Double]("decay_score") == 1.75)
    assert(out(1).getAs[Double]("decay_score") == 2.5)
  }
}
