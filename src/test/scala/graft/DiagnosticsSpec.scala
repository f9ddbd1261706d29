package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiagnosticsSpec extends AnyFunSuite {
  import TestSpark._

  test("join_explosion: profile predicts the ACTUAL join multiplicity for the top key") {
    val df = SparkEntry.queries("q_join_explosion")(spark, sf).cache()
    assert(df.count() > 0 && df.count() <= 20)
    // out_rows is exactly cnt_a * cnt_b everywhere
    assert(df.filter(col("out_rows") =!= col("cnt_a") * col("cnt_b")).count() == 0)
    // shares are a fraction of a larger total
    assert(df.filter(col("share") <= 0.0 || col("share") > 1.0).count() == 0)
    // the profile is not a guess: run the real join for the top key and
    // count — it must equal the predicted out_rows
    val top = df.orderBy(col("out_rows").desc, col("user_id")).head()
    val (uid, predicted) = (top.getLong(0), top.getLong(3))
    val ev = graft.sources.Tables.events(spark, sf).filter(col("user_id") === uid)
    val split = lit("2024-01-16").cast("timestamp")
    val actual = ev.filter(col("ts") < split).as("a")
      .join(ev.filter(col("ts") >= split).as("b"),
        col("a.user_id") === col("b.user_id")).count()
    assert(actual == predicted, s"profile said $predicted, join produced $actual")
    df.unpersist()
  }

  test("mutual_info: cells are consistent and MI sits inside the binary-entropy bound") {
    val df = SparkEntry.queries("q_mutual_info")(spark, sf).cache()
    assert(df.count() == 5) // one row per event_type
    // present_conv is a sub-count of present
    assert(df.filter(col("present_conv") > col("present")).count() == 0)
    // 0 <= MI <= ln 2 for two binary variables (rounding can leave -0.0)
    assert(df.filter(col("mi_nats") < -1e-9 || col("mi_nats") > math.log(2.0))
      .count() == 0)
    df.unpersist()
  }

  test("table_diff: statuses partition the key union and 'added' keys truly have no old-window orders") {
    val df = SparkEntry.queries("q_table_diff")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(!col("status").isin("added", "removed", "changed")).count() == 0)
    // added rows carry no old state, removed rows no new state
    assert(df.filter(col("status") === "added" && col("old_n").isNotNull).count() == 0)
    assert(df.filter(col("status") === "removed" && col("new_n").isNotNull).count() == 0)
    // ground truth for 'added': keys with orders ONLY in the new window
    val o = graft.sources.Tables.orders(spark, sf)
    def win(lo: String, hi: String) = o
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .select(col("o_custkey").as("k")).distinct()
    val trueAdded = win("1996-01-01", "1999-01-01")
      .exceptAll(win("1995-01-01", "1998-01-01"))
    val reported = df.filter(col("status") === "added").select(col("k"))
    assert(reported.exceptAll(trueAdded).isEmpty && trueAdded.exceptAll(reported).isEmpty)
    // diff keys never exceed the union of both windows' keys
    val unionKeys = win("1995-01-01", "1999-01-01").count()
    assert(df.select(col("k")).distinct().count() <= unionKeys)
    df.unpersist()
  }
}
