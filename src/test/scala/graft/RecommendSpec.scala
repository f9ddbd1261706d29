package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RecommendSpec extends AnyFunSuite {
  import TestSpark._

  test("assoc_rules: both directions present, probabilities bounded, lift symmetric") {
    val df = SparkEntry.queries("q_assoc_rules")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.count() % 2 == 0, "each canonical pair must emit two directed rules")
    assert(df.filter(col("support") <= 0 || col("support") > 1).count() == 0)
    assert(df.filter(col("confidence") <= 0 || col("confidence") > 1).count() == 0)
    assert(df.filter(col("lift") <= 0).count() == 0)
    // lift is direction-invariant: a→b and b→a carry the same lift
    val fwd = df.select(col("antecedent").as("a"), col("consequent").as("b"), col("lift"))
    val bwd = df.select(col("consequent").as("a"), col("antecedent").as("b"),
      col("lift").as("lift_rev"))
    val joined = fwd.join(bwd, Seq("a", "b"))
    assert(joined.count() == df.count())
    assert(joined.filter(abs(col("lift") - col("lift_rev")) > 2e-6).count() == 0)
    df.unpersist()
  }

  test("assoc_rules: confidence replays as pair/antecedent frequency on a crafted basket set") {
    import spark.implicits._
    // orders: {1,2} ×3, {1,3} ×1 → rule 1→2: conf 3/4; rule 2→1: conf 3/3
    val b = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L)).toDF("l_orderkey", "l_partkey")
    val item = b.groupBy(col("l_partkey").as("item")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(item(1L) == 4 && item(2L) == 3)
    val pair = b.as("x").join(b.as("y"),
      col("x.l_orderkey") === col("y.l_orderkey") && col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey"), col("y.l_partkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pair((1L, 2L)) == 3)
    assert(math.abs(3.0 / item(1L) - 0.75) < 1e-12) // conf(1→2)
  }

  test("item_recs: at most 3 per antecedent, ranks contiguous, all lifts > 1") {
    val df = SparkEntry.queries("q_item_recs")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("lift") <= 1.0).count() == 0)
    val per = df.groupBy(col("antecedent"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("maxr"), min(col("rank")).as("minr"))
    assert(per.filter(col("n") > 3).count() == 0)
    assert(per.filter(col("minr") =!= 1 || col("maxr") =!= col("n")).count() == 0)
    df.unpersist()
  }
}
