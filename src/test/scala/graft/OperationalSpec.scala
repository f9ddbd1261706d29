package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperationalSpec extends AnyFunSuite {
  import TestSpark._

  test("gap_fill: spine is dense per user, fills carry the last observed value") {
    val df = SparkEntry.queries("q_gap_fill")(spark, sf).cache()
    // dense + contiguous: per user, row count == day span, no dup days
    val span = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("day")).as("nd"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("expect"))
    assert(span.filter(col("n") =!= col("expect") || col("nd") =!= col("expect")).count() == 0)
    // filled rows contribute no events and are flagged unobserved
    assert(df.filter(col("is_observed") === 0 && col("n_events") =!= 0).count() == 0)
    // every unobserved row's ffill equals the most recent observed value
    // before it (recomputed independently via a self-join max-day lookup)
    val obs = df.filter(col("is_observed") === 1)
      .select(col("user_id"), col("day").as("obs_day"), col("value_ffill").as("obs_value"))
    val expected = df.filter(col("is_observed") === 0).alias("g")
      .join(obs.alias("o"),
        col("g.user_id") === col("o.user_id") && col("o.obs_day") < col("g.day"))
      .groupBy(col("g.user_id").as("user_id"), col("g.day").as("day"))
      .agg(max_by(col("o.obs_value"), col("o.obs_day")).as("expect_ffill"))
    val joined = df.filter(col("is_observed") === 0)
      .join(expected, Seq("user_id", "day"), "left")
    assert(joined.filter(col("value_ffill") =!= col("expect_ffill")).count() == 0)
    // a gap row before any observation would have a null ffill AND no match
    assert(joined.filter(col("expect_ffill").isNull && col("value_ffill").isNotNull).count() == 0)
    df.unpersist()
  }

  test("attribution: each model conserves total purchase count and revenue") {
    val df = SparkEntry.queries("q_attribution")(spark, sf).cache()
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("rev"))
      .head()
    df.groupBy(col("model"))
      .agg(sum(col("conversions")).as("n"), round(sum(col("revenue")), 4).as("rev"))
      .collect().foreach { r =>
        assert(r.getLong(1) == purchases.getLong(0), s"model ${r.getString(0)} lost conversions")
        assert(r.getDouble(2) == purchases.getDouble(1), s"model ${r.getString(0)} lost revenue")
      }
    assert(df.select("model").distinct().count() == 2)
    df.unpersist()
  }

  test("attribution: credit goes to the preceding touch, never the purchase itself") {
    import spark.implicits._
    // u1: click (Paid) then purchase -> both models Paid
    // u2: purchase with no prior touch, later a view -> Unassisted
    // u3: signup (Organic) then click (Paid) then purchase -> first Organic, last Paid
    val ev = Seq(
      ("e1", "u1", "click", "2024-01-01 00:00:00", 0.0),
      ("e2", "u1", "purchase", "2024-01-02 00:00:00", 10.0),
      ("e3", "u2", "purchase", "2024-01-01 00:00:00", 5.0),
      ("e4", "u2", "view", "2024-01-03 00:00:00", 0.0),
      ("e5", "u3", "signup", "2024-01-01 00:00:00", 0.0),
      ("e6", "u3", "click", "2024-01-02 00:00:00", 0.0),
      ("e7", "u3", "purchase", "2024-01-03 00:00:00", 7.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
      // raw events store ts as epoch NANOS (see Tables.events)
      .withColumn("ts", col("ts").cast("timestamp").cast("long") * lit(1000000000L))
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_attribution")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("first_touch", "Paid")) == ((1L, 10.0)))     // u1
    assert(out(("last_touch", "Paid")) == ((2L, 17.0)))      // u1 + u3 (click is latest touch)
    assert(out(("first_touch", "Unassisted")) == ((1L, 5.0))) // u2 (view came after)
    assert(out(("first_touch", "Organic")) == ((1L, 7.0)))   // u3 signup was first
  }

  test("rrf_fusion: fused scores decompose into independently recomputed arm ranks") {
    val df = SparkEntry.queries("q_rrf_fusion")(spark, sf).cache()
    assert(df.count() == 10)
    // rrf arithmetic is internally consistent with the rank columns
    val bad = df.filter(
      abs(col("rrf_score") -
        round(coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("sem_rank")), lit(0.0)), 6)) > 1e-12)
    assert(bad.count() == 0)
    // no row can miss both arms, and fused order follows the score
    assert(df.filter(col("lex_rank").isNull && col("sem_rank").isNull).count() == 0)
    val rows = df.orderBy(col("rank")).collect()
    assert(rows.map(_.getDouble(4)).sliding(2).forall(p => p(0) >= p(1)))
    // lexical ranks ≤ 10 agree with the standalone #107 bm25 ranking
    val bm = SparkEntry.queries("q_bm25")(spark, sf)
      .select(col("doc_id"), col("rank").as("bm_rank"))
    assert(df.filter(col("lex_rank") <= 10).join(bm, "doc_id")
      .filter(col("lex_rank") =!= col("bm_rank")).count() == 0)
    // semantic ranks agree with a brute-force cosine recompute
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.similarity.Embeddings.asDouble(col("embedding")).as("v"))
    val qv = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val semFull = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(graft.similarity.Embeddings.cosine(col("qv"), col("v")), 6).as("cos"))
      .withColumn("true_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cos").desc, col("doc_id"))))
    assert(df.filter(col("sem_rank").isNotNull).join(semFull, "doc_id")
      .filter(col("sem_rank") =!= col("true_rank")).count() == 0)
    df.unpersist()
  }

  test("anomaly_mad: flags match a direct recompute and zero-MAD stays quiet") {
    import spark.implicits._
    // metric A: constant 10 except one spike -> MAD 0, only the spike flags
    // metric B: alternating 8/12 -> MAD 2, nothing beyond 3*MAD=6 flags
    val rows = (1 to 9).map(d => ("A", f"2024-01-$d%02d 12:00:00", if (d == 5) 50 else 10)) ++
      (1 to 8).map(d => ("B", f"2024-02-$d%02d 12:00:00", if (d % 2 == 0) 12 else 8))
    val ev = rows.zipWithIndex.flatMap { case ((t, ts, n), i) =>
      (1 to n).map(j => (s"e$i-$j", s"u$j", t, ts, 1.0))
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
      // raw events store ts as epoch NANOS (see Tables.events)
      .withColumn("ts", col("ts").cast("timestamp").cast("long") * lit(1000000000L))
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_anomaly_mad")(spark, dir).cache()
    val flagged = out.filter(col("is_anomaly") === 1)
      .select(col("event_type"), col("n_events")).collect()
    assert(flagged.length == 1 && flagged.head.getString(0) == "A"
      && flagged.head.getLong(1) == 50L)
    // the constant days of A (deviation 0 <= eps) must NOT flag even with mad=0
    assert(out.filter(col("event_type") === "A" && col("n_events") === 10
      && col("is_anomaly") === 1).count() == 0)
    out.unpersist()
  }

  test("cdc_apply: survivors are exactly the keys whose LAST log op is not a delete") {
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("q_cdc_apply")(spark, sf).cache()
    // independent window-rank formulation of the same semantics
    val ev = graft.sources.Tables.events(spark, sf)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val want = ev
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && pmod(col("event_id"), lit(10)) =!= 0)
      .select(col("user_id"), col("event_type"), round(col("value"), 6).as("value"))
    assert(got.count() == want.count())
    assert(got.join(want, Seq("user_id", "event_type", "value"), "left_anti").count() == 0)
    // at least one key must actually be deleted for the test to bite
    val users = ev.select(col("user_id")).distinct().count()
    assert(got.count() < users, "fixture needs at least one deleted key")
    got.unpersist()
  }
}
