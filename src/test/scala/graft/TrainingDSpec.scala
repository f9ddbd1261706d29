package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data batch D (#190-195): pass@k, arena win matrix,
  * Bradley-Terry ratings, SFT assembly, LSH parameter sweep,
  * truncated-embedding recall. */
class TrainingDSpec extends AnyFunSuite {
  import TestSpark._

  test("pass_at_k: matches an independent per-problem recompute and is monotone in k") {
    val df = SparkEntry.queries("q_pass_at_k")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(df.keySet == Set(1L, 2L, 4L))
    // independent recompute: collect (n, c) per problem, fold the
    // same ascending product in plain Scala doubles
    val per = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 10.0, 1L).otherwise(0L)).as("c"))
      .filter(col("n") >= 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    for (k <- Seq(1L, 2L, 4L)) {
      val nanos = per.map { case (n, c) =>
        val prod = (0L until k).foldLeft(1.0) { (acc, i) =>
          acc * ((n - c - i).toDouble / (n - i).toDouble)
        }
        math.rint((1.0 - prod) * 1e9).toLong
      }
      val (nProblems, nanoSum, _) = df(k)
      assert(nProblems == per.length)
      assert(nanoSum == nanos.sum, s"k=$k")
    }
    // pass@k is non-decreasing in k for every problem, so the mean is
    assert(df(1L)._3 <= df(2L)._3 && df(2L)._3 <= df(4L)._3)
  }

  test("win_matrix: pair totals account for every valid match; wilson bound below rate") {
    val df = SparkEntry.queries("q_win_matrix")(spark, sf).cache()
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "model_a < model_b")
      val (n, w) = (r.getLong(2), r.getLong(3))
      assert(w >= 0 && w <= n)
      val (rate, lo) = (r.getDouble(4), r.getDouble(5))
      assert(rate >= 0 && rate <= 1 && lo >= 0 && lo < rate + 1e-9)
    }
    // total matches = pairs of consecutive event_ids with distinct types
    val ev = graft.sources.Tables.events(spark, sf)
      .select(floor(col("event_id") / 2).cast("long").as("m"),
        col("event_id") % 2 as "side", col("event_type"))
    val expected = ev.groupBy("m")
      .agg(count(lit(1)).as("cnt"), count_distinct(col("event_type")).as("nt"))
      .filter(col("cnt") === 2 && col("nt") === 2).count()
    assert(rows.map(_.getLong(2)).sum == expected)
    df.unpersist()
  }

  test("bt_rating: both normalized rounds sum to ~1; totals mirror the win matrix") {
    val bt = SparkEntry.queries("q_bt_rating")(spark, sf).collect()
    assert(bt.length == 5)
    val s1 = bt.map(_.getDouble(3)).sum
    val s2 = bt.map(_.getDouble(4)).sum
    assert(math.abs(s1 - 1.0) < 5e-6 && math.abs(s2 - 1.0) < 5e-6)
    bt.foreach(r => assert(r.getDouble(4) > 0))
    val wm = SparkEntry.queries("q_win_matrix")(spark, sf).collect()
    // Σ_i n_matches(i) counts each match twice (once per side)
    assert(bt.map(_.getLong(1)).sum == 2 * wm.map(_.getLong(2)).sum)
    // Σ_i wins(i) counts each match once (exactly one winner)
    assert(bt.map(_.getLong(2)).sum == wm.map(_.getLong(2)).sum)
  }

  test("sft_assemble: counts, role alternation, and one group's exact reconstruction") {
    val df = SparkEntry.queries("q_sft_assemble")(spark, sf).cache()
    // n_turns == events that (user, day); n_chars == len(example)
    val ev = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("expect_turns"))
    assert(df.join(ev, Seq("user_id", "day"))
      .filter(col("n_turns") =!= col("expect_turns")).count() == 0)
    assert(df.filter(length(col("example")) =!= col("n_chars")).count() == 0)
    assert(df.filter(!col("example").startsWith("<|user|>")).count() == 0)
    // role alternation: user tags = ceil(n/2)
    val tagged = df.withColumn("n_user",
      (size(split(col("example"), "\\Q<|user|>\\E")) - 1).cast("long"))
    assert(tagged.filter(col("n_user") =!= ceil(col("n_turns") / lit(2.0)).cast("long"))
      .count() == 0)
    // exact reconstruction of the largest group, ordered by (ts, event_id)
    val top = df.orderBy(col("n_turns").desc, col("user_id"), col("day")).first()
    val turns = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") === top.getAs[Long]("user_id") &&
        to_date(col("ts")) === top.getAs[java.sql.Date]("day"))
      .select(col("ts"), col("event_id"),
        concat(col("event_type"), lit("="),
          col("value").cast("decimal(10,2)").cast("string")).as("piece"))
      .collect()
      .sortBy(r => (r.getTimestamp(0).getTime, r.getLong(1)))
      .zipWithIndex
      .map { case (r, i) =>
        (if (i % 2 == 0) "<|user|>" else "<|assistant|>") + r.getString(2)
      }.mkString("")
    assert(top.getAs[String]("example") == turns)
    df.unpersist()
  }

  test("lsh_param_sweep: recall/candidate monotone in permissiveness, planted recall high") {
    val rows = SparkEntry.queries("q_lsh_param_sweep")(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    def cands(r: Long) = rows(r).getAs[Long]("n_candidates")
    def recall(r: Long) = rows(r).getAs[Double]("recall_planted")
    // fewer rows per band = more bands of shorter keys = strictly more
    // permissive: candidate volume and planted recall both monotone
    assert(cands(1) >= cands(2) && cands(2) >= cands(4))
    assert(recall(1) >= recall(2) && recall(2) >= recall(4))
    assert(recall(1) > 0.9, "8 single-sig bands must catch planted dups")
    // the theoretical S-curve values are exact binary constants
    assert(rows(1L).getAs[Double]("p_collide_at_05") == 0.996094)
    assert(rows(2L).getAs[Double]("p_collide_at_05") == 0.683594)
    assert(rows(4L).getAs[Double]("p_collide_at_05") == 0.121094)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_verified") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("n_planted_found") <= r.getAs[Long]("n_planted"))
    }
  }

  test("trunc_recall: one row per probe, overlap consistent, some retrieval survives") {
    val rows = SparkEntry.queries("q_trunc_recall")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSet == (0L until 10L).toSet)
    rows.foreach { r =>
      val (ov, rec) = (r.getLong(1), r.getDouble(2))
      assert(ov >= 0 && ov <= 3)
      assert(math.abs(rec - ov / 3.0) < 1e-6)
    }
    assert(rows.map(_.getLong(1)).sum > 0,
      "half the dims must preserve some top-3 retrieval")
  }
}
