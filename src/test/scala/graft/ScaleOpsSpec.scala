package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("hll_partials: merged daily sketches ≡ a direct weekly sketch, and the gate holds") {
    val df = SparkEntry.queries("q_hll_partials")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("est_within_5pct") =!= 1).count() == 0)
    // HLL union at equal lgConfigK is LOSSLESS: merging the 7 daily
    // register files must equal sketching the week directly — not
    // approximately, identically
    val ev = graft.sources.Tables.events(spark, sf)
    val direct = ev
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week_start"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("direct_est"))
    val merged = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
      .groupBy(date_trunc("week", col("day")).cast("date").as("week_start"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"))
    assert(direct.join(merged, "week_start")
      .filter(col("direct_est") =!= col("merged_est")).count() == 0)
    df.unpersist()
  }

  test("range_join: banded plan ≡ naive non-equi join, with no nested-loop in the plan") {
    val banded = SparkEntry.queries("q_range_join")(spark, sf).cache()
    val anchor = lit("1995-01-01").cast("date")
    val lin = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .select(col("l_quantity"), datediff(to_date(col("l_shipdate")), anchor).as("ld"))
    val ord = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), datediff(to_date(col("o_orderdate")), anchor).as("od"))
    val naive = lin.join(ord, col("ld").between(col("od"), col("od") + 2))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped"), round(sum(col("l_quantity")), 6).as("sum_qty"))
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "banded range join must not fall back to a nested-loop plan")
    banded.unpersist()
  }

  test("skew_agg: salted two-stage ≡ direct one-stage aggregation") {
    val salted = SparkEntry.queries("q_skew_agg")(spark, sf)
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .select(col("event_type"), col("n_events"), col("sum_value"), col("n_users"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("event_timeline: order is deterministic under repartitioning") {
    // collect_list order is partition-dependent; sort_array must erase
    // that — the same user gets the same path_hash however the input
    // was distributed
    val a = SparkEntry.queries("q_event_timeline")(spark, sf)
      .select(col("user_id"), col("path_hash"), col("first_path"))
    val shuffled = graft.sources.Tables.events(spark, sf).repartition(7, col("event_id"))
    val seq0 = sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type"))))
    val b = shuffled.groupBy(col("user_id")).agg(seq0.as("seq"))
      .select(col("user_id"),
        array_join(slice(transform(col("seq"), x => x.getField("event_type")), 1, 10), ">")
          .as("first_path"),
        md5(array_join(transform(col("seq"), x => x.getField("event_id").cast("string")), ","))
          .as("path_hash"))
    assert(a.join(b, "user_id")
      .filter(a("path_hash") =!= b("path_hash") || a("first_path") =!= b("first_path"))
      .count() == 0)
  }

  test("session_stitch: incremental ≡ direct on the full surface, and midnight chains merge") {
    val inc = SparkEntry.queries("q_session_stitch")(spark, sf)
    val direct = SparkEntry.queries("q_session_windows")(spark, sf)
    assert(inc.exceptAll(direct).isEmpty && direct.exceptAll(inc).isEmpty)

    // crafted chain: one session spanning TWO midnights (23:50 → 00:10
    // → 23:55(+1) is separate, but 00:10 → 00:20 same session), plus an
    // isolated afternoon session — merge must produce exactly 3 sessions
    import spark.implicits._
    val ts = Seq(
      "2024-03-01 23:50:00", "2024-03-02 00:10:00", "2024-03-02 00:20:00", // spans midnight 1
      "2024-03-02 23:58:00", "2024-03-03 00:15:00",                         // spans midnight 2
      "2024-03-05 14:00:00")                                                // isolated
    val ev = ts.zipWithIndex
      .map { case (t, i) => (7L, i.toLong, java.sql.Timestamp.valueOf(t)) }
      .toDF("user_id", "event_id", "ts")
    val out = graft.operators.Sessionize.sessionWindowsIncremental(
      ev, "user_id", "ts", Seq(col("ts"), col("event_id")))
      .orderBy(col("session_id")).collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 3) // the midnight-1 chain merged
    assert(out(1).getAs[Long]("n_events") == 2) // the midnight-2 pair merged
    assert(out(2).getAs[Long]("n_events") == 1)
  }

  test("hll_rolling: gate holds, windows bounded at 7 days, ramp-up windows shorter") {
    val df = SparkEntry.queries("q_hll_rolling")(spark, sf).cache()
    assert(df.filter(col("est_within_5pct") =!= 1).count() == 0)
    assert(df.filter(col("n_days") > 7).count() == 0)
    // the first day's window can only contain 1 day
    val first = df.orderBy(col("win_end")).limit(1).head
    assert(first.getAs[Long]("n_days") == 1)
    df.unpersist()
  }

  test("scd2_intervals: runs partition the events, never repeat a state consecutively") {
    val df = SparkEntry.queries("q_scd2_intervals")(spark, sf).cache()
    val evTotal = graft.sources.Tables.events(spark, sf).count()
    assert(df.agg(sum(col("n_events"))).head.getLong(0) == evTotal)
    // consecutive runs of one user must differ in state (that is what
    // makes them runs), and intervals must chain: valid_to == next
    // valid_from
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    val chained = df
      .withColumn("next_state", lead(col("state"), 1).over(w))
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
    assert(chained.filter(col("next_state").isNotNull &&
      col("next_state") === col("state")).count() == 0)
    assert(chained.filter(col("next_from").isNotNull &&
      col("valid_to_us") =!= col("next_from")).count() == 0)
    // exactly one open interval (valid_to null) per user
    val open = df.filter(col("valid_to_us").isNull)
      .groupBy(col("user_id")).count().filter(col("count") =!= 1)
    assert(open.count() == 0)
    df.unpersist()
  }

  test("pagerank: rank mass is conserved and bounded below by the teleport") {
    val df = SparkEntry.queries("q_pagerank")(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    // with no dangling nodes (undirected graph), sum(rank) == N in
    // exact arithmetic at every iteration
    val mass = df.agg(sum(col("rank"))).head.getDouble(0)
    assert(math.abs(mass - n) < 1e-3 * n, s"mass $mass vs n $n")
    assert(df.filter(col("rank") < 0.15 - 1e-9).count() == 0)
    df.unpersist()
  }

  test("bm25: ranked docs contain query terms, scores non-increasing") {
    val df = SparkEntry.queries("q_bm25")(spark, sf).orderBy(col("rank")).collect()
    assert(df.length == 10)
    val scores = df.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0))
    // every ranked doc really contains at least one query term
    val ids = df.map(_.getAs[Long]("doc_id")).toSeq
    val hits = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids: _*))
      .filter(col("text").contains("vector") || col("text").contains("stream") ||
        col("text").contains("join"))
      .count()
    assert(hits == 10)
  }

  test("quantile_partials: estimate within half a bin of the ⌈n/2⌉ order statistic") {
    val df = SparkEntry.queries("q_quantile_partials")(spark, sf).cache()
    assert(df.count() > 0)
    val total = df.agg(sum(col("n"))).head.getLong(0)
    assert(total == graft.sources.Tables.events(spark, sf).count())
    // the value at rank ⌈n/2⌉ provably lies in the chosen bin: check
    // |est − that order statistic| ≤ binW/2 for every week
    val ev = graft.sources.Tables.events(spark, sf)
    val (lo, hi) = {
      val r = ev.agg(min(col("value")), max(col("value"))).head
      (r.getDouble(0), r.getDouble(1))
    }
    val binW = (hi - lo) / 512
    val weeks = df.collect().map(r =>
      r.getAs[java.sql.Date]("week_start").toString ->
        (r.getAs[Long]("n"), r.getAs[Double]("est_p50"))).toMap
    val byWeek = ev
      .select(date_trunc("week", col("ts")).cast("date").cast("string").as("w"), col("value"))
      .collect().groupBy(_.getString(0))
    weeks.foreach { case (wk, (n, est)) =>
      val sorted = byWeek(wk).map(_.getDouble(1)).sorted
      assert(sorted.length == n)
      val lowerMid = sorted(((n + 1) / 2).toInt - 1) // rank ⌈n/2⌉, 1-based
      assert(math.abs(est - lowerMid) <= binW / 2 + 1e-9,
        s"week $wk: est $est vs order stat $lowerMid (binW $binW)")
    }
    df.unpersist()
  }

  test("weighted_sample: reproducible, biased toward heavier docs") {
    val a = SparkEntry.queries("q_weighted_sample")(spark, sf)
    val b = SparkEntry.queries("q_weighted_sample")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty) // deterministic
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpusMean = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    val sampleMean = a.join(docs, "doc_id").agg(avg(col("n_chars"))).head.getDouble(0)
    // length-weighted sampling must overrepresent long documents
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("term_pmi: values match the definition, pairs are doc-level co-occurrences") {
    val df = SparkEntry.queries("q_term_pmi")(spark, sf).cache()
    assert(df.count() == 25)
    // recompute one pair's PMI from raw counts and compare
    val top = df.orderBy(col("pmi").desc, col("a"), col("b")).head
    val (ta, tb, pmi, cij) = (top.getAs[String]("a"), top.getAs[String]("b"),
      top.getAs[Double]("pmi"), top.getAs[Long]("cij"))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(array_distinct(split(col("text"), " ")).as("ts"))
    val n = docs.count()
    val ca = docs.filter(array_contains(col("ts"), ta)).count()
    val cb = docs.filter(array_contains(col("ts"), tb)).count()
    val both = docs.filter(array_contains(col("ts"), ta) &&
      array_contains(col("ts"), tb)).count()
    assert(both == cij)
    val expect = math.log(cij.toDouble * n / (ca.toDouble * cb))
    assert(math.abs(pmi - expect) < 1e-5, s"pmi $pmi vs recomputed $expect")
    df.unpersist()
  }

  test("ann_pq: codes are compact, ADC ranking finds real neighbors") {
    val df = SparkEntry.queries("q_ann_pq")(spark, sf).cache()
    assert(df.count() == 15) // 3 queries × top-5
    assert(df.filter(col("adist") < 0).count() == 0)
    // PQ is approximate, but with planted near-identical vectors the
    // exact nearest neighbour must surface in the PQ top-5 for at
    // least 2 of the 3 queries (ADC distance of a near-clone ≈ 0)
    val exact = SparkEntry.queries("q_ann_topk")(spark, sf)
      .filter(col("rank") === 1 && col("q_id") < 3)
      .select(col("q_id"), col("n_id").as("exact_nn"))
    val hit = df.join(exact, Seq("q_id"))
      .filter(col("n_id") === col("exact_nn"))
      .select(col("q_id")).distinct().count()
    assert(hit >= 2, s"PQ top-5 recovered the exact NN for only $hit/3 queries")
    df.unpersist()
  }

  test("psi_drift: contributions non-negative, stationary corpus shows no material drift") {
    val df = SparkEntry.queries("q_psi_drift")(spark, sf).cache()
    assert(df.count() > 0)
    // (p−q) and ln(p/q) always share sign → every contribution ≥ 0
    assert(df.filter(col("psi_contrib") < 0).count() == 0)
    val psi = df.agg(sum(col("psi_contrib"))).head.getDouble(0)
    // the synthetic generator is stationary: PSI must sit far below
    // the conventional 0.25 "significant drift" threshold
    assert(psi >= 0 && psi < 0.25, s"unexpected drift psi=$psi")
    df.unpersist()
  }

  test("topk_partials: sketch-pruned result ≡ full per-week threshold aggregation") {
    val pruned = SparkEntry.queries("q_topk_partials")(spark, sf)
    // the ground truth computed WITHOUT the sketch path
    val ev = graft.sources.Tables.events(spark, sf).select(
      date_trunc("week", col("ts")).cast("date").as("week_start"),
      concat(lit("v"), floor(col("value")).cast("long")).as("term"))
    val totals = ev.groupBy(col("week_start")).agg(count(lit(1)).as("total"))
    val full = ev.groupBy(col("week_start"), col("term")).agg(count(lit(1)).as("cnt"))
      .join(totals, "week_start")
      .filter(col("cnt") > col("total") / 96.0)
      .select(col("week_start"), col("term"), col("cnt"),
        round(col("cnt") / col("total"), 6).as("share"))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty,
      "merged daily MG partials must prune with NO false negatives above the threshold")
  }

  test("exact_median: histogram-selected value ≡ the global order statistic") {
    val df = SparkEntry.queries("q_exact_median")(spark, sf).cache()
    assert(df.count() == 1)
    val row = df.head
    val (n, k, med) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(k == (n + 1) / 2)
    // ground truth WITHOUT the two-pass path: the k-th value of the
    // full sort (single-partition window — test-scale only)
    import org.apache.spark.sql.expressions.Window
    val truth = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_extendedprice").as("v"))
      .withColumn("rn", row_number().over(Window.orderBy(col("v"))).cast("long"))
      .filter(col("rn") === k)
      .select(round(col("v"), 6)).head.getDouble(0)
    assert(med == truth, s"two-pass median $med != order statistic $truth")
    df.unpersist()
  }

  test("zorder_layout: every bucket is a ≤32-wide rectangle in BOTH dimensions") {
    // bucket = top 6 z-bits fixes each dimension's top 3 bits, so a
    // bucket can never span more than a 32-aligned block in u OR d —
    // the file-skipping guarantee a single-column sort cannot give
    val df = SparkEntry.queries("q_zorder_layout")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("u_span") > 31 || col("d_span") > 31).count() == 0)
    // and it partitions the data: bucket counts sum to the table count
    val total = df.agg(sum(col("n"))).head.getLong(0)
    assert(total == graft.sources.Tables.events(spark, sf).count())
    df.unpersist()
  }
}
