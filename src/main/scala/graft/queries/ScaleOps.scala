package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-technique batch (SURVEY §2 #98-112): the 100 TB-shape
  * patterns the earlier surface lacked — the incremental/partial
  * family (HLL sketch partials tumbling #98 and rolling #104,
  * histogram percentile partials #108, incremental sessionization
  * #103), the banded big-big range join #99, skew-salted
  * aggregation #100, ordered-sequence assembly #101, z-order layout
  * #102, SCD2 history #105, PageRank #106, BM25 retrieval #107,
  * weighted sampling #109, term-pair PMI #110,
  * product-quantization ANN #111, and PSI drift monitoring #112.
  */
object ScaleOps {

  /** Clamped fixed-width bin id over [lo, hi] (shared by #108 and
    * #112). A degenerate range (hi == lo) maps every value to bin 0
    * explicitly — the division would otherwise produce NaN on the
    * Spark side and a different NULL/error path in DuckDB. */
  private def binCol(value: Column, lo: Column, hi: Column, bins: Int): Column =
    when(hi === lo, lit(0)).otherwise(
      least(lit(bins - 1), floor((value - lo) / ((hi - lo) / bins)).cast("int")))

  /** The SQL mirror of [[binCol]], spliced into both oracles. */
  private def binSql(value: String, bins: Int): String =
    s"CASE WHEN hi = lo THEN 0 ELSE LEAST(${bins - 1}, " +
      s"CAST(FLOOR(($value - lo) / ((hi - lo) / $bins)) AS INT)) END"

  /** #98 INCREMENTAL DISTINCT via mergeable HLL sketch partials —
    * the pattern behind every "28-day MAU without re-scanning 28
    * days" job (the sketch counterpart of `q_user_rfe_partial`'s
    * exact partials): a daily job materializes ONE tiny HLL sketch
    * per day (`hll_sketch_agg`, a few KB), and any window rollup is
    * `hll_union_agg` over the stored partials — raw events are
    * scanned exactly once, ever.
    *
    * HLL union is lossless at equal lgConfigK (the merged register
    * file is identical to a direct sketch of the union), so the
    * merged weekly estimate carries the same rel-ε as a direct
    * weekly sketch; the spec asserts merged ≡ direct estimate
    * exactly. Gate follows the `q_approx_sketch` convention: exact
    * columns recomputed by the oracle + a 0/1 within-5% flag the
    * oracle expects to be constant 1.
    * (reference sql/mango_active_user_count.sql computes windowed
    * distincts by re-scanning the window; this is the incremental
    * re-expression.) */
  def hllPartials(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // the daily-partial materialization: one sketch row per day
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
    // window rollup touches ONLY the partials (7 tiny rows per week)
    val weekly = daily
      .groupBy(date_trunc("week", col("day")).cast("date").as("week_start"))
      .agg(hll_union_agg(col("sk")).as("sk"), count(lit(1)).as("n_days"))
      .withColumn("est", hll_sketch_estimate(col("sk")))
    // exact side for the tolerance gate only (the oracle recomputes it)
    val exact = ev
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week_start"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    weekly.join(exact, "week_start")
      .select(
        col("week_start"), col("n_days"), col("exact_users"),
        (abs(col("est") - col("exact_users")) / col("exact_users") <= 0.05)
          .cast("int").as("est_within_5pct"))
  }

  /** #99 banded big-big RANGE JOIN — lineitems shipped within each
    * urgent order's 3-day fulfilment window. Spark plans a raw
    * non-equi join as BroadcastNestedLoop (O(N·M) and
    * driver-memory-bound); the scale shape is BANDING: bucket the
    * date axis at ~window width, explode the SMALL side's interval
    * to the 1-2 buckets it covers (the big side is never exploded),
    * equi-join on bucket, then apply the precise range predicate as
    * a codegen filter. False-pair overhead is bounded by
    * (band + window) / band ≈ 2, independent of table sizes.
    * (range-in-effect variant of the `q_asof_join` temporal family;
    * reference joins are all equi — this is the brief's "operator
    * Spark lacks, composed from existing ops".) */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val B = 4 // band width (days), sized to the 3-day inclusive window
    val anchor = lit("1995-01-01").cast("date")
    val lin = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_quantity"),
        datediff(to_date(col("l_shipdate")), anchor).as("ld"))
      .withColumn("b", floor(col("ld") / B))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), anchor).as("od"))
      // interval [od, od+2] covers 1-2 bands: explode the small side
      .withColumn("b", explode(sequence(floor(col("od") / B),
        floor((col("od") + 2) / B))))
    lin.join(ord.hint("shuffle_hash"), "b")
      .filter(col("ld").between(col("od"), col("od") + 2))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped"),
        round(sum(col("l_quantity")), 6).as("sum_qty"))
  }

  /** #100 SKEW-SALTED aggregation — the two-stage shape for hot
    * grouping keys: `events` has ~5 event types, so a direct
    * groupBy hashes the whole table onto 5 reducers. Stage 1 salts
    * the key with pmod(user_id, 16) and partially aggregates
    * (16× the parallelism, map-side combined); stage 2 merges the
    * 5×16 partial rows. COUNT(DISTINCT) can't map-side combine at
    * all, so it goes two-phase the other way: distinct on the
    * (type, user) PAIR first — a well-distributed shuffle key —
    * then count per type. The oracle is the plain one-stage SQL,
    * proving salted ≡ direct.
    * (complements operators/Skew.scala's salted JOIN helper; AQE
    * handles skewed joins, but skewed AGGREGATION keys remain the
    * pipeline author's job at 100 TB.) */
  def skewAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"), col("value"))
    val merged = ev
      .withColumn("salt", pmod(col("user_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(col("value")).as("psum"), count(lit(1)).as("pn"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("psum")), 6).as("sum_value"),
        sum(col("pn")).as("n_events"))
    val users = ev.select(col("event_type"), col("user_id")).distinct()
      // count(col) skips a NULL user_id row, matching COUNT(DISTINCT)
      .groupBy(col("event_type")).agg(count(col("user_id")).as("n_users"))
    merged.join(users, "event_type")
      .select(col("event_type"), col("n_events"), col("sum_value"), col("n_users"))
  }

  /** #101 per-user ordered EVENT TIMELINE — the "assemble the
    * training transcript" shape: every interaction log, chunked
    * document, or conversation turn set becomes model input by
    * being reassembled in order per entity. The scale idiom is ONE
    * shuffle (groupBy user) + a ROW-LOCAL sort
    * (sort_array over the collected structs) — not a global orderBy
    * and not repartitionAndSortWithinPartitions with imperative
    * iterators. Struct sort order (ts, event_id, …) makes ties
    * deterministic; per-group memory is bounded by the per-user
    * event count, the same bound the streaming sessionizer carries.
    * (reference sql/mango_user_rfe_daily_session.sql orders
    * per-user events with a window; this is the collect-side dual
    * that emits the sequence itself.) */
  def eventTimeline(s: SparkSession, dir: String): DataFrame = {
    val seq0 = sort_array(collect_list(struct(
      col("ts"), col("event_id"), col("event_type"))))
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(seq0.as("seq"))
      .select(
        col("user_id"),
        size(col("seq")).cast("long").as("n_events"),
        array_join(slice(transform(col("seq"),
          x => x.getField("event_type")), 1, 10), ">").as("first_path"),
        md5(array_join(transform(col("seq"),
          x => x.getField("event_id").cast("string")), ",")).as("path_hash"))
  }

  /** #102 Z-ORDER layout — multi-dimensional data clustering for
    * file skipping (the technique behind Delta/Iceberg OPTIMIZE
    * ZORDER): interleaving the bits of (user_id, day-of-year) gives
    * a 1-D sort key whose contiguous blocks are RECTANGLES in both
    * dimensions, so file-level min/max stats prune reads filtered
    * on EITHER column. A single-column sort gives one narrow span
    * and leaves the other column full-width in every file; the
    * interleave bounds both. Bucket = top 6 z-bits ⇒ each dim's top
    * 3 bits are fixed per bucket ⇒ every span ≤ 31 of 256 (the spec
    * asserts exactly that). Everything is row-local bit math on the
    * scan — the report is one hash agg; writing with
    * `partitionBy(bucket)` / repartitionByRange(z) turns the same
    * key into the physical layout. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val u = pmod(col("user_id"), lit(256))
    val d = pmod(dayofyear(col("ts")), lit(256))
    val z = (0 until 8).map { i =>
      shiftright(u, i).bitwiseAND(lit(1)) * lit(1L << (2 * i)) +
        shiftright(d, i).bitwiseAND(lit(1)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    Tables.events(s, dir)
      .select(shiftright(z, 10).as("bucket"), u.as("u"), d.as("d"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        (max(col("u")) - min(col("u"))).as("u_span"),
        (max(col("d")) - min(col("d"))).as("d_span"))
  }

  /** #103 INCREMENTAL sessionization — each day sessionized
    * independently (the stored daily-job pass), then a boundary
    * stitch merges cross-midnight sessions via a connected-component
    * resolve over SESSION nodes (users-active-at-midnight scale, not
    * events). Gate: the oracle is the full-history direct
    * sessionization — incremental ≡ direct is the whole claim.
    * (incremental counterpart of #53 `q_session_windows`, the same
    * move #29b makes for RFE and #98 makes for COUNT(DISTINCT).) */
  def sessionStitch(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.sessionWindowsIncremental(
      Tables.events(s, dir), "user_id", "ts", Seq(col("ts"), col("event_id")))

  /** #104 ROLLING-window distinct from daily sketch partials — the
    * 7-day rolling "WAU per day" that #98's tumbling weeks can't
    * express and exact COUNT(DISTINCT) can't merge: each day's HLL
    * partial is exploded to the ≤7 windows it feeds (an explode on
    * TINY sketch rows — that being cheap is the entire point) and
    * unioned per window end. Raw events are still scanned exactly
    * once. Gate per the #49/#98 convention (exact columns + a
    * constant-1 within-5% flag); the Spark exact side works on the
    * distinct (day, user) pairs, also one scan. */
  def hllRolling(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
    val realDays = daily.select(col("day").as("win_end"))
    // each daily partial feeds windows ending day..day+6
    val contrib = daily
      .select(col("day"), col("sk"), explode(sequence(lit(0), lit(6))).as("k"))
      .select(date_add(col("day"), col("k")).as("win_end"), col("sk"))
    val rolled = contrib.groupBy(col("win_end"))
      .agg(hll_union_agg(col("sk")).as("sk"), count(lit(1)).as("n_days"))
      .join(realDays, Seq("win_end"), "left_semi") // only days that exist
      .withColumn("est", hll_sketch_estimate(col("sk")))
    // exact side for the gate: distinct (day, user) pairs (tiny) take
    // the same explode
    val exact = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .select(col("day"), col("user_id"), explode(sequence(lit(0), lit(6))).as("k"))
      .select(date_add(col("day"), col("k")).as("win_end"), col("user_id"))
      .groupBy(col("win_end"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    rolled.join(exact, "win_end")
      .select(col("win_end"), col("n_days"), col("exact_users"),
        (abs(col("est") - col("exact_users")) / col("exact_users") <= 0.05)
          .cast("int").as("est_within_5pct"))
  }

  /** #105 SCD2 interval construction — the warehouse
    * slowly-changing-dimension build: a per-entity state stream
    * (event_type here) collapses into [valid_from, valid_to)
    * intervals, one row per RUN of equal consecutive states,
    * valid_to = the next run's start (null while current). One
    * shuffle (entity-partitioned window), run-collapse is a lag
    * compare + cumulative flag sum — the standard change-capture
    * shape for dimension history at any scale.
    * (reference tasks/revenue.py do_updates_inserts keeps only the
    * LATEST row per key; SCD2 is the full-history counterpart.) */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("is_new",
        // null-safe IS DISTINCT FROM (a null state is a state): the
        // oracle's IS DISTINCT FROM has these exact semantics
        when(!(lag(col("event_type"), 1).over(w) <=> col("event_type")), 1L)
          .otherwise(0L))
      .withColumn("run_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"), col("event_type").as("state"))
      .agg(min(col("us")).as("valid_from_us"), count(lit(1)).as("n_events"))
    // run_id in the order makes the lead deterministic when two runs
    // share a start microsecond (same-ts events split across runs)
    val ws = Window.partitionBy(col("user_id")).orderBy(col("valid_from_us"), col("run_id"))
    runs.select(col("user_id"), col("run_id"), col("state"), col("valid_from_us"),
      lead(col("valid_from_us"), 1).over(ws).as("valid_to_us"), col("n_events"))
  }

  /** #106 PAGERANK (3 damped iterations, d=0.85) over the
    * co-purchase graph: parts are linked when they appear in the
    * same order. The iterative-graph family beyond connected
    * components — each round is ONE shuffle join (ranks onto edges
    * by src) + ONE map-side-combined agg (contributions by dst);
    * degree rides the edge frame so no per-round degree join;
    * `localCheckpoint` truncates per-round lineage exactly like the
    * CC resolve loop. No driver-side graph state; the oracle
    * replays all three rounds as chained CTEs. Isolated parts
    * (never co-purchased) have no edges and are excluded on both
    * sides. */
  def pagerank(s: SparkSession, dir: String): DataFrame =
    pagerankRun(GraphCore.copurchaseEdges(s, dir),
      tol = None, maxRounds = 3)._1
      .select(col("id").as("part"), round(col("r"), 6).as("rank"))

  /** Tolerance / round cap of `q_pagerank_converged` — shared by the
    * Spark loop and the oracle's unrolled replay. */
  private[graft] val (prTol, prCap) = (0.02, 12)

  /** #106b PAGERANK RUN-TO-CONVERGENCE (`q_pagerank_converged`) —
    * the early-stopping mode of [[pagerankRun]] exercised end-to-end
    * against the oracle: iterate until max |Δrank| < tol (one scalar
    * aggregate per round — the driver sees a single double, never
    * graph data), capped at [[prCap]] rounds; every output row
    * carries the stop round so the oracle must agree on WHEN the
    * loop stopped, not just on the final ranks. The oracle unrolls
    * all capped rounds as chained CTEs, computes each round's delta
    * scalar, and selects the first round whose delta clears the
    * same tolerance — replaying the stopping rule, not trusting
    * ours. At scale this is the mode that saves the tail rounds a
    * fixed-k run would burn after the ranks have settled. */
  def pagerankConverged(s: SparkSession, dir: String): DataFrame = {
    val (ranks, rounds) = pagerankRun(GraphCore.copurchaseEdges(s, dir),
      tol = Some(prTol), maxRounds = prCap)
    ranks.select(col("id").as("part"), round(col("r"), 6).as("rank"))
      .withColumn("n_rounds", lit(rounds.toLong))
  }

  /** The PageRank loop behind #106, with an optional RUN-TO-
    * CONVERGENCE mode: when `tol` is set, each round also computes
    * max |Δrank| as ONE scalar aggregate (the CC resolver's
    * bounded-loop discipline — the driver sees a single double per
    * round, never graph data) and the loop stops early once the
    * ranks have settled below the tolerance. With `tol = None` the
    * plan is EXACTLY the fixed-round #106 shape (no probe join), so
    * the gated oracle is untouched.
    *
    * Returns (ranks, roundsRun). */
  private[graft] def pagerankRun(ed: DataFrame, tol: Option[Double],
      maxRounds: Int): (DataFrame, Int) = {
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // degree attached to the edge ONCE — rounds never re-join it.
    // persist (not localCheckpoint): the cached plan KEEPS its
    // hash(src) output partitioning, so each round's join reuses it
    // and only the small rank frame shuffles; a checkpoint would
    // erase the partitioning and re-shuffle every edge every round
    val edges = ed.join(deg.hint("shuffle_hash"), "src").persist()
    var ranks = deg.select(col("src").as("id"), lit(1.0).as("r")).localCheckpoint()
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      // eager per-round localCheckpoint: ranks are node-count-sized
      // (small); truncating their lineage is what lets edges
      // unpersist safely after the loop
      val next = edges.join(ranks.hint("shuffle_hash"), col("src") === col("id"))
        .groupBy(col("dst"))
        .agg((lit(0.15) + lit(0.85) * sum(col("r") / col("deg"))).as("r"))
        .select(col("dst").as("id"), col("r"))
        .localCheckpoint()
      rounds += 1
      tol.foreach { t =>
        // distributed convergence probe: node-sized join, scalar out
        val delta = next
          .join(ranks.select(col("id"), col("r").as("r0")).hint("shuffle_hash"), "id")
          .agg(max(abs(col("r") - col("r0")))).head.getDouble(0)
        converged = delta < t
      }
      ranks = next
    }
    edges.unpersist(blocking = false) // final ranks are materialized
    (ranks, rounds)
  }

  /** #107 BM25 retrieval — rank documents for a query term set with
    * the Okapi/Lucene scoring the retrieval side of a data stack
    * runs: idf·tf·(k1+1) / (tf + k1·(1−b+b·len/avglen)), k1=1.2,
    * b=0.75. All per-doc term frequencies are ROW-LOCAL array
    * filters (no posting-list explode for a 3-term query); N, avglen
    * and the per-term dfs are ONE tiny aggregate broadcast back; the
    * top-10 is a distributed TakeOrderedAndProject on the ROUNDED
    * score (+ doc_id tie-break) so both engines select identically.
    * Ranking selection at scale ships k rows per partition, never a
    * global sort. */
  def bm25(s: SparkSession, dir: String): DataFrame = bm25TopK(s, dir, 10)

  /** BM25 ranking at an arbitrary depth — #107 uses k=10; the hybrid
    * fusion query (#117) reuses the identical scoring at k=20 so both
    * arms of the fused ranker share one implementation. */
  private[queries] def bm25TopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val terms = Seq("vector", "stream", "join")
    val (k1, b) = (1.2, 0.75)
    val toks = split(col("text"), " ")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("toks"), size(toks).cast("double").as("len"))
    val withTf = terms.zipWithIndex.foldLeft(docs) { case (d, (t, i)) =>
      d.withColumn(s"tf$i",
        size(filter(col("toks"), x => x === lit(t))).cast("double"))
    }.drop("toks")
    // N, avglen, per-term dfs: one aggregate row, broadcast back
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("len")).as("avglen") +:
      terms.indices.map(i => sum((col(s"tf$i") > 0).cast("double")).as(s"df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val idf = log(
        (col("n_docs") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0)
      idf * col(s"tf$i") * (k1 + 1) /
        (col(s"tf$i") + (col("len") / col("avglen") * b + (1 - b)) * k1)
    }.reduce(_ + _)
    scored
      .select(col("doc_id"), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id")))) // k rows — trivial
      .select(col("rank").cast("long").as("rank"), col("doc_id"), col("score"))
  }

  /** #108 MERGEABLE PERCENTILE PARTIALS — the missing member of the
    * incremental family (#29b exact sums, #98/#104 distinct
    * sketches): exact percentiles can't merge across stored
    * partials, fixed-bin HISTOGRAMS can. A daily job stores 512-bin
    * counts (bounded rows/day regardless of event volume); any
    * window percentile is then a cumsum inversion over merged bin
    * counts — raw events scanned once ever. The inversion is
    * integer-exact, so the gate is a FULL hash compare: the oracle
    * replays the binning, merge and inversion verbatim (no
    * tolerance). The value at rank ⌈n/2⌉ provably lies in the chosen
    * bin (cum_prev < n/2 ≤ cum), so the estimate is within half a
    * bin of that order statistic — asserted in the spec. */
  def quantilePartials(s: SparkSession, dir: String): DataFrame = {
    val bins = 512
    val ev = Tables.events(s, dir).select(col("ts"), col("value"))
    // global range: one tiny scalar agg, broadcast
    val range = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val binned = ev.crossJoin(broadcast(range))
      .select(date_trunc("week", col("ts")).cast("date").as("week_start"),
        binCol(col("value"), col("lo"), col("hi"), bins).as("bin"),
        col("lo"), col("hi"))
    // the daily-partial shape: bounded (day, bin) count rows; merged
    // here straight to weeks (a second tiny agg over partials)
    val weekly = binned.groupBy(col("week_start"), col("bin"))
      .agg(count(lit(1)).as("c"), first(col("lo")).as("lo"), first(col("hi")).as("hi"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("week_start")).orderBy(col("bin"))
    val est = weekly
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("total", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("week_start"))))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("week_start"))
      .agg(min(col("bin")).as("med_bin"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        first(col("total")).as("n"))
      .withColumn("est",
        col("lo") + (col("med_bin") + 0.5) * ((col("hi") - col("lo")) / bins))
    est.select(col("week_start"), col("n"), col("med_bin").cast("long").as("med_bin"),
      round(col("est"), 6).as("est_p50"))
  }

  /** #109 WEIGHTED sampling without replacement
    * (Efraimidis–Spirakis 2006): key = −ln(u)/w with u a
    * deterministic md5-uniform in (0,1]; the k smallest keys are an
    * exact weighted sample. Selection is the bounded map-side
    * [[graft.plans.TopKAgg]] — k rows per map task cross the
    * shuffle, the corpus never sorts. Here: 20 documents weighted
    * by length (the "sample long docs more" curation knob), fully
    * reproducible — the oracle replays key arithmetic bit-for-bit
    * and ranks with a window. */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 20
    val h = md5(concat(col("doc_id").cast("string"), lit(":ws")))
    val hex = "0123456789abcdef"
    // 8 hex digits → uniform integer in [0, 16^8); +1 keeps u > 0
    val hv = (1 to 8).map(i =>
      (instr(lit(hex), substring(h, i, 1)) - 1).cast("double")
        * math.pow(16, 8 - i)).reduce(_ + _)
    val u = (hv + 1) / math.pow(16, 8)
    val key = -log(u) / col("n_chars").cast("double")
    Tables.documents(s, dir)
      .select(lit(1).as("g"), (-key).as("score"), col("doc_id").cast("long"))
      .as[(Int, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(k).toColumn)
      .flatMap { case (_, top) =>
        top.zipWithIndex.map { case ((score, id), i) => ((i + 1).toLong, id, -score) }
      }
      .toDF("rank", "doc_id", "key")
      // same HALF_UP rounding path as every other oracle-compared float
      .withColumn("key", round(col("key"), 6))
  }

  /** #110 term-pair PMI (pointwise mutual information) over
    * documents — the corpus-statistics operator behind collocation
    * mining and embedding-evaluation probes: PMI(i,j) =
    * ln(N·C(i,j) / (C(i)·C(j))) over per-doc DISTINCT terms.
    * Scale shape: the vocabulary is first cut to terms with df ≥ 50
    * (one map-side agg, broadcast back as a semi-join); pair
    * enumeration is then ROW-LOCAL over each doc's ≤V_hot retained
    * terms (flatten/transform over the sorted array — no self-join
    * of the posting list); pair counting is one map-side-combined
    * hash agg. Top-25 pairs by PMI with df tie-breaks. */
  def termPmi(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("terms"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    // df threshold RELATIVE to corpus size (10% of docs) so the
    // operator behaves identically across scale factors
    val df = docs.select(explode(col("terms")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= col("n") / 10.0)
      .select(col("t"), col("df"))
    // keep only hot terms per doc (row-local after a broadcast semi)
    val hotSet = df.select(col("t"))
    val kept = docs.select(col("doc_id"), explode(col("terms")).as("t"))
      .join(broadcast(hotSet), Seq("t"), "left_semi")
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("t"))).as("ts"))
      .filter(size(col("ts")) >= 2) // sequence(0, n-2) needs n ≥ 2
    // row-local ordered pair enumeration: (ts[i], ts[j]) for i < j —
    // two Generates (posexplode + explode of the strictly-later tail)
    // instead of array lambdas, which run interpreted
    // (CodegenFallback); same pairs inside whole-stage codegen (the
    // r13 GraphCore treatment)
    val pairs = kept.select(col("ts"), posexplode(col("ts")))
      .select(col("col").as("a"),
        explode(slice(col("ts"), col("pos") + 2,
          greatest(size(col("ts")) - col("pos") - 1, lit(0)))).as("b"))
    val cij = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cij"))
    val dfa = df.select(col("t").as("a"), col("df").as("ca"))
    val dfb = df.select(col("t").as("b"), col("df").as("cb"))
    cij.join(broadcast(dfa), "a").join(broadcast(dfb), "b")
      .crossJoin(broadcast(nDocs))
      .select(col("a"), col("b"),
        round(log(col("cij") * col("n") / (col("ca") * col("cb"))), 6).as("pmi"),
        col("cij"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(25)
  }

  /** #111 PRODUCT-QUANTIZATION ANN (Jégou et al. 2011) — the vector
    * compression missing between #69's int8 scalar quant and #57's
    * IVF: 64 dims split into M=8 subspaces, a K=16 codebook per
    * subspace trained with one Lloyd round from fixed seed vectors
    * (ids 0-15), every vector encoded to 8 small codes, and queries
    * answered with ASYMMETRIC DISTANCE COMPUTATION: a per-query
    * (M×K) distance TABLE is built against the codebook (M·K rows
    * per query — tiny, broadcast) and each corpus vector's distance
    * is the sum of 8 table lookups — the corpus moves as codes,
    * never as floats. All assignment argmins are
    * min(struct(dist, code)) (lexicographic, deterministic), and the
    * final ranking orders on the ROUNDED distance (the #107
    * convention) so both engines break near-ties identically; the
    * bounded map-side TopKAgg selects. The oracle replays seeding,
    * the Lloyd round, encoding and the ADC lookup verbatim. */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (m8, k16) = (8, 16)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val sub = e.select(col("vec_id"),
      explode(array((0 until m8).map(m =>
        struct(lit(m).as("m"), slice(col("v"), m * 8 + 1, 8).as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))
    def dist2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
    // seed codebook: the sub-vectors of vectors 0..15
    val seeds = sub.filter(col("vec_id") < k16)
      .select(col("m"), col("vec_id").cast("int").as("c"), col("sv").as("cv"))
    // one Lloyd round: assign to seeds, recompute subspace means
    val a0 = sub.join(broadcast(seeds), "m")
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(dist2(col("sv"), col("cv")).as("d"), col("c"))).as("mn"))
      .select(col("vec_id"), col("m"), col("mn.c").as("c"))
    val dimSums = (0 until 8).map(j =>
      avg(element_at(col("sv"), j + 1)).as(s"s$j"))
    // the trained codebook is tiny (M×K rows) and feeds BOTH the
    // corpus encoding and every query's distance table — stage it
    // once so the Lloyd chain (and its embeddings scans) doesn't
    // replay per consumer
    val cb = sub.join(a0.hint("shuffle_hash"), Seq("vec_id", "m"))
      .groupBy(col("m"), col("c"))
      .agg(dimSums.head, dimSums.tail: _*)
      .select(col("m"), col("c"),
        array((0 until 8).map(j => col(s"s$j")): _*).as("cv"))
      .persist() // tiny (M×K rows); lost blocks recompute from lineage
    // encode the corpus against the trained codebook
    val codes = sub.join(broadcast(cb), "m")
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(dist2(col("sv"), col("cv")).as("d"), col("c"))).as("mn"))
      .select(col("vec_id"), col("m"), col("mn.c").as("c"))
    // ADC: per-query (m, c) distance table — M×K×queries tiny rows
    val dtab = sub.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("m"), col("sv"))
      .join(broadcast(cb), "m")
      .select(col("q_id"), col("m"), col("c"), dist2(col("sv"), col("cv")).as("d"))
    val adist = codes.join(broadcast(dtab), Seq("m", "c"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      // rank on the ROUNDED distance: summation order differs across
      // engines, and an ulp flip at the top-5 boundary must not
      // change the selection
      .agg(round(sum(col("d")), 6).as("adist"))
    adist.select(col("q_id"), (-col("adist")).as("score"), col("vec_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(5).toColumn)
      .flatMap { case (q, top) =>
        top.zipWithIndex.map { case ((score, id), i) =>
          (q, (i + 1).toLong, id, -score) }
      }
      .toDF("q_id", "rank", "n_id", "adist")
  }

  /** #112 PSI DRIFT detection — the population-stability-index
    * monitor a production pipeline runs before trusting a new
    * period's data (the distribution-shape complement of the
    * volume-drift check in validation/Checks): `value` is binned
    * into 10 fixed buckets over the global range, the first and
    * last 7-day periods are share-compared per bin, and
    * PSI = Σ (p−q)·ln(p/q) with +1 Laplace smoothing (identical in
    * both engines, no zero-share singularity). ONE scan computes
    * both periods' bin counts as conditional aggregates; range and
    * period bounds are two broadcast scalar rows. */
  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val bins = 10
    val ev = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("value"))
    val bounds = ev.agg(
      min(col("value")).as("lo"), max(col("value")).as("hi"),
      min(col("day")).as("d0"), max(col("day")).as("d1"))
    val binned = ev.crossJoin(broadcast(bounds))
      .select(
        binCol(col("value"), col("lo"), col("hi"), bins).as("bin"),
        (col("day") < date_add(col("d0"), 7)).as("in_a"),
        (col("day") >= date_add(col("d1"), -6)).as("in_b"))
    val counts = binned.groupBy(col("bin"))
      .agg(sum(col("in_a").cast("long")).as("n_a"),
        sum(col("in_b").cast("long")).as("n_b"))
    val totals = counts.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    counts.crossJoin(broadcast(totals))
      .select(col("bin").cast("long").as("bin"), col("n_a"), col("n_b"),
        round((((col("n_a") + 1) / (col("ta") + bins)) -
          ((col("n_b") + 1) / (col("tb") + bins))) *
          log(((col("n_a") + 1) / (col("ta") + bins)) /
            ((col("n_b") + 1) / (col("tb") + bins))), 6).as("psi_contrib"))
  }

  /** #113 WINDOWED HEAVY HITTERS from stored daily sketch partials —
    * the top-k member of the incremental family (#98 distinct, #108
    * percentiles): a daily job stores ONE ≤k-entry Misra-Gries
    * summary per day; any window's candidate set is a merge of the
    * stored partials ([[graft.plans.MgMergeAgg]] — mergeable with
    * no false negatives above N/(k+1), Agarwal et al. 2012), and
    * one exact recount over candidates confirms, so the OUTPUT is
    * exact (k=128 covers the N/96 threshold with margin; the
    * sketch only prunes — the #75/#96 philosophy). Raw events feed
    * the sketch path once ever; per-week heavy value buckets with
    * count > weekly_total/96. */
  def topkPartials(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 128
    val ev = Tables.events(s, dir).select(
      to_date(col("ts")).cast("string").as("day"),
      date_trunc("week", col("ts")).cast("date").cast("string").as("week"),
      // floor(value) as the term: its distribution is skewed and
      // SF-invariant, so the heavy set stays non-trivial at every
      // scale factor (per-user shares would shrink as users grow)
      concat(lit("v"), floor(col("value")).cast("long")).as("term"))
    // the stored daily partials: one bounded summary per (week, day)
    val daily = ev.as[(String, String, String)]
      .groupByKey(t => (t._2, t._1))
      .mapValues(_._3)
      .agg(graft.plans.HeavyHittersAgg(k).toColumn)
    // window rollup merges ONLY the partials (≤ 7 summaries per week)
    val cands = daily
      .groupByKey(_._1._1)
      .mapValues(_._2)
      .agg(graft.plans.MgMergeAgg(k).toColumn)
      .flatMap { case (week, summary) => summary.keysIterator.map(week -> _) }
      .toDF("week", "term")
    // exact recount over candidates; totals are per-week scalars
    val counts = ev.groupBy(col("week"), col("term")).agg(count(lit(1)).as("cnt"))
      .join(cands.hint("shuffle_hash"), Seq("week", "term"), "left_semi")
    val totals = ev.groupBy(col("week")).agg(count(lit(1)).as("total"))
    counts.join(broadcast(totals), "week")
      .filter(col("cnt") > col("total") / 96.0)
      .select(col("week").cast("date").as("week_start"), col("term"), col("cnt"),
        round(col("cnt") / col("total"), 6).as("share"))
  }

  /** #143 EXACT DISTRIBUTED MEDIAN — the k-th order statistic with NO
    * global sort and NO single-node value buffer (what Spark's exact
    * `percentile` does: every value into one aggregation buffer — the
    * cost `q_approx_sketch` measures). Two passes:
    *  1. a map-side-combined HISTOGRAM (fixed-width buckets) + a
    *     cumsum over the tiny bucket frame locates the bucket holding
    *     rank k and the offset within it;
    *  2. a second scan keeps ONLY that bucket's values (predicate on
    *     the scan) and ranks the small subset to pick the offset-th.
    * The within-bucket rank is a single-partition window over ONE
    * bucket (~n/buckets rows; a skewed bucket would recurse the same
    * split — one level suffices here). This is the selection-algorithm
    * shape Chaudhuri-style distributed quantile engines run.
    * Everything is exact — the oracle is the plain ROW_NUMBER order
    * statistic. */
  def exactMedian(s: SparkSession, dir: String): DataFrame = {
    val bucket = floor(col("v") / lit(100.0)).as("b")
    val vals = Tables.lineitem(s, dir).select(col("l_extendedprice").as("v"))
    val nk = vals.agg(count(lit(1)).as("n"))
      .select(col("n"), floor((col("n") + 1) / lit(2.0)).cast("long").as("k"))
    val hist = vals.groupBy(bucket).agg(count(lit(1)).as("c"))
    val wb = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
    val target = hist
      .withColumn("before", coalesce(sum(col("c")).over(wb), lit(0L)))
      .crossJoin(broadcast(nk))
      .filter(col("before") < col("k") && col("before") + col("c") >= col("k"))
      .select(col("b"), (col("k") - col("before")).as("off"), col("n"), col("k"))
    val w1 = Window.partitionBy(col("b")).orderBy(col("v"))
    vals.join(broadcast(target), bucket === col("b"))
      .withColumn("rn", row_number().over(w1).cast("long"))
      .filter(col("rn") === col("off"))
      .select(col("n"), col("k"), round(col("v"), 6).as("exact_median"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_exact_median"   -> exactMedian _,
    "q_hll_partials"   -> hllPartials _,
    "q_range_join"     -> rangeJoin _,
    "q_skew_agg"       -> skewAgg _,
    "q_event_timeline" -> eventTimeline _,
    "q_zorder_layout"  -> zorderLayout _,
    "q_session_stitch" -> sessionStitch _,
    "q_hll_rolling"    -> hllRolling _,
    "q_scd2_intervals" -> scd2Intervals _,
    "q_pagerank"       -> pagerank _,
    "q_pagerank_converged" -> pagerankConverged _,
    "q_bm25"           -> bm25 _,
    "q_quantile_partials" -> quantilePartials _,
    "q_weighted_sample" -> weightedSample _,
    "q_term_pmi"       -> termPmi _,
    "q_ann_pq"         -> annPq _,
    "q_psi_drift"      -> psiDrift _,
    "q_topk_partials"  -> topkPartials _
  )

  /** The z-value bit-interleave replayed as explicit shift/mask sums
    * (same constants as the Spark plan). */
  private def zorderOracle: String = {
    val terms = (0 until 8).map { i =>
      s"((u >> $i) & 1) * ${1L << (2 * i)} + ((d >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("\n|      + ")
    s"""WITH b AS (SELECT user_id % 256 AS u, dayofyear(ts) % 256 AS d FROM events),
       |z AS (SELECT u, d,
       |      $terms AS z
       |  FROM b)
       |SELECT z >> 10 AS bucket, COUNT(*) AS n,
       |  MAX(u) - MIN(u) AS u_span, MAX(d) - MIN(d) AS d_span
       |FROM z GROUP BY 1""".stripMargin
  }

  /** The BM25 oracle replay as a reusable CTE chain ending in
    * `bm25_ranked(rank, doc_id, score)` — shared by the #107 gate and
    * the #117 fusion gate so both verify the same scoring. */
  private[queries] def bm25OracleCtes(k: Int): String = {
    val terms = Seq("vector", "stream", "join")
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf$i"
    }.mkString(", ")
    val dfs = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0 END) AS df$i").mkString(", ")
    val score = terms.indices.map { i =>
      s"""ln((n_docs - df$i + 0.5) / (df$i + 0.5) + 1.0) * tf$i * 2.2
         | / (tf$i + 1.2 * (0.25 + 0.75 * len / avglen))""".stripMargin
    }.mkString("\n|    + ")
    s"""bm25_t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |bm25_f AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS len, $tfs FROM bm25_t),
       |bm25_st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(len) AS avglen,
       |  $dfs FROM bm25_f),
       |bm25_sc AS (SELECT doc_id, ROUND(
       |    $score, 6) AS score
       |  FROM bm25_f, bm25_st),
       |bm25_top AS (SELECT doc_id, score FROM bm25_sc WHERE score > 0
       |  ORDER BY score DESC, doc_id LIMIT $k),
       |bm25_ranked AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
       |      AS rank, doc_id, score
       |  FROM bm25_top)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_exact_median" ->
      """WITH v AS (SELECT l_extendedprice AS v FROM lineitem),
        |nk AS (SELECT COUNT(*) AS n,
        |  CAST(FLOOR((COUNT(*) + 1) / 2.0) AS BIGINT) AS k FROM v),
        |r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM v)
        |SELECT nk.n, nk.k, ROUND(r.v, 6) AS exact_median
        |FROM r, nk WHERE r.rn = nk.k""".stripMargin,
    // tolerance gate (q_approx_sketch convention): exact columns
    // recomputed; the 0/1 flag is constant 1 when the merged sketch
    // holds its rel-ε
    "q_hll_partials" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
        |  COUNT(DISTINCT date_trunc('day', ts)) AS n_days,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  1 AS est_within_5pct
        |FROM events GROUP BY 1""".stripMargin,
    "q_range_join" ->
      """SELECT o_orderkey, COUNT(*) AS n_shipped,
        |  ROUND(SUM(l_quantity), 6) AS sum_qty
        |FROM orders JOIN lineitem
        |  ON l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 2 DAY
        |WHERE o_orderpriority = '1-URGENT' AND l_returnflag = 'R'
        |GROUP BY 1""".stripMargin,
    "q_skew_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  ROUND(SUM(value), 6) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,
    "q_event_timeline" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  array_to_string(
        |    (list(event_type ORDER BY ts, event_id))[1:10], '>') AS first_path,
        |  md5(array_to_string(
        |    list(CAST(event_id AS VARCHAR) ORDER BY ts, event_id), ',')) AS path_hash
        |FROM events GROUP BY 1""".stripMargin,
    "q_zorder_layout" -> zorderOracle,
    // the incremental path must reproduce the direct full-history
    // sessionization bit-for-bit — same oracle as q_session_windows
    "q_session_stitch" -> Extras.oracles("q_session_windows"),
    "q_hll_rolling" ->
      """WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM d),
        |w AS (SELECT a.day AS win_end, b.user_id, b.day AS src_day
        |  FROM days a JOIN d b ON b.day BETWEEN a.day - 6 AND a.day)
        |SELECT win_end, COUNT(DISTINCT src_day) AS n_days,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  1 AS est_within_5pct
        |FROM w GROUP BY 1""".stripMargin,
    "q_scd2_intervals" ->
      """WITH g AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |r AS (SELECT user_id, event_type, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM g),
        |s AS (SELECT user_id, run_id, event_type AS state,
        |    MIN(us) AS valid_from_us, COUNT(*) AS n_events
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT user_id, CAST(run_id AS BIGINT) AS run_id, state, valid_from_us,
        |  LEAD(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, run_id) AS valid_to_us,
        |  n_events
        |FROM s""".stripMargin,
    "q_bm25" ->
      s"""WITH ${bm25OracleCtes(10)}
         |SELECT rank, doc_id, score FROM bm25_ranked""".stripMargin,
    // replays the histogram build, merge and cumsum inversion
    // verbatim — the gate is exact, no tolerance column
    "q_quantile_partials" ->
      s"""WITH r AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
        |b AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
        |    ${binSql("value", 512)} AS bin,
        |    lo, hi
        |  FROM events, r),
        |wk AS (SELECT week_start, bin, lo, hi, COUNT(*) AS c
        |  FROM b GROUP BY 1, 2, 3, 4),
        |cm AS (SELECT week_start, bin, lo, hi, c,
        |    SUM(c) OVER (PARTITION BY week_start ORDER BY bin
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(c) OVER (PARTITION BY week_start) AS total
        |  FROM wk),
        |m AS (SELECT week_start, MIN(bin) AS med_bin,
        |    MIN(lo) AS lo, MIN(hi) AS hi, MIN(total) AS n
        |  FROM cm WHERE cum * 2 >= total GROUP BY 1)
        |SELECT week_start, CAST(n AS BIGINT) AS n,
        |  CAST(med_bin AS BIGINT) AS med_bin,
        |  ROUND(lo + (med_bin + 0.5) * ((hi - lo) / 512), 6) AS est_p50
        |FROM m""".stripMargin,
    // the sketch only PRUNES (no false negatives above the
    // threshold), so plain threshold SQL is the oracle
    "q_topk_partials" ->
      """WITH e AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
        |    'v' || CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR) AS term
        |  FROM events),
        |t AS (SELECT week_start, COUNT(*) AS total FROM e GROUP BY 1),
        |c AS (SELECT week_start, term, COUNT(*) AS cnt FROM e GROUP BY 1, 2)
        |SELECT c.week_start, term, cnt,
        |  ROUND(cnt * 1.0 / total, 6) AS share
        |FROM c JOIN t USING (week_start) WHERE cnt > total / 96.0""".stripMargin,
    "q_psi_drift" ->
      s"""WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi,
        |    MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        |  FROM events),
        |x AS (SELECT
        |    ${binSql("value", 10)} AS bin,
        |    CAST(ts AS DATE) < d0 + 7 AS in_a,
        |    CAST(ts AS DATE) >= d1 - 6 AS in_b
        |  FROM events, b),
        |c AS (SELECT bin,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS n_a,
        |    SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS n_b
        |  FROM x GROUP BY 1),
        |t AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM c)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  ROUND((((n_a + 1.0) / (ta + 10)) - ((n_b + 1.0) / (tb + 10)))
        |    * ln(((n_a + 1.0) / (ta + 10)) / ((n_b + 1.0) / (tb + 10))), 6)
        |    AS psi_contrib
        |FROM c, t""".stripMargin,
    // replays PQ end-to-end: seed codebook from vecs 0-15, one Lloyd
    // round per subspace, corpus encoding, per-query ADC tables
    "q_ann_pq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sub AS (SELECT vec_id, m, v[(m*8 + 1):(m*8 + 8)] AS sv
        |  FROM e, (SELECT unnest(range(0, 8)) AS m)),
        |seeds AS (SELECT m, CAST(vec_id AS INT) AS c, sv AS cv
        |  FROM sub WHERE vec_id < 16),
        |a0 AS (SELECT vec_id, m, c, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id, m
        |    ORDER BY list_sum(list_transform(range(1, 9),
        |      j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))), c) AS rn
        |  FROM sub JOIN seeds USING (m)),
        |asg AS (SELECT vec_id, m, c FROM a0 WHERE rn = 1),
        |cbl AS (SELECT m, c, j, AVG(sv[j]) AS mv
        |  FROM sub JOIN asg USING (vec_id, m),
        |    (SELECT unnest(range(1, 9)) AS j)
        |  GROUP BY 1, 2, 3),
        |cb AS (SELECT m, c, list(mv ORDER BY j) AS cv FROM cbl GROUP BY 1, 2),
        |enc0 AS (SELECT vec_id, m, c, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id, m
        |    ORDER BY list_sum(list_transform(range(1, 9),
        |      j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))), c) AS rn
        |  FROM sub JOIN cb USING (m)),
        |codes AS (SELECT vec_id, m, c FROM enc0 WHERE rn = 1),
        |dtab AS (SELECT s.vec_id AS q_id, s.m, cb.c,
        |    list_sum(list_transform(range(1, 9),
        |      j -> (s.sv[j] - cb.cv[j]) * (s.sv[j] - cb.cv[j]))) AS d
        |  FROM sub s JOIN cb USING (m) WHERE s.vec_id < 3),
        |ad AS (SELECT dtab.q_id, codes.vec_id, ROUND(SUM(dtab.d), 6) AS adist
        |  FROM codes JOIN dtab ON codes.m = dtab.m AND codes.c = dtab.c
        |  WHERE codes.vec_id <> dtab.q_id
        |  GROUP BY 1, 2),
        |r AS (SELECT q_id, vec_id, adist, ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY adist, vec_id) AS rank FROM ad)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id AS n_id, adist
        |FROM r WHERE rank <= 5""".stripMargin,
    "q_weighted_sample" -> {
      val weights = Seq(268435456L, 16777216L, 1048576L, 65536L, 4096L, 256L, 16L, 1L)
      val terms = weights.zipWithIndex.map { case (w, i) =>
        s"(strpos('0123456789abcdef', substr(hh, ${i + 1}, 1)) - 1) * $w"
      }.mkString("\n|    + ")
      s"""WITH h AS (SELECT doc_id, n_chars,
         |  md5(CAST(doc_id AS VARCHAR) || ':ws') AS hh FROM documents),
         |v AS (SELECT doc_id, n_chars,
         |    $terms AS hv
         |  FROM h),
         |k AS (SELECT doc_id,
         |    -ln((hv + 1) / 4294967296.0) / n_chars AS rawkey FROM v),
         |r AS (SELECT doc_id, rawkey,
         |    ROW_NUMBER() OVER (ORDER BY rawkey, doc_id) AS rank FROM k)
         |SELECT CAST(rank AS BIGINT) AS rank, doc_id, ROUND(rawkey, 6) AS key
         |FROM r WHERE rank <= 20""".stripMargin
    },
    "q_term_pmi" ->
      """WITH t AS (SELECT doc_id,
        |    list_distinct(string_split(text, ' ')) AS terms FROM documents),
        |n AS (SELECT COUNT(*) AS n FROM t),
        |e AS (SELECT doc_id, unnest(terms) AS tm FROM t),
        |df AS (SELECT tm, COUNT(*) AS df FROM e GROUP BY 1),
        |hot AS (SELECT tm, df FROM df, n WHERE df >= n / 10.0),
        |ke AS (SELECT e.doc_id, e.tm FROM e JOIN hot ON e.tm = hot.tm),
        |p AS (SELECT x.tm AS a, y.tm AS b
        |  FROM ke x JOIN ke y ON x.doc_id = y.doc_id AND x.tm < y.tm),
        |cij AS (SELECT a, b, COUNT(*) AS cij FROM p GROUP BY 1, 2),
        |j AS (SELECT a, b,
        |    ROUND(ln(cij * n.n * 1.0 / (ha.df * hb.df)), 6) AS pmi, cij
        |  FROM cij
        |  JOIN hot ha ON cij.a = ha.tm
        |  JOIN hot hb ON cij.b = hb.tm, n)
        |SELECT a, b, pmi, cij FROM j ORDER BY pmi DESC, a, b LIMIT 25""".stripMargin,
    "q_pagerank" -> {
      val rounds = (1 to 3).map { i =>
        s"""r$i AS (SELECT ed.dst AS id, 0.15 + 0.85 * SUM(r${i - 1}.r / ed.deg) AS r
           |  FROM ed JOIN r${i - 1} ON ed.src = r${i - 1}.id GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |p AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |e AS (SELECT pa AS src, pb AS dst FROM p
         |  UNION ALL SELECT pb, pa FROM p),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg ON e.src = deg.src),
         |r0 AS (SELECT src AS id, 1.0 AS r FROM deg),
         |$rounds
         |SELECT id AS part, ROUND(r, 6) AS rank FROM r3""".stripMargin
    },
    "q_pagerank_converged" -> {
      // MULTI-STATEMENT oracle: each round is a materialized TEMP
      // TABLE, not a nested CTE — the 12-round unrolled-CTE form made
      // DuckDB re-derive every upstream round per reference and blew
      // its temp disk at sf0.1 (~1.3 s as staged tables). The driver's
      // DuckDB runner executes ';'-separated statements and compares
      // the final SELECT.
      val cap = prCap
      val roundStmts = (1 to cap).map { i =>
        s"""CREATE OR REPLACE TEMP TABLE pr_r$i AS
           |  SELECT ed.dst AS id, 0.15 + 0.85 * SUM(p.r / ed.deg) AS r
           |  FROM pr_ed ed JOIN pr_r${i - 1} p ON ed.src = p.id GROUP BY 1;
           |CREATE OR REPLACE TEMP TABLE pr_d$i AS
           |  SELECT $i AS i, MAX(ABS(a.r - b.r)) AS d
           |  FROM pr_r$i a JOIN pr_r${i - 1} b ON a.id = b.id""".stripMargin
      }.mkString(";\n")
      val unionR = (1 to cap)
        .map(i => s"SELECT $i AS i, id, r FROM pr_r$i").mkString(" UNION ALL ")
      val unionD = (1 to cap)
        .map(i => s"SELECT i, d FROM pr_d$i").mkString(" UNION ALL ")
      s"""CREATE OR REPLACE TEMP TABLE pr_e AS
         |  WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |  p AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
         |    FROM li a JOIN li b
         |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
         |  SELECT pa AS src, pb AS dst FROM p UNION ALL SELECT pb, pa FROM p;
         |CREATE OR REPLACE TEMP TABLE pr_deg AS
         |  SELECT src, COUNT(*) AS deg FROM pr_e GROUP BY 1;
         |CREATE OR REPLACE TEMP TABLE pr_ed AS
         |  SELECT e.src, e.dst, d.deg FROM pr_e e JOIN pr_deg d ON e.src = d.src;
         |CREATE OR REPLACE TEMP TABLE pr_r0 AS
         |  SELECT src AS id, 1.0 AS r FROM pr_deg;
         |$roundStmts;
         |SELECT a.id AS part, ROUND(a.r, 6) AS rank, stop.n AS n_rounds
         |FROM ($unionR) a,
         |  (SELECT CAST(COALESCE(MIN(i), $cap) AS BIGINT) AS n
         |   FROM ($unionD) ds WHERE d < $prTol) stop
         |WHERE a.i = stop.n""".stripMargin
    }
  )
}
