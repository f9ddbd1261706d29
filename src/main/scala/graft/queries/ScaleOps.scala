package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-technique batch (SURVEY §2 #98-102): the remaining
  * 100 TB-shape patterns not yet on the gated surface — mergeable
  * sketch partials (incremental COUNT(DISTINCT)), the banded
  * big-big range join, skew-salted aggregation, the
  * secondary-sort-by-aggregation timeline shape, and z-order
  * layout for file skipping.
  */
object ScaleOps {

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
    val B = 4 // band width (days), sized to the 2-day window
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
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hll_partials"   -> hllPartials _,
    "q_range_join"     -> rangeJoin _,
    "q_skew_agg"       -> skewAgg _,
    "q_event_timeline" -> eventTimeline _,
    "q_zorder_layout"  -> zorderLayout _,
    "q_session_stitch" -> sessionStitch _
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

  val oracles: Map[String, String] = Map(
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
    "q_session_stitch" -> Extras.oracles("q_session_windows")
  )
}
