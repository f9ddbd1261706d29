package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Operational-diagnostics batch (SURVEY §2 #144-146): the checks an
  * engineer runs BEFORE and AFTER the expensive jobs — pre-join
  * cardinality/skew profiling (#144), information-theoretic feature
  * ranking (#145) and keyed snapshot diffing (#146).
  */
object Diagnostics {

  /** #144 JOIN EXPLOSION PROFILE — the diagnostic run before a big
    * join: for a planned A⋈B on `user_id` (here: first-half-month
    * events against second-half-month events, the backfill-join
    * shape), the per-key output multiplicity cnt_a·cnt_b, each key's
    * share of the total join output, and the top-20 contributors.
    * At 100 TB this one cheap pass decides salting/AQE-skew settings
    * and catches quadratic keys BEFORE the join runs, not after it
    * OOMs an executor.
    *
    * Scale shape: each side collapses to per-key counts in ONE
    * map-side-combined agg (key-count-sized, not row-sized); the
    * profile join is key-count vs key-count; the total is a tiny agg
    * broadcast back; top-20 is a distributed TakeOrderedAndProject,
    * never a global sort. */
  def joinExplosion(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val split = lit("2024-01-16").cast("timestamp")
    def side(p: Column, as: String) = ev.filter(p)
      .groupBy(col("user_id")).agg(count(lit(1)).as(as))
    val prof = side(col("ts") < split, "cnt_a")
      .join(side(col("ts") >= split, "cnt_b"), Seq("user_id"))
      .select(col("user_id"), col("cnt_a"), col("cnt_b"),
        (col("cnt_a") * col("cnt_b")).as("out_rows"))
    val total = prof.agg(sum(col("out_rows")).as("total_rows"))
    prof.crossJoin(broadcast(total))
      .select(col("user_id"), col("cnt_a"), col("cnt_b"), col("out_rows"),
        round(col("out_rows").cast("double") / col("total_rows"), 6).as("share"))
      .orderBy(col("out_rows").desc, col("user_id"))
      .limit(20)
  }

  /** #145 MUTUAL INFORMATION feature ranking — for each candidate
    * feature ("user had ≥1 event of type t with value > 200") its MI
    * in nats against the conversion target ("user's purchase value
    * total > 550"): the model-free feature-selection score computed
    * before any training run. Thresholds are value-qualified because
    * the synthetic data is dense (every user has every raw type — the
    * #130 lesson); cells are derived ARITHMETICALLY from present-side
    * counts (absent = total − present), so a user with zero events of
    * a type is a real has=0, not a missing row.
    *
    * Cross-engine determinism: every cell is an exact integer; the
    * four p·ln terms are added in one FIXED expression order (not a
    * SQL SUM over rows), so both engines evaluate identical IEEE
    * operations; 0·ln0 cells are guarded to 0.
    *
    * Scale shape: one map-side-combined agg builds per-user flags,
    * one tiny agg per type counts present-side cells, the user totals
    * broadcast back — events are scanned once and nothing row-sized
    * ever shuffles twice. */
  def mutualInfo(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val users = ev.groupBy(col("user_id")).agg(
      when(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(0.0))) > 550.0, 1L).otherwise(0L).as("conv"))
      .localCheckpoint() // feature-flag + totals consumers
    val tot = users.agg(count(lit(1)).as("n"), sum(col("conv")).as("n_conv"))
    // present-side cells per type: users with >=1 qualifying event
    val present = ev.filter(col("value") > 200.0)
      .select(col("user_id"), col("event_type")).distinct()
      .join(users.hint("shuffle_hash"), Seq("user_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("present"), sum(col("conv")).as("a"))
    def term(m: Column, rowT: Column, colT: Column, n: Column): Column =
      when(m > 0,
        (m.cast("double") / n) *
          log((m.cast("double") * n) / (rowT.cast("double") * colT)))
        .otherwise(lit(0.0))
    present.crossJoin(broadcast(tot))
      .select(col("event_type"), col("present"), col("a"),
        col("n"), col("n_conv"),
        (col("present") - col("a")).as("b"),
        (col("n_conv") - col("a")).as("c"),
        (col("n") - col("n_conv") - (col("present") - col("a"))).as("d"))
      .select(col("event_type"), col("present"), col("a").as("present_conv"),
        round(
          term(col("a"), col("present"), col("n_conv"), col("n")) +
          term(col("b"), col("present"), col("n") - col("n_conv"), col("n")) +
          term(col("c"), col("n") - col("present"), col("n_conv"), col("n")) +
          term(col("d"), col("n") - col("present"), col("n") - col("n_conv"),
            col("n")), 6).as("mi_nats"))
  }

  /** #146 KEYED TABLE DIFF — the added / removed / changed report
    * between two snapshots of a keyed aggregate state (per-customer
    * order count + revenue over two overlapping 3-year windows): the
    * audit query run on top of versioned tables (sources/Snapshots)
    * and CDC feeds (#142) to answer "what actually changed between
    * yesterday's publish and today's".
    *
    * Equality is classified on EXACT integers — order counts and
    * revenue in cents (`round(price·100)` summed as longs) — never on
    * rounded doubles, where engines could disagree at a half-even
    * boundary (the #127 drift lesson taken one step further).
    *
    * Scale shape: each snapshot is one map-side-combined agg over its
    * window (predicate pushed to the scan); the diff is a single
    * key-count-sized full outer join; `unchanged` keys are dropped so
    * output scales with the CHANGE volume, not the table. */
  def tableDiff(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val cents = round(col("o_totalprice") * 100).cast("long")
    def snap(lo: String, hi: String, pre: String) = o
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as(s"${pre}_n"), sum(cents).as(s"${pre}_cents"))
    val a = snap("1995-01-01", "1998-01-01", "old")
    val b = snap("1996-01-01", "1999-01-01", "new")
    a.join(b, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("old_n").isNull, "added")
          .when(col("new_n").isNull, "removed")
          .when(col("old_n") =!= col("new_n") ||
            col("old_cents") =!= col("new_cents"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_n"), col("new_n"),
        round(col("old_cents") / 100.0, 2).as("old_total"),
        round(col("new_cents") / 100.0, 2).as("new_total"))
      .filter(col("status") =!= "unchanged")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_explosion" -> joinExplosion _,
    "q_mutual_info"    -> mutualInfo _,
    "q_table_diff"     -> tableDiff _)

  val oracles: Map[String, String] = Map(
    "q_join_explosion" ->
      """WITH a AS (SELECT user_id, COUNT(*) AS cnt_a FROM events
        |  WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
        |b AS (SELECT user_id, COUNT(*) AS cnt_b FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1),
        |p AS (SELECT a.user_id, cnt_a, cnt_b, cnt_a * cnt_b AS out_rows
        |  FROM a JOIN b ON a.user_id = b.user_id),
        |t AS (SELECT SUM(out_rows) AS total_rows FROM p)
        |SELECT user_id, cnt_a, cnt_b, out_rows,
        |  ROUND(CAST(out_rows AS DOUBLE) / total_rows, 6) AS share
        |FROM p, t ORDER BY out_rows DESC, user_id LIMIT 20""".stripMargin,
    "q_mutual_info" ->
      """WITH u AS (SELECT user_id,
        |  CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN value
        |    ELSE 0 END) > 550.0 THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n, SUM(conv) AS n_conv FROM u),
        |pres AS (SELECT f.event_type, COUNT(*) AS present,
        |    CAST(SUM(u.conv) AS BIGINT) AS a
        |  FROM (SELECT DISTINCT user_id, event_type FROM events
        |    WHERE value > 200.0) f JOIN u ON f.user_id = u.user_id
        |  GROUP BY 1),
        |cells AS (SELECT event_type, present, a, n, n_conv,
        |    present - a AS b, n_conv - a AS c,
        |    n - n_conv - (present - a) AS d
        |  FROM pres, tot)
        |SELECT event_type, present, a AS present_conv, ROUND(
        |  (CASE WHEN a > 0 THEN (CAST(a AS DOUBLE) / n) *
        |    LN((CAST(a AS DOUBLE) * n) /
        |      (CAST(present AS DOUBLE) * n_conv)) ELSE 0.0 END) +
        |  (CASE WHEN b > 0 THEN (CAST(b AS DOUBLE) / n) *
        |    LN((CAST(b AS DOUBLE) * n) /
        |      (CAST(present AS DOUBLE) * (n - n_conv))) ELSE 0.0 END) +
        |  (CASE WHEN c > 0 THEN (CAST(c AS DOUBLE) / n) *
        |    LN((CAST(c AS DOUBLE) * n) /
        |      (CAST(n - present AS DOUBLE) * n_conv)) ELSE 0.0 END) +
        |  (CASE WHEN d > 0 THEN (CAST(d AS DOUBLE) / n) *
        |    LN((CAST(d AS DOUBLE) * n) /
        |      (CAST(n - present AS DOUBLE) * (n - n_conv)))
        |    ELSE 0.0 END), 6) AS mi_nats
        |FROM cells""".stripMargin,
    "q_table_diff" ->
      """WITH a AS (SELECT o_custkey AS k, COUNT(*) AS old_n,
        |  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS old_cents
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
        |b AS (SELECT o_custkey AS k, COUNT(*) AS new_n,
        |  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS new_cents
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1999-01-01' GROUP BY 1)
        |SELECT * FROM (
        |  SELECT COALESCE(a.k, b.k) AS k,
        |    CASE WHEN a.k IS NULL THEN 'added'
        |      WHEN b.k IS NULL THEN 'removed'
        |      WHEN a.old_n <> b.new_n OR a.old_cents <> b.new_cents
        |        THEN 'changed' ELSE 'unchanged' END AS status,
        |    a.old_n AS old_n, b.new_n AS new_n,
        |    ROUND(a.old_cents / 100.0, 2) AS old_total,
        |    ROUND(b.new_cents / 100.0, 2) AS new_total
        |  FROM a FULL OUTER JOIN b ON a.k = b.k) d
        |WHERE d.status <> 'unchanged'""".stripMargin)
}
