package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Model-evaluation / statistical-inference batch (SURVEY §2
  * #154-156): exact ROC-AUC by rank statistic, chi-squared
  * independence, and a deterministic resampling bootstrap CI — the
  * readouts a team runs on top of the engine's features and
  * experiments (companions to #121 A/B lift, #145 mutual
  * information, #112/#151 drift).
  */
object Evaluation {

  /** #154 EXACT ROC-AUC via the Mann–Whitney rank statistic — does a
    * user's pre-cutoff view count predict conversion by the cutoff?
    * AUC = U/(n⁺n⁻) with U from the rank-sum over the pooled sample,
    * average ranks for ties (the exact tie-corrected estimator, not a
    * trapezoid approximation over picked thresholds).
    *
    * EXACT arithmetic: with average ranks, 2·ranksum is an integer —
    * per distinct score s: n⁺ₛ·(2·cumBeforeₛ + cntₛ + 1) — so the
    * statistic stays in integer cross-products until one final
    * division (the #151 KS argmax discipline applied to AUC).
    *
    * Scale shape: raw events collapse to one row per user in ONE
    * map-side agg; the rank-sum runs over the DISTINCT-SCORE frame
    * (value-domain-sized, not user-sized), so the only ordered window
    * is tiny. */
  def aucRank(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-03").cast("date")
    val users = Tables.events(s, dir)
      .filter(to_date(col("ts")) <= cutoff)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
    val byScore = users.groupBy(col("score"))
      .agg(sum(col("label")).as("np"),
        sum(lit(1L) - col("label")).as("nn"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byScore
      .withColumn("cumb", coalesce(sum(col("np") + col("nn")).over(w), lit(0L)))
      .select(
        (col("np") * (lit(2L) * col("cumb") + col("np") + col("nn") + 1L))
          .as("rs2"),
        col("np"), col("nn"))
    ranked.agg(sum(col("rs2")).as("rs2"),
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      .select(
        round((col("rs2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")),
          6).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** #155 CHI-SQUARED INDEPENDENCE — is market segment independent of
    * order priority? Pearson χ² = Σ (O−E)²/E over the 5×5 contingency
    * table, E = rowTot·colTot/N. The model-free categorical
    * association test next to #145's mutual information (MI ranks
    * features; χ² carries a significance scale via its dof).
    *
    * Float determinism: the cell terms are summed by an ORDERED
    * running cumsum over the (segment, priority)-sorted cell frame —
    * one fixed sequential order both engines replay exactly (the #124
    * EWMA idiom) — never a distributed double sum, whose addition
    * order is nondeterministic.
    *
    * Scale shape: the fact join collapses to contingency counts in
    * ONE map-side-combined agg; margins, expecteds and the ordered
    * cumsum all run on the cells² ≈ 25-row frame. */
  def chi2Independence(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint() // four tiny consumers below share it
    val rowTot = cells.groupBy(col("seg")).agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy(col("pri")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("seg")).as("nr"), countDistinct(col("pri")).as("nc"))
    val wOrd = Window.orderBy(col("seg"), col("pri"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = cells
      .join(broadcast(rowTot), "seg").join(broadcast(colTot), "pri")
      .crossJoin(broadcast(n))
      .withColumn("e", col("rt").cast("double") * col("ct").cast("double")
        / col("n").cast("double"))
      .withColumn("term",
        (col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
          / col("e"))
      .withColumn("chi2run", sum(col("term")).over(wOrd))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("seg").desc, col("pri").desc)))
    terms.filter(col("rn") === 1)
      .select(round(col("chi2run"), 6).as("chi2"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        col("n").as("n_obs"))
  }

  /** #156 BOOTSTRAP CONFIDENCE INTERVAL — per-segment mean order value
    * with a 95% CI from 64 DETERMINISTIC Bernoulli(1/2) half-sample
    * replicates (the resampling-bootstrap shape: replicate membership
    * decided row-locally by a seeded hash, so the whole resampling
    * study is one scan and fully replayable — rand() bootstraps
    * cannot be cross-checked). CI bounds are the 2nd/63rd order
    * statistics of the replicate means (2.5%/97.5% of 64).
    *
    * EXACT arithmetic: money sums in integer CENTS (the #146 table-
    * diff discipline — distributed double sums don't reproduce), each
    * replicate mean one fixed float expression over two exact
    * integers; order statistics tie-break on replicate id so both
    * engines pick identical rows.
    *
    * Scale shape: ONE md5 per fact row supplies all 64 replicate
    * membership bits (128 hash bits ≥ 64 Bernoulli(1/2) draws — a
    * per-(row, replicate) reseed would evaluate 64 hashes per row and
    * dominate the scan); only the ~32 KEPT replicate ids explode, and
    * they collapse in the map-side combine — each task ships ≤
    * 64×segments partial rows, the fact table is scanned ONCE and
    * never re-sampled per replicate (the Poisson-bootstrap property
    * that makes resampling feasible at 100 TB). */
  def bootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      // spread BEFORE the 64× expansion: AQE coalesces the small join
      // output to few partitions, which would run the whole replicate
      // generate stage on one core (measured 5×; at cluster scale it
      // idles every executor but one)
      .repartition(col("o_orderkey"))
      .localCheckpoint() // point estimate + replicate study share it
    // replicate r reads bit ((r-1) div 32) of hex digit ((r-1) mod 32)
    // of the row's single md5. Explode-then-WHERE, not a filter() HOF:
    // array higher-order lambdas are CodegenFallback (interpreted per
    // element), while the exploded predicate stays inside whole-stage
    // codegen — measured 4× on the 64×-row generate stage.
    val pos = pmod(col("rep") - 1, lit(32)).cast("int") + 1
    val a = ascii(col("h").substr(pos, lit(1)))
    val d = when(a >= 97, a - 87).otherwise(a - 48)
    val bit = when(((col("rep") - 1) / 32).cast("int") === 0, pmod(d, lit(2)))
      .otherwise(pmod((d / 2).cast("int"), lit(2)))
    val reps = base
      .withColumn("h",
        md5(concat(col("o_orderkey").cast("string"), lit(":bs"))))
      .select(col("seg"), col("cents"), col("h"),
        explode(sequence(lit(1), lit(64))).as("rep"))
      .filter(bit === 1)
      .groupBy(col("seg"), col("rep"))
      .agg(sum(col("cents")).as("sc"), count(lit(1)).as("cnt"))
      .select(col("seg"), col("rep"),
        (col("sc").cast("double") / 100.0 / col("cnt").cast("double"))
          .as("mean"))
    val wRep = Window.partitionBy(col("seg")).orderBy(col("mean"), col("rep"))
    val ci = reps.withColumn("rn", row_number().over(wRep))
      .groupBy(col("seg"))
      .agg(max(when(col("rn") === 2, col("mean"))).as("lo"),
        max(when(col("rn") === 63, col("mean"))).as("hi"),
        count(lit(1)).as("n_reps"))
    val point = base.groupBy(col("seg"))
      .agg(sum(col("cents")).as("sc"), count(lit(1)).as("cnt"))
      .select(col("seg"),
        (col("sc").cast("double") / 100.0 / col("cnt").cast("double"))
          .as("mean_value"), col("cnt").as("n_orders"))
    point.join(ci, "seg")
      .select(col("seg"), round(col("mean_value"), 6).as("mean_value"),
        col("n_orders"), round(col("lo"), 6).as("ci_lo"),
        round(col("hi"), 6).as("ci_hi"), col("n_reps"))
  }

  /** #158 CALIBRATION (reliability diagram) — the companion readout to
    * #154's AUC: AUC says the score RANKS well, calibration says the
    * score's LEVELS mean what they claim. Users are quintile-banded by
    * score (ntile tie-broken on (score, user_id) — the #129 decile
    * discipline, so band membership is deterministic in both engines)
    * and each band reports its mean score and observed conversion
    * rate; a well-calibrated score is monotone in both columns.
    *
    * Scale shape: events collapse to per-user (score, label) in ONE
    * map-side agg; the ntile window runs over the user frame, the
    * readout is one tiny hash agg. All ratios exact-integer until the
    * final rounded division. */
  def calibration(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-03").cast("date")
    val users = Tables.events(s, dir)
      .filter(to_date(col("ts")) <= cutoff)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
    val w = Window.orderBy(col("score"), col("user_id"))
    users.withColumn("band", ntile(5).over(w).cast("long"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("score")).as("ss"), sum(col("label")).as("sl"))
      .select(col("band"), col("n_users"),
        round(col("ss").cast("double") / col("n_users").cast("double"), 6)
          .as("mean_score"),
        round(col("sl").cast("double") / col("n_users").cast("double"), 6)
          .as("conv_rate"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_auc_rank"     -> aucRank _,
    "q_chi2_indep"   -> chi2Independence _,
    "q_bootstrap_ci" -> bootstrapCi _,
    "q_calibration"  -> calibration _)

  /** DuckDB replay of the per-row md5 bit bank: digit ((rep-1) mod 32)
    * decoded from hex, bit ((rep-1) div 32) tested. */
  private val repBit = {
    val a = "ascii(substr(h, ((rep - 1) % 32) + 1, 1))"
    val d = s"(CASE WHEN $a >= 97 THEN $a - 87 ELSE $a - 48 END)"
    s"(($d >> ((rep - 1) // 32)) & 1) = 1"
  }

  val oracles: Map[String, String] = Map(
    "q_auc_rank" ->
      """WITH u AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS score,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
        |  FROM events
        |  WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) <= DATE '2024-01-03'
        |  GROUP BY 1),
        |bs AS (SELECT score,
        |    CAST(SUM(label) AS BIGINT) AS np,
        |    CAST(SUM(1 - label) AS BIGINT) AS nn
        |  FROM u GROUP BY 1),
        |rk AS (SELECT np, nn,
        |    COALESCE(SUM(np + nn) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |  FROM bs),
        |agg AS (SELECT
        |    CAST(SUM(np * (2 * cumb + np + nn + 1)) AS BIGINT) AS rs2,
        |    CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(nn) AS BIGINT) AS n_neg
        |  FROM rk)
        |SELECT ROUND(CAST(rs2 - n_pos * (n_pos + 1) AS DOUBLE)
        |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc,
        |  n_pos, n_neg FROM agg""".stripMargin,
    "q_chi2_indep" ->
      """WITH cells AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        |    COUNT(*) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT pri, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    COUNT(DISTINCT seg) AS nr, COUNT(DISTINCT pri) AS nc FROM cells),
        |t AS (SELECT cells.seg, cells.pri,
        |    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |    * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS term
        |  FROM cells JOIN rt ON cells.seg = rt.seg
        |  JOIN ct ON cells.pri = ct.pri CROSS JOIN n),
        |run AS (SELECT
        |    SUM(term) OVER (ORDER BY seg, pri
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chi2run,
        |    ROW_NUMBER() OVER (ORDER BY seg DESC, pri DESC) AS rn
        |  FROM t)
        |SELECT ROUND(chi2run, 6) AS chi2,
        |  CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof, n AS n_obs
        |FROM run, n WHERE rn = 1""".stripMargin,
    "q_bootstrap_ci" ->
      s"""WITH base AS (SELECT c_mktsegment AS seg, o_orderkey,
         |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         |    md5(CAST(o_orderkey AS VARCHAR) || ':bs') AS h
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |reps AS (SELECT seg, rep,
         |    CAST(SUM(cents) AS BIGINT) AS sc, COUNT(*) AS cnt
         |  FROM base CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS rep)
         |  WHERE $repBit
         |  GROUP BY 1, 2),
         |means AS (SELECT seg, rep,
         |    CAST(sc AS DOUBLE) / 100.0 / CAST(cnt AS DOUBLE) AS mean
         |  FROM reps),
         |rk AS (SELECT seg, mean,
         |    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY mean, rep) AS rn
         |  FROM means),
         |ci AS (SELECT seg,
         |    MAX(CASE WHEN rn = 2 THEN mean END) AS lo,
         |    MAX(CASE WHEN rn = 63 THEN mean END) AS hi,
         |    COUNT(*) AS n_reps
         |  FROM rk GROUP BY 1),
         |pt AS (SELECT seg,
         |    CAST(SUM(cents) AS DOUBLE) / 100.0 / CAST(COUNT(*) AS DOUBLE)
         |      AS mean_value,
         |    COUNT(*) AS n_orders
         |  FROM base GROUP BY 1)
         |SELECT pt.seg, ROUND(mean_value, 6) AS mean_value, n_orders,
         |  ROUND(lo, 6) AS ci_lo, ROUND(hi, 6) AS ci_hi, n_reps
         |FROM pt JOIN ci ON pt.seg = ci.seg""".stripMargin,
    "q_calibration" ->
      """WITH u AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS score,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS label
        |  FROM events
        |  WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) <= DATE '2024-01-03'
        |  GROUP BY 1),
        |b AS (SELECT score, label,
        |    CAST(NTILE(5) OVER (ORDER BY score, user_id) AS BIGINT) AS band
        |  FROM u)
        |SELECT band, COUNT(*) AS n_users,
        |  ROUND(CAST(SUM(score) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS mean_score,
        |  ROUND(CAST(SUM(label) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS conv_rate
        |FROM b GROUP BY 1""".stripMargin)
}
