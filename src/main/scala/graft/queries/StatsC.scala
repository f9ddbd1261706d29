package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Statistical-monitoring batch C (SURVEY §2 #151-152): exact
  * two-sample Kolmogorov–Smirnov drift (#151) — the unbinned
  * complement to #112 PSI's binned score — and a Kaplan–Meier
  * survival curve with right-censoring (#152), the churn analysis
  * a retention dashboard actually needs once "still active" users
  * stop being countable as deaths.
  */
object StatsC {

  /** #151 EXACT TWO-SAMPLE KS DRIFT — the Kolmogorov–Smirnov statistic
    * D = max|F1(v) − F2(v)| between the value distributions of the
    * first and second half-month of events, computed over the EXACT
    * empirical CDFs (no binning — PSI #112 answers "how much drift in
    * my bins", KS answers "is there drift anywhere, and at what
    * value").
    *
    * Scale shape: the naive exact KS is a GLOBAL ordered cumsum over
    * distinct values — a single-partition sort. This is the #141
    * split/carry decomposition applied to CDFs: per-value counts in
    * one map-side agg (group-count-sized), values bucketed into
    * fixed-width ranges, each bucket cumsums LOCALLY in parallel, and
    * the carry-in (totals of all lower buckets) comes from a
    * bucket-count-sized frame broadcast back. The argmax is exact
    * INTEGER arithmetic — |c1·N2 − c2·N1| — so no float comparison
    * decides the winner (products stay in long range up to ~10⁹-row
    * samples per side; a 100 TB deployment widens to decimal(38), the
    * shape is unchanged). Ties break to the smallest value. */
  def ksDrift(s: SparkSession, dir: String): DataFrame = {
    val split = lit("2024-01-16").cast("timestamp")
    val counts = Tables.events(s, dir)
      .groupBy(col("value").as("v"))
      .agg(sum(when(col("ts") < split, 1L).otherwise(0L)).as("n1"),
        sum(when(col("ts") >= split, 1L).otherwise(0L)).as("n2"))
    val tot = counts.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    val bucketed = counts.withColumn("bkt", floor(col("v") / 10.0).cast("long"))
    val wLoc = Window.partitionBy(col("bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("c1", sum(col("n1")).over(wLoc))
      .withColumn("c2", sum(col("n2")).over(wLoc))
    // carry-in per bucket: cumsum over the tiny bucket-total frame
    val wCarry = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bucketed.groupBy(col("bkt"))
      .agg(sum(col("n1")).as("b1"), sum(col("n2")).as("b2"))
      .select(col("bkt"),
        coalesce(sum(col("b1")).over(wCarry), lit(0L)).as("p1"),
        coalesce(sum(col("b2")).over(wCarry), lit(0L)).as("p2"))
    local.join(broadcast(carry), Seq("bkt"))
      .crossJoin(broadcast(tot))
      .select(col("v"),
        abs((col("p1") + col("c1")) * col("t2") -
          (col("p2") + col("c2")) * col("t1")).as("dnum"),
        col("t1"), col("t2"))
      .orderBy(col("dnum").desc, col("v"))
      .limit(1)
      .select(
        round(col("dnum").cast("double") /
          (col("t1").cast("double") * col("t2").cast("double")), 6).as("d_stat"),
        col("v").as("at_value"),
        col("t1").as("n_first"), col("t2").as("n_second"))
  }

  /** #152 KAPLAN–MEIER SURVIVAL — time-to-first-purchase with
    * RIGHT-CENSORING, analyzed as of an interim cutoff date: users
    * whose first purchase lands on/before the cutoff are events
    * ("deaths") at t = purchase − first-seen days; everyone else
    * observed by the cutoff is CENSORED at t = cutoff − first-seen —
    * still at risk, not a failure. That censored/dead distinction is
    * what makes naive "average days to convert" numbers wrong on an
    * in-flight experiment and KM the standard estimator. At each
    * death time t: S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/rᵢ), rᵢ = subjects with
    * observed time ≥ tᵢ (dead or censored — same-time censorings
    * count as at-risk, the standard convention).
    *
    * Determinism: deaths and at-risk counts are exact integers (the
    * at-risk series is N − cumsum via one tiny window, the #141
    * carry idiom in miniature); the product is exp(Σ ln(·)) over the
    * death-time frame in one fixed frame order — the #124 EWMA
    * precedent for windowed float determinism — with the d = r
    * boundary (a true zero factor) handled exactly by a windowed
    * flag rather than ln(0).
    *
    * Scale shape: raw events collapse to one row per user in ONE
    * map-side agg; everything after is distinct-time-sized
    * (≤ observation window in days). */
  def survivalKm(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-03").cast("date")
    val life = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("b"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("p"))
      .filter(col("b") <= cutoff)
      .select(
        when(col("p").isNotNull && col("p") <= cutoff,
          datediff(col("p"), col("b")))
          .otherwise(datediff(cutoff, col("b"))).cast("long").as("obs"),
        when(col("p").isNotNull && col("p") <= cutoff, 1L).otherwise(0L)
          .as("died"))
    val per = life.groupBy(col("obs").as("t"))
      .agg(count(lit(1)).as("u_all"), sum(col("died")).as("d"))
    val total = life.agg(count(lit(1)).as("n"))
    val wT = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = per.crossJoin(broadcast(total))
      .withColumn("r", col("n") - sum(col("u_all")).over(wT) + col("u_all"))
      .filter(col("d") > 0)
    risk
      .withColumn("zf", max(when(col("d") === col("r"), 1).otherwise(0)).over(wT))
      .withColumn("lsum", sum(when(col("d") < col("r"),
        log((col("r") - col("d")).cast("double") / col("r").cast("double")))
        .otherwise(lit(0.0))).over(wT))
      .select(col("t"), col("r").as("n_risk"), col("d").as("n_deaths"),
        when(col("zf") === 1, 0.0).otherwise(round(exp(col("lsum")), 6))
          .as("survival"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ks_drift"    -> ksDrift _,
    "q_survival_km" -> survivalKm _)

  val oracles: Map[String, String] = Map(
    "q_ks_drift" ->
      """WITH c AS (SELECT value AS v,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
        |      < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
        |      >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
        |    CAST(SUM(n2) AS BIGINT) AS t2 FROM c),
        |cum AS (SELECT v,
        |    CAST(SUM(n1) OVER (ORDER BY v) AS BIGINT) AS c1,
        |    CAST(SUM(n2) OVER (ORDER BY v) AS BIGINT) AS c2 FROM c),
        |d AS (SELECT v, ABS(c1 * t2 - c2 * t1) AS dnum, t1, t2 FROM cum, t)
        |SELECT ROUND(CAST(dnum AS DOUBLE)
        |    / (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)), 6) AS d_stat,
        |  v AS at_value, t1 AS n_first, t2 AS n_second
        |FROM d ORDER BY dnum DESC, v LIMIT 1""".stripMargin,
    "q_survival_km" ->
      """WITH life AS (SELECT user_id,
        |    MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS b,
        |    MIN(CASE WHEN event_type = 'purchase'
        |      THEN CAST(CAST(ts AS TIMESTAMP) AS DATE) END) AS p
        |  FROM events GROUP BY 1),
        |u AS (SELECT
        |    CAST(CASE WHEN p IS NOT NULL AND p <= DATE '2024-01-03'
        |      THEN date_diff('day', b, p)
        |      ELSE date_diff('day', b, DATE '2024-01-03') END AS BIGINT) AS obs,
        |    CASE WHEN p IS NOT NULL AND p <= DATE '2024-01-03'
        |      THEN 1 ELSE 0 END AS died
        |  FROM life WHERE b <= DATE '2024-01-03'),
        |per AS (SELECT obs AS t, COUNT(*) AS u_all,
        |    CAST(SUM(died) AS BIGINT) AS d
        |  FROM u GROUP BY 1),
        |r AS (SELECT t, d,
        |    CAST((SELECT COUNT(*) FROM u)
        |      - SUM(u_all) OVER (ORDER BY t) + u_all AS BIGINT) AS r
        |  FROM per),
        |km AS (SELECT t, d, r,
        |    MAX(CASE WHEN d = r THEN 1 ELSE 0 END) OVER (ORDER BY t) AS zf,
        |    SUM(CASE WHEN d < r THEN
        |        LN(CAST(r - d AS DOUBLE) / CAST(r AS DOUBLE))
        |      ELSE 0.0 END) OVER (ORDER BY t) AS lsum
        |  FROM r WHERE d > 0)
        |SELECT t, r AS n_risk, d AS n_deaths,
        |  CASE WHEN zf = 1 THEN 0.0 ELSE ROUND(EXP(lsum), 6) END AS survival
        |FROM km""".stripMargin)
}
