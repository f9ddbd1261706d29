package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Model-fitting / distribution-diagnostics batch (SURVEY §2
  * #159-163): closed-form OLS from distributed sufficient statistics,
  * autocorrelation of the daily series, a Benford first-digit audit,
  * a Zipf rank-frequency fit over the corpus vocabulary, and
  * half-life-decayed engagement scoring — the regression/fit surface
  * on top of the engine's exact-arithmetic discipline.
  *
  * Shared disciplines: money enters as integer CENTS
  * (`round(x·100) AS BIGINT`, the #146 lesson); cross-products
  * accumulate in decimal/hugeint so no distributed double sum exists
  * anywhere (#124); every float expression runs ONCE, in one fixed
  * order, on exact integer inputs (#145); ordered windows only over
  * value-domain-sized frames.
  */
object Fit {

  /** #159 OLS REGRESSION per customer segment — slope / intercept /
    * R² of order total vs customer account balance, computed
    * CLOSED-FORM from the five sufficient statistics (n, Σx, Σy,
    * Σxy, Σx², Σy²) in ONE map-side-combined aggregate — the
    * distributed-regression shape: no iteration, no per-row residual
    * pass, nothing driver-side but the 5-row result.
    *
    * EXACT arithmetic: x and y are integer cents summed as
    * decimal(38,0) (Σy² at 100 TB overflows a long — ~1e14 per row),
    * so every sufficient statistic is an exact integer and both
    * engines see the SAME integers. Every DERIVED product (n·sxy,
    * sx·sy, …) casts each factor to double FIRST and multiplies as
    * doubles — a decimal(38,0)×decimal(38,0) product would cap at
    * precision 38 and silently NULL on overflow (sy² alone reaches
    * ~1e38 at the 100 TB posture) while DuckDB's hugeint errors;
    * double-first is a well-defined identical IEEE rounding of
    * identical exact integers on both sides, in one fixed op order. */
  private[graft] def olsOf(pts: DataFrame): DataFrame = {
    val st = pts.groupBy(col("segment")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    def d(c: Column) = c.cast("double")
    val covNum = d(st("n")) * d(st("sxy")) - d(st("sx")) * d(st("sy"))
    val varX   = d(st("n")) * d(st("sxx")) - d(st("sx")) * d(st("sx"))
    val varY   = d(st("n")) * d(st("syy")) - d(st("sy")) * d(st("sy"))
    st.select(col("segment"), col("n"),
      round(covNum / varX, 6).as("slope"),
      // intercept in dollars: (Σy·Σx² − Σx·Σxy) / (n·varX-form) / 100
      round((d(st("sy")) * d(st("sxx")) - d(st("sx")) * d(st("sxy"))) /
        varX / 100.0, 6).as("intercept"),
      round((covNum * covNum) / (varX * varY), 6).as("r2"))
  }

  /** Scale shape: dim side broadcast; the fact scan prunes to 3
    * columns; one hash agg, 5 groups out. */
  def olsFit(s: SparkSession, dir: String): DataFrame = {
    val x = round(col("c_acctbal") * 100).cast("long").cast("decimal(18,0)")
    val y = round(col("o_totalprice") * 100).cast("long").cast("decimal(18,0)")
    olsOf(Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), x.as("x"), y.as("y")))
  }

  /** #160 AUTOCORRELATION (ACF) of the daily event-count series at
    * lags 1..7 — the seasonality detector underneath #126's fixed
    * day-of-week index: a weekly cycle shows up as an r₇ spike
    * without being told the period.
    *
    * EXACT arithmetic: with S = Σx and n days, the mean-centered
    * series scaled by n — Xₜ = n·xₜ − S — is INTEGER, and
    * r_k = ΣXₜXₜ₊ₖ / ΣXₜ² (the n² factors cancel), so the whole
    * statistic is an integer ratio: no float mean ever subtracts, the
    * one division is final (#154 discipline). Xₜ casts to
    * decimal(38,0) BEFORE squaring — Xₜ² overflows a long once
    * |Xₜ| > ~3e9 (plausible at the stated scale), and non-ANSI Spark
    * would silently wrap where DuckDB's bigint multiply raises; the
    * oracle mirrors with hugeint. Denominator-zero (a perfectly
    * constant series) yields NULL, not a crash.
    *
    * Scale shape: raw events collapse to the per-DAY frame in ONE
    * map-side agg; lags are a ≤7-row broadcast cross on the tiny
    * daily frame; nothing larger than days × 7 ever joins. */
  private[graft] def acfOf(daily: DataFrame): DataFrame = {
    val tot = daily.agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"))
    // the centering multiply itself runs in decimal(38,0) — in long it
    // would silently wrap (non-ANSI) once n_days·x > ~9.2e18 where the
    // oracle's HUGEINT multiply stays exact; same placement as decayOf
    val centered = daily.crossJoin(broadcast(tot))
      .select(col("d"),
        (col("n_days").cast("decimal(38,0)") * col("x") - col("sx")).as("xc"),
        col("n_days"))
    val den = centered.agg(sum(col("xc") * col("xc")).as("den")).
      select(col("den"))
    val lags = daily.sparkSession.range(1, 8)
      .select(col("id").cast("int").as("lag"))
    val shifted = centered.select(col("d").as("d2"), col("xc").as("xc2"))
    centered.crossJoin(broadcast(lags))
      .join(shifted, expr("d2 = date_add(d, lag)"))
      .groupBy(col("lag"))
      .agg(sum(col("xc") * col("xc2")).as("num"), max(col("n_days")).as("n_days"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_days"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(round(col("num").cast("double") / col("den").cast("double"), 6))
          .as("acf"))
  }

  def acfDaily(s: SparkSession, dir: String): DataFrame =
    acfOf(Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x")))

  /** #161 BENFORD FIRST-DIGIT AUDIT of order totals — observed vs
    * log₁₀(1+1/d) expected share per leading digit plus the χ²
    * distance, the classic fabricated-numbers / broken-feed smell
    * test a data-quality suite runs next to #118's profile.
    *
    * Determinism: the leading digit comes from the DECIMAL STRING of
    * integer cents (substr of a long — never floor(log10) float
    * gymnastics, where a value at a power-of-ten boundary could
    * round differently per engine); digit counts are exact integers;
    * expected shares and χ² terms are each ONE fixed float expression
    * over those integers, and the χ² total is an ordered cumsum over
    * the 9-row digit frame (#155 discipline), never a distributed
    * double sum.
    *
    * Scale shape: one map-side agg to 9 rows; everything after is
    * digit-frame-local. */
  private[graft] def benfordOf(cents: DataFrame): DataFrame = {
    val per = cents
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = per.agg(sum(col("n")).as("nt"))
    val wAll = Window.orderBy(col("digit"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per.crossJoin(broadcast(tot))
      .withColumn("e",
        log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))
      .withColumn("chi2_term",
        (col("n").cast("double") - col("nt").cast("double") * col("e")) *
          (col("n").cast("double") - col("nt").cast("double") * col("e")) /
          (col("nt").cast("double") * col("e")))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("nt").cast("double"), 6).as("obs_share"),
        round(col("e"), 6).as("exp_share"),
        round(sum(col("chi2_term")).over(wAll), 4).as("chi2"))
  }

  def benfordDigits(s: SparkSession, dir: String): DataFrame =
    benfordOf(Tables.orders(s, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents")))

  /** #162 ZIPF RANK-FREQUENCY FIT — log-log OLS slope over the top-200
    * corpus terms: natural text sits near slope −1, so a corpus whose
    * fitted slope drifts toward 0 (flat: boilerplate/templated spam)
    * or below −1.5 (head-heavy: generated/repetitive text) fails the
    * curation smell test — the corpus-level companion to #82's
    * per-document repetition rules.
    *
    * Determinism: term counts are exact; rank is the deterministic
    * (cnt DESC, term) order; the top-200 cut is a distributed
    * TakeOrderedAndProject (never a full sort); the ln() pairs and
    * their OLS sums accumulate via ONE ordered cumsum over the
    * 200-row ranked frame in rank order (#124/#156 discipline —
    * a distributed double sum would be order-nondeterministic), and
    * the slope/intercept divisions are final.
    *
    * Scale shape: vocabulary-sized map-side agg → bounded top-k →
    * all float work on ≤200 rows. */
  private[graft] def zipfOf(counts: DataFrame): DataFrame = {
    val top = counts.orderBy(col("cnt").desc, col("term")).limit(200)
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
      .select(col("rank"),
        log(col("rank").cast("double")).as("lx"),
        log(col("cnt").cast("double")).as("ly"))
    val wCum = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sums = ranked
      .withColumn("k", count(lit(1)).over(wCum))
      .withColumn("slx", sum(col("lx")).over(wCum))
      .withColumn("sly", sum(col("ly")).over(wCum))
      .withColumn("slxy", sum(col("lx") * col("ly")).over(wCum))
      .withColumn("slxx", sum(col("lx") * col("lx")).over(wCum))
      .orderBy(col("rank").desc).limit(1)
    sums.select(col("k").as("n_terms"),
      round((col("k") * col("slxy") - col("slx") * col("sly")) /
        (col("k") * col("slxx") - col("slx") * col("slx")), 6).as("slope"),
      round((col("sly") - (col("k") * col("slxy") - col("slx") * col("sly")) /
        (col("k") * col("slxx") - col("slx") * col("slx")) * col("slx")) /
        col("k"), 6).as("intercept"))
  }

  def zipfFit(s: SparkSession, dir: String): DataFrame =
    zipfOf(Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("cnt")))

  /** #163 HALF-LIFE-DECAYED ENGAGEMENT SCORE — per-user
    * Σ value·2^(−age_days) with a 1-day half-life, the recency
    * weighting a ranking/churn feature store keeps next to the raw
    * #29 RFE counts (yesterday counts half of today, a month ago
    * counts nothing).
    *
    * EXACT arithmetic: the decay base is 2, so each weight
    * 2^(30−age) is an exact integer (age ≤ 30 enforced by the
    * horizon filter — also the scale posture: the scan prunes to the
    * decay horizon, where e-base weights would never reach exact 0);
    * cents casts to decimal(38,0) BEFORE the weight multiply — a
    * long×long product wraps silently in non-ANSI Spark once per-event
    * cents exceed ~8.6e9 (a > $86M line) while the oracle's bigint
    * multiply would raise; the product then accumulates in decimal —
    * NO float is summed, the one division by 2³⁰·100 is final. The
    * anchor date is the data's own max day (one tiny broadcast agg),
    * so the score is reproducible from the table alone.
    *
    * Scale shape: horizon filter + cents/weight arithmetic ride the
    * scan row-locally; ONE map-side agg to the per-user frame. */
  private[graft] def decayOf(aged: DataFrame): DataFrame = {
    aged
      .filter(col("age") <= 30)
      .select(col("user_id"),
        (col("cents").cast("decimal(38,0)") *
          pow(lit(2.0), lit(30) - col("age")).cast("long")).as("w"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("w")).as("wsum"))
      .select(col("user_id"), col("n_events"),
        round(col("wsum").cast("double") / 1073741824.0 / 100.0, 6)
          .as("decay_score"))
  }

  def decayScore(s: SparkSession, dir: String): DataFrame = {
    val anchor = Tables.events(s, dir).agg(max(to_date(col("ts"))).as("mx"))
    decayOf(Tables.events(s, dir)
      .crossJoin(broadcast(anchor))
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        datediff(col("mx"), to_date(col("ts"))).as("age")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ols_fit"     -> olsFit _,
    "q_acf_daily"   -> acfDaily _,
    "q_benford"     -> benfordDigits _,
    "q_zipf_fit"    -> zipfFit _,
    "q_decay_score" -> decayScore _)

  /** DuckDB oracles — each replays the same exact-integer pipeline:
    * hugeint sufficient statistics, integer-string digit extraction,
    * ordered-window float sums, dyadic weights. */
  def oracles: Map[String, String] = Map(
    "q_ols_fit" ->
      """WITH j AS (SELECT c_mktsegment AS segment,
        |    CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS HUGEINT) AS x,
        |    CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS HUGEINT) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |st AS (SELECT segment, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
        |    SUM(x*x) AS sxx, SUM(y*y) AS syy
        |  FROM j GROUP BY 1),
        |d AS (SELECT segment, n,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
        |  FROM st)
        |SELECT segment, n,
        |  ROUND((nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd), 6) AS slope,
        |  ROUND((syd*sxxd - sxd*sxyd) /
        |    (nd*sxxd - sxd*sxd) / 100.0, 6) AS intercept,
        |  ROUND(((nd*sxyd - sxd*syd) * (nd*sxyd - sxd*syd)) /
        |    ((nd*sxxd - sxd*sxd) * (nd*syyd - syd*syd)), 6) AS r2
        |FROM d""".stripMargin,
    "q_acf_daily" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_days, SUM(x) AS sx FROM daily),
        |c AS (SELECT d, CAST(n_days * x - sx AS HUGEINT) AS xc, n_days
        |  FROM daily CROSS JOIN tot),
        |den AS (SELECT SUM(xc * xc) AS den FROM c),
        |lags AS (SELECT CAST(r AS INT) AS lag FROM range(1, 8) t(r)),
        |num AS (SELECT lag, SUM(a.xc * b.xc) AS num, MAX(a.n_days) AS n_days
        |  FROM c a CROSS JOIN lags
        |  JOIN c b ON b.d = a.d + INTERVAL (lag) DAY
        |  GROUP BY lag)
        |SELECT lag, n_days,
        |  CASE WHEN den = 0 THEN NULL
        |    ELSE ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
        |  END AS acf
        |FROM num CROSS JOIN den""".stripMargin,
    "q_benford" ->
      """WITH per AS (SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |    COUNT(*) AS n
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT SUM(n) AS nt FROM per),
        |t AS (SELECT digit, n, nt,
        |    LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0) AS e
        |  FROM per CROSS JOIN tot)
        |SELECT digit, n,
        |  ROUND(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS obs_share,
        |  ROUND(e, 6) AS exp_share,
        |  ROUND(SUM((CAST(n AS DOUBLE) - CAST(nt AS DOUBLE) * e) *
        |    (CAST(n AS DOUBLE) - CAST(nt AS DOUBLE) * e) /
        |    (CAST(nt AS DOUBLE) * e))
        |    OVER (ORDER BY digit ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND UNBOUNDED FOLLOWING), 4) AS chi2
        |FROM t""".stripMargin,
    "q_zipf_fit" ->
      """WITH term AS (SELECT t.term FROM documents,
        |    UNNEST(string_split(text, ' ')) AS t(term)
        |  WHERE LEN(t.term) > 0),
        |cnt AS (SELECT term, COUNT(*) AS cnt FROM term GROUP BY 1),
        |top AS (SELECT term, cnt FROM cnt ORDER BY cnt DESC, term LIMIT 200),
        |ranked AS (SELECT
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank,
        |    LN(CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS DOUBLE)) AS lx,
        |    LN(CAST(cnt AS DOUBLE)) AS ly
        |  FROM top),
        |sums AS (SELECT
        |    COUNT(*) OVER w AS k,
        |    SUM(lx) OVER w AS slx, SUM(ly) OVER w AS sly,
        |    SUM(lx * ly) OVER w AS slxy, SUM(lx * lx) OVER w AS slxx,
        |    rank
        |  FROM ranked
        |  WINDOW w AS (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)
        |  ORDER BY rank DESC LIMIT 1)
        |SELECT k AS n_terms,
        |  ROUND((k * slxy - slx * sly) / (k * slxx - slx * slx), 6) AS slope,
        |  ROUND((sly - (k * slxy - slx * sly) / (k * slxx - slx * slx) * slx)
        |    / k, 6) AS intercept
        |FROM sums""".stripMargin,
    "q_decay_score" ->
      """WITH anchor AS (SELECT MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS mx
        |  FROM events),
        |w AS (SELECT user_id,
        |    CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT) *
        |      CAST(POWER(2, 30 - date_diff('day',
        |        CAST(CAST(ts AS TIMESTAMP) AS DATE), mx)) AS BIGINT) AS w
        |  FROM events CROSS JOIN anchor
        |  WHERE date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE), mx) <= 30)
        |SELECT user_id, COUNT(*) AS n_events,
        |  ROUND(CAST(SUM(w) AS DOUBLE) / 1073741824.0 / 100.0, 6)
        |    AS decay_score
        |FROM w GROUP BY 1""".stripMargin)
}
