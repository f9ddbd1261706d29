package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.Mappings
import graft.similarity.Embeddings

/** Operational-analytics batch (SURVEY §2 #114-116): the daily-ops
  * shapes still missing from the surface — date-spine gap fill with
  * forward fill (#114), multi-touch channel attribution (#115), and
  * robust (median/MAD) metric anomaly detection (#116). All three
  * ride one keyed shuffle each; spines and flags are derived
  * row-locally so nothing quadratic or driver-side ever appears.
  */
object Operational {

  /** #114 DATE-SPINE GAP FILL + FORWARD FILL — the densification
    * step every per-entity daily time series needs before window
    * math (a reporting-side complement to the reference's daily
    * cleanup/backfill jobs, e.g. sql/cleanup_mango_core.sql keeping
    * partitions contiguous): each user's observed (day, n_events,
    * value) rows are densified to EVERY day between that user's
    * first and last active day; missing days get n_events = 0,
    * is_observed = 0, and the last observed daily value carried
    * forward.
    *
    * Scale shape: one groupBy(user, day) with map-side combine, a
    * row-local `sequence()` explode bounded by the date span (30
    * here; a production caller bounds the spine by the reporting
    * window), and ONE user-keyed window for the forward fill — the
    * explode reuses the groupBy's hash partitioning, so the whole
    * query is a single shuffle of pre-aggregated daily rows, never
    * raw events. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("day_value"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("day_value").isNotNull, 1).otherwise(0).as("is_observed"),
        last(col("day_value"), ignoreNulls = true).over(w).as("value_ffill"))
  }

  /** #115 MULTI-TOUCH ATTRIBUTION — first-touch and last-touch
    * credit for purchase revenue across marketing channels (the
    * conversion-credit step the reference's channel family stops
    * short of: sql/mango_user_channels.sql attributes installs,
    * sql/mango_channel_roi.sql scores channels; this closes the loop
    * by crediting each purchase to the journey's first and latest
    * preceding touch). Touches are signup/view/click events mapped
    * through the channel dimension; purchases with no preceding
    * touch are credited to 'Unassisted'.
    *
    * Scale shape: ONE user-keyed window pass over the event stream
    * (running first/last of the touch channel, purchases carry a
    * NULL touch so they never self-credit), then a 2-way row-local
    * explode (one row per attribution model) and one tiny hash agg —
    * no self-join, no per-conversion lookup join. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("touch_channel",
        when(col("event_type").isin("signup", "view", "click"),
          Mappings.channel(col("event_type"))))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val purchases = ev
      .withColumn("first_touch", first(col("touch_channel"), ignoreNulls = true).over(w))
      .withColumn("last_touch", last(col("touch_channel"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
    purchases
      .select(col("value"), explode(array(
        struct(lit("first_touch").as("model"),
          coalesce(col("first_touch"), lit("Unassisted")).as("channel")),
        struct(lit("last_touch").as("model"),
          coalesce(col("last_touch"), lit("Unassisted")).as("channel")))).as("a"))
      .groupBy(col("a.model").as("model"), col("a.channel").as("channel"))
      .agg(count(lit(1)).as("conversions"), round(sum(col("value")), 6).as("revenue"))
  }

  /** #116 ROBUST METRIC ANOMALY DETECTION — flag days whose event
    * volume deviates from the per-metric median by more than
    * 3 × MAD (median absolute deviation), the standard
    * outlier-resistant alternative to mean/stddev z-scores for
    * monitoring daily pipeline output (the validation family's
    * statistical member, next to the volume-drift check in
    * validation/Checks.scala).
    *
    * Scale shape: the metric domain is (event_type × day) — tiny by
    * construction after ONE map-side-combined count agg over the
    * scan; the median and MAD aggregates and the join-back all run
    * on that pre-aggregated frame, so nothing downstream of the
    * first agg touches raw events. A zero-MAD series (constant
    * counts) flags only exact deviations via the epsilon guard. */
  def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val med = daily.groupBy(col("event_type"))
      .agg(expr("percentile(n_events, 0.5)").as("med"))
    val mad = daily.join(med, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(n_events - med), 0.5)").as("mad"))
    daily.join(med, Seq("event_type")).join(mad, Seq("event_type"))
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        when(abs(col("n_events") - col("med")) > col("mad") * 3 + lit(1e-9), 1)
          .otherwise(0).as("is_anomaly"))
  }

  /** #117 HYBRID RETRIEVAL FUSION (reciprocal rank fusion, Cormack
    * et al. 2009): the lexical arm is the #107 BM25 ranking at depth
    * 20 (same implementation, deeper cut) and the semantic arm is a
    * cosine top-20 against one query vector; each candidate's fused
    * score is Σ 1/(60 + rank) over the arms it appears in. RRF is how
    * production retrieval stacks combine a keyword index with a
    * vector index without score calibration — rank positions are
    * comparable where raw BM25 and cosine scores are not.
    *
    * Scale shape: both arms end in bounded top-k selections
    * (TakeOrderedAndProject / a 20-row window), so the fusion join is
    * a 20×20-row full outer join — driver-free, corpus-free. The
    * fused score is built from integer ranks only (1/(60+r) is exact
    * in a double on both engines), so the gate is an exact hash
    * compare, no tolerance. */
  def rrfFusion(s: SparkSession, dir: String): DataFrame = {
    val depth = 20
    val lex = ScaleOps.bm25TopK(s, dir, depth)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
    val qv = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val sem = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(Embeddings.cosine(col("qv"), col("v")), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(depth)
      .withColumn("sem_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id")))
          .cast("long")) // depth rows — trivial window
      .select(col("doc_id"), col("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        round(
          coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("sem_rank")), lit(0.0)), 6)
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(10)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_score").desc, col("doc_id")))
          .cast("long"))
      .select(col("rank"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        col("rrf_score"))
  }

  /** #142 CDC APPLY — collapse a change-data-capture log
    * (upsert/delete operations per key, ordered by a sequence) into
    * the CURRENT table state: the Debezium-merge every warehouse
    * ingest runs. The log is derived deterministically from events
    * (op = 'D' when event_id ≡ 0 mod 10, else 'U'; sequence =
    * (ts, event_id)); a key whose LAST operation is a delete is
    * ABSENT from the result — the semantics a plain latest-row upsert
    * (#21) cannot express.
    *
    * Scale shape: ONE map-side-combined `max_by` hash agg picks each
    * key's last operation (no window rank over the log — the
    * log-sized sort is the naive shape), then a row-local filter
    * drops deleted keys. At 100 TB the log shuffles once, keyed. */
  def cdcApply(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id")).as("seq"),
        struct(
          when(pmod(col("event_id"), lit(10)) === 0, "D").otherwise("U").as("op"),
          col("event_type"), round(col("value"), 6).as("value")).as("payload"))
      .groupBy(col("user_id"))
      .agg(max_by(col("payload"), col("seq")).as("last"))
      .filter(col("last.op") =!= "D")
      .select(col("user_id"), col("last.event_type").as("event_type"),
        col("last.value").as("value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_apply"   -> cdcApply _,
    "q_gap_fill"    -> gapFill _,
    "q_attribution" -> attribution _,
    "q_anomaly_mad" -> anomalyMad _,
    "q_rrf_fusion"  -> rrfFusion _
  )

  val oracles: Map[String, String] = Map(
    "q_cdc_apply" ->
      """WITH log AS (
        |  SELECT user_id, event_type, ROUND(value, 6) AS value,
        |    CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, value
        |FROM log WHERE rn = 1 AND op <> 'D'""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_events, ROUND(SUM(value), 6) AS day_value
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, UNNEST(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS day
        |  FROM daily GROUP BY user_id)
        |SELECT s.user_id, CAST(s.day AS DATE) AS day,
        |  COALESCE(d.n_events, 0) AS n_events,
        |  CASE WHEN d.day_value IS NOT NULL THEN 1 ELSE 0 END AS is_observed,
        |  LAST_VALUE(d.day_value IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day""".stripMargin,
    "q_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    CASE WHEN event_type IN ('signup', 'view') THEN 'Organic'
        |         WHEN event_type = 'click' THEN 'Paid' END AS touch_channel
        |  FROM events),
        |marked AS (
        |  SELECT event_type, value,
        |    FIRST_VALUE(touch_channel IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch,
        |    LAST_VALUE(touch_channel IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch
        |  FROM ev),
        |credits AS (
        |  SELECT 'first_touch' AS model, COALESCE(first_touch, 'Unassisted') AS channel, value
        |  FROM marked WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'last_touch' AS model, COALESCE(last_touch, 'Unassisted') AS channel, value
        |  FROM marked WHERE event_type = 'purchase')
        |SELECT model, channel, COUNT(*) AS conversions, ROUND(SUM(value), 6) AS revenue
        |FROM credits GROUP BY 1, 2""".stripMargin,
    "q_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, QUANTILE_CONT(n_events, 0.5) AS med FROM daily GROUP BY 1),
        |mad AS (
        |  SELECT d.event_type, QUANTILE_CONT(ABS(d.n_events - m.med), 0.5) AS mad
        |  FROM daily d JOIN med m USING (event_type) GROUP BY 1)
        |SELECT d.event_type, d.day, d.n_events,
        |  ROUND(m.med, 6) AS med, ROUND(a.mad, 6) AS mad,
        |  CASE WHEN ABS(d.n_events - m.med) > a.mad * 3 + 1e-9 THEN 1 ELSE 0 END AS is_anomaly
        |FROM daily d JOIN med m USING (event_type) JOIN mad a USING (event_type)""".stripMargin,
    "q_rrf_fusion" ->
      s"""WITH ${ScaleOps.bm25OracleCtes(20)},
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |sc AS (SELECT e.vec_id AS doc_id, ROUND(
        |    list_sum(list_transform(range(1, 65), i -> qv[i] * v[i]))
        |      / (sqrt(list_sum(list_transform(qv, x -> x*x)))
        |         * sqrt(list_sum(list_transform(v, x -> x*x)))), 6) AS cos
        |  FROM e, q WHERE e.vec_id <> 0),
        |sem_top AS (SELECT doc_id, cos FROM sc ORDER BY cos DESC, doc_id LIMIT 20),
        |sem AS (SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS sem_rank
        |  FROM sem_top),
        |fused AS (
        |  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
        |    l.rank AS lex_rank, s.sem_rank,
        |    ROUND(COALESCE(1.0 / (60 + l.rank), 0)
        |        + COALESCE(1.0 / (60 + s.sem_rank), 0), 6) AS rrf_score
        |  FROM bm25_ranked l FULL JOIN sem s ON l.doc_id = s.doc_id),
        |top AS (SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT)
        |    AS rank, doc_id, lex_rank, sem_rank, rrf_score
        |FROM top""".stripMargin
  )
}
