package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.functions.{Anonymize, JsonEvents, Mappings}
import graft.operators.{AsOf, Sessionize}
import graft.similarity.Embeddings

/** Additional operator coverage: nested-JSON unnest and sketch
  * aggregates. */
object Extras {

  /** #48 nested JSON array → rows (reference
    * udf_js/json_extract_events.sql + utils/marshalling.py
    * json_unnest): a JSON-array string column is parsed with an
    * explicit schema and exploded to typed rows. The array is built
    * in-query from `props` so the parse path is exercised end-to-end. */
  def jsonUnnest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("k0", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("arr",
        concat(lit("["), col("props"), lit(",{\"k\": "), col("k0") + 1, lit("}]")))
    JsonEvents.jsonArrayToRows(e, "arr", StructType(Seq(StructField("k", LongType))))
      .select(col("event_id"), JsonEvents.field("e", "k").as("k"))
  }

  /** #49 sketch aggregates: HLL distinct + approximate percentile,
    * TOLERANCE-GATED through the exact-compare harness. Raw sketch
    * estimates are engine-specific, so the query emits (a) exact
    * values the oracle recomputes verbatim and (b) 0/1 flags asserting
    * the sketch landed within tolerance of the exact answer (HLL at
    * rsd=0.015 within 5% relative error; approx percentile at
    * accuracy=500 within the exact 48th-52nd percentile band). The
    * oracle emits constant 1 for the flags: a drifting sketch flips a
    * flag and fails the hash — a real cross-engine gate, not rows-only. */
  def approxSketch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users_exact"),
        // sketch params sized to their gates, not tighter: rsd=0.015
        // keeps a 3.3-sigma margin against the 5% gate (rsd=0.01 costs
        // 2.2x the registers for margin the gate can't observe; 0.02
        // would leave only 2.5 sigma — ~1% flip chance per group on
        // regenerated data); accuracy=500 bounds percentile rank error
        // at 0.2% against the ±2% band
        approx_count_distinct(col("user_id"), 0.015).as("au"),
        percentile_approx(col("value"), lit(0.5), lit(500)).as("p50a"),
        // one array-valued exact percentile: both band edges share one
        // value buffer instead of two independent sort aggregates
        expr("percentile(value, array(0.48, 0.52))").as("band"))
      .select(col("*"),
        element_at(col("band"), 1).as("lo"),
        element_at(col("band"), 2).as("hi"))
      .select(
        col("event_type"), col("n"), col("users_exact"),
        (abs(col("au") - col("users_exact")) / col("users_exact") <= 0.05)
          .cast("int").as("hll_within_5pct"),
        (col("p50a") >= col("lo") && col("p50a") <= col("hi"))
          .cast("int").as("p50_within_rank_band"))

  /** #50 dimension ordering for dashboards
    * (reference udf/order_markets.sql / order_channels.sql applied to
    * the market mapping). */
  def dimensionOrder(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(s, dir)
    val nation   = Tables.nation(s, dir)
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .select(Mappings.market(col("n_name")).as("market"))
      .groupBy(col("market"))
      .agg(count(lit(1)).as("customers"))
      .withColumn("market_order", Mappings.marketOrder(col("market")))
  }

  /** #51 deterministic anonymization: stable pseudonyms, IP masking,
    * hash-derived value perturbation
    * (reference utils/anonymizer.py, made reproducible). */
  def anonymize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("ip",
        concat(lit("10."), col("user_id") % 256, lit("."), col("k") % 256, lit(".7")))
    e.select(
      col("event_id"),
      Anonymize.hashId(col("user_id")).as("user_hash"),
      Anonymize.maskIp(col("ip")).as("masked_ip"),
      Anonymize.perturb(col("value"), col("event_id")).as("value_perturbed"),
      Anonymize.band(col("value"), 50.0).as("value_band"))
  }

  /** #52 as-of (temporal) join: each click event matched with the
    * user's most recent daily purchase total at or before the event —
    * the union-and-carry composition ([[AsOf.join]]); DuckDB's native
    * ASOF JOIN is the oracle. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val left = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val right = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).cast("timestamp").as("rt"))
      .agg(round(sum(col("value")), 6).as("daily_purchase"))
    AsOf.join(left, right, Seq("user_id"), "ts", "rt")
      .select(col("event_id"), col("user_id"), col("value"), col("daily_purchase"))
  }

  /** #53 gap-split session windows (30-min idle): batch analogue of
    * the streaming stateful sessionization. */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionWindows(
      Tables.events(s, dir), Seq("user_id"), "ts", Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("session_id"), col("session_start_us"),
        col("session_len_us"), col("n_events"))

  /** #54 per-label embedding centroids (the IVF coarse-quantizer
    * training step), long format (label, dim position, mean).
    *
    * Map-side array aggregation ([[graft.plans.VecSumAgg]]): one
    * (sums, count) row per label crosses the shuffle — NOT the
    * posexplode formulation, which multiplies the exchange volume by
    * the dimensionality (×64 here) before aggregating. The tiny
    * per-label result is exploded to long format after the shuffle. */
  def embeddingCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select(col("label"), Embeddings.asDouble(col("embedding")).as("v"))
      .as[(Int, Array[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.plans.VecSumAgg.toColumn)
      .flatMap { case (label, acc) =>
        acc.sum.zipWithIndex.map { case (sm, i) =>
          (label, (i + 1).toLong, sm / acc.n, acc.n)
        }
      }
      .toDF("label", "dim", "centroid", "n_vecs")
      .withColumn("centroid", round(col("centroid"), 6))
  }

  /** #55 kv-array lookup over a real ARRAY<STRUCT<key,value>> column —
    * the literal shape of the reference's settings/event_extra lookups
    * (`(SELECT value FROM UNNEST(settings) WHERE key = '…')`,
    * reference sql/mango_user_channels.sql:5-6), via higher-order
    * filter + element_at. */
  def kvArrayLookup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("settings", array(
        struct(lit("tracker").as("key"), col("k").cast("string").as("value")),
        struct(lit("etype").as("key"), col("event_type").as("value"))))
    val tracker = element_at(filter(col("settings"), x => x.getField("key") === "tracker"), 1)
      .getField("value")
    e.groupBy(col("user_id"))
      .agg(
        max(tracker.cast("long")).as("tracker_token"),
        countDistinct(element_at(filter(col("settings"),
          x => x.getField("key") === "etype"), 1).getField("value")).as("n_etypes"))
  }

  /** #56 near-dup cluster resolution, single-hop variant: min partner
    * per doc (kept as the one-hop oracle entry; the full fixpoint
    * resolution is [[dedupResolveCc]]). */
  def dedupResolve(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.dedup.TextDedup
      .jaccardPairs(Tables.documents(s, dir), "doc_id", "text", maxDf = None)
      .filter(col("jaccard") >= 0.05)
    val fwd = pairs.select(col("doc_b").as("doc_id"), col("doc_a").as("partner"))
    val bwd = pairs.select(col("doc_a").as("doc_id"), col("doc_b").as("partner"))
    fwd.unionByName(bwd)
      .groupBy(col("doc_id"))
      .agg(least(min(col("partner")), min(col("doc_id"))).as("canonical_id"),
        count(lit(1)).as("n_partners"))
  }

  /** #56b near-dup cluster resolution to FIXPOINT: connected
    * components over the (df-capped, scale-path) candidate graph via
    * iterated min-label propagation ([[graft.dedup.Resolve]]) — a
    * chain a–b–c resolves to ONE canonical (a), which the one-hop
    * variant cannot do. Oracle: DuckDB recursive CTE computing min
    * reachable doc per node. */
  def dedupResolveCc(s: SparkSession, dir: String): DataFrame = {
    val edges = graft.dedup.TextDedup
      .jaccardPairs(Tables.documents(s, dir), "doc_id", "text", maxDf = Some(4))
      .filter(col("jaccard") >= 0.05)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    graft.dedup.Resolve.connectedComponents(edges)
      .toDF("doc_id", "canonical_id")
  }

  /** #57 IVF ANN: nearest-centroid assignment + MULTI-PROBE (nprobe=2)
    * bucket-local top-3 — the scale path completing q_ann_topk's
    * brute-force baseline, with boundary-vector recall recovered by
    * probing each query's two nearest centroid buckets. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
    Embeddings.ivfTopK(vecs, embeddingCentroids(s, dir), queryMaxId = 5L, k = 3, nprobe = 2)
  }

  /** #62 time-RANGE rolling window: each user-day's purchase total
    * with a trailing 7-day rolling sum (`rangeBetween` over day
    * numbers — rows in the window are selected by VALUE distance, not
    * row count, so gaps in activity are handled correctly). Partition
    * key is the user — high cardinality, so the window parallelizes
    * across the cluster (unlike a low-cardinality dashboard window). */
  def rollingWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 6).as("day_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_date(col("day")))
      .rangeBetween(-6, 0)
    daily
      .withColumn("rolling_7d", round(sum(col("day_value")).over(w), 6))
      .select(col("user_id"), col("day"), col("day_value"), col("rolling_7d"))
  }

  /** #63 funnel / sequence detection: users whose FIRST signup is
    * followed by a click and then a purchase, in order (the classic
    * event-sequence mining ask). One aggregation computes each step's
    * earliest qualifying timestamp per user — no self-joins, no
    * window sorts; the ordering constraints are min-over-conditionals,
    * which stay in partial aggregation. */
  def funnelSequence(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val steps = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("t_signup"))
    // earliest click AFTER the user's first signup, then earliest
    // purchase after that click: two bounded semi-aggregations over
    // pre-filtered event slices
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"))
    val s1 = steps.filter(col("t_signup").isNotNull)
      .join(clicks, Seq("user_id"))
      .filter(col("click_ts") > col("t_signup"))
      .groupBy(col("user_id"), col("t_signup"))
      .agg(min(col("click_ts")).as("t_click"))
    val s2 = s1.join(purchases, Seq("user_id"))
      .filter(col("purchase_ts") > col("t_click"))
      .groupBy(col("user_id"), col("t_signup"), col("t_click"))
      .agg(min(col("purchase_ts")).as("t_purchase"))
    s2.select(col("user_id"), col("t_signup"), col("t_click"), col("t_purchase"))
  }

  /** #64 histogram binning: fixed-width value buckets over purchase
    * amounts (corpus/metric profiling; one hash aggregation, bin id
    * computed row-locally). */
  def histogram(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(floor(col("value") / 25.0).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", round(col("bin") * 25.0, 6))

  /** #60 ROLLUP aggregation with dashboard Overall rows: per-market
    * totals PLUS the grand total in one pass (the reference's
    * dashboards union an 'Overall' row onto every per-dimension
    * aggregate; order_markets.sql reserves rank 0 for it). Spark
    * `rollup` = one aggregation with grouping sets — not a
    * union-of-two-aggregations double scan. */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(s, dir)
    val nation   = Tables.nation(s, dir)
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .select(Mappings.market(col("n_name")).as("market"), col("c_acctbal"))
      .rollup(col("market"))
      .agg(count(lit(1)).as("customers"), round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .select(coalesce(col("market"), lit("Overall")).as("market"),
        col("customers"), col("total_acctbal"))
      .withColumn("market_order", Mappings.marketOrder(col("market")))
  }

  /** #61 deterministic STRATIFIED sampling: per-language sampling
    * rates (downsample the dominant language, keep the tail) via an
    * md5-derived percentile — the training-data mixture-balancing
    * step, reproducible across engines/runs (no rand(), no
    * sampleBy seed drift). */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit(":strat")))
    val pct = (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 100
    val rate = when(col("lang") === "en", 50).otherwise(90)
    Tables.documents(s, dir)
      .filter(pct < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("sampled_docs"),
        round(avg(col("n_chars")), 6).as("avg_chars"))
  }

  /** #58 deterministic train/val/test split: md5-derived bucket per
    * doc (reproducible across engines and runs — the property a
    * 100 TB corpus split must have; no rand()). */
  def dataSplit(s: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit(":split")))
    val pct = (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 100
    Tables.documents(s, dir)
      .withColumn("split",
        when(pct < 80, "train").when(pct < 90, "valid").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("n_chars")), 6).as("avg_chars"))
  }

  /** #59 corpus statistics per source: vocabulary size, type-token
    * ratio — the corpus-level profile a data curation run reports. */
  def corpusStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("total_tokens"),
        countDistinct(col("token")).as("vocab_size"),
        round(countDistinct(col("token")) / count(lit(1)), 6).as("type_token_ratio"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_data_split"      -> dataSplit _,
    "q_grouping_sets"   -> groupingSets _,
    "q_stratified_sample" -> stratifiedSample _,
    "q_rolling_window"  -> rollingWindow _,
    "q_funnel_sequence" -> funnelSequence _,
    "q_histogram"       -> histogram _,
    "q_corpus_stats"    -> corpusStats _,
    "q_ann_ivf"         -> annIvf _,
    "q_kv_array_lookup" -> kvArrayLookup _,
    "q_dedup_resolve"   -> dedupResolve _,
    "q_dedup_resolve_cc" -> dedupResolveCc _,
    "q_json_unnest"     -> jsonUnnest _,
    "q_approx_sketch"   -> approxSketch _,
    "q_dimension_order" -> dimensionOrder _,
    "q_anonymize"       -> anonymize _,
    "q_asof_join"       -> asofJoin _,
    "q_session_windows" -> sessionWindows _,
    "q_embedding_centroids" -> embeddingCentroids _
  )

  val oracles: Map[String, String] = Map(
    // tolerance gate: exact columns recomputed by DuckDB; the 0/1
    // within-tolerance flags are constant 1 when the sketches behave
    "q_approx_sketch" ->
      """SELECT event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS users_exact,
        |  1 AS hll_within_5pct,
        |  1 AS p50_within_rank_band
        |FROM events GROUP BY 1""".stripMargin,
    "q_json_unnest" ->
      """WITH j AS (
        |  SELECT event_id,
        |    '[' || props || ',{"k": ' ||
        |      (CAST(json_extract_string(props, '$.k') AS BIGINT) + 1) || '}]' AS arr
        |  FROM events),
        |u AS (SELECT event_id, unnest(json_transform(arr, '[{"k":"BIGINT"}]')) AS e FROM j)
        |SELECT event_id, e.k AS k FROM u""".stripMargin,
    "q_dimension_order" ->
      """WITH m AS (
        |  SELECT CASE
        |    WHEN n_name IS NULL THEN 'Unknown'
        |    WHEN n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4','NATION_5') THEN 'APAC'
        |    WHEN n_name IN ('NATION_6','NATION_7','NATION_8','NATION_9','NATION_10') THEN 'EMEA'
        |    WHEN n_name IN ('NATION_11','NATION_12','NATION_13','NATION_14','NATION_15') THEN 'AMER'
        |    WHEN n_name IN ('NATION_16','NATION_17','NATION_18','NATION_19','NATION_20') THEN 'AFRICA'
        |    ELSE 'Others' END AS market
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT market, COUNT(*) AS customers,
        |  CAST(CASE market
        |    WHEN 'Overall' THEN 0 WHEN 'APAC' THEN 1 WHEN 'EMEA' THEN 2
        |    WHEN 'AMER' THEN 3 WHEN 'AFRICA' THEN 4
        |    WHEN 'Unknown' THEN 99 WHEN 'Others' THEN 100 ELSE 9999 END AS INTEGER) AS market_order
        |FROM m GROUP BY market""".stripMargin,
    "q_anonymize" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |w AS (
        |  SELECT event_id, value,
        |    '10.' || (user_id % 256) || '.' || (k % 256) || '.7' AS ip,
        |    sha256(CAST(user_id AS VARCHAR)) AS user_hash,
        |    md5(CAST(event_id AS VARCHAR)) AS h
        |  FROM e)
        |SELECT event_id, user_hash,
        |  regexp_replace(ip, '^(\d+\.\d+)\.\d+\.\d+$', '\1.0.0') AS masked_ip,
        |  ROUND(value * (1.0 + (((ascii(substr(h,1,1)) * 256 + ascii(substr(h,2,1))) % 1000) / 1000.0 - 0.5) * 2 * 0.1), 6) AS value_perturbed,
        |  CAST(FLOOR(value / 50.0) * 50.0 AS DOUBLE) AS value_band
        |FROM w""".stripMargin,
    "q_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t, value
        |  FROM events WHERE event_type = 'click'),
        |r AS (
        |  SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS rt,
        |    ROUND(SUM(value), 6) AS daily_purchase
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.value, r.daily_purchase
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.rt""".stripMargin,
    "q_session_windows" ->
      """WITH g AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |        - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |s AS (
        |  SELECT user_id, us,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id,
        |  MIN(us) AS session_start_us,
        |  MAX(us) - MIN(us) AS session_len_us,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q_embedding_centroids" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (
        |  SELECT label, CAST(i AS BIGINT) AS dim, v[i] AS val
        |  FROM e, UNNEST(range(1, 65)) AS t(i))
        |SELECT label, dim, ROUND(AVG(val), 6) AS centroid, COUNT(*) AS n_vecs
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q_kv_array_lookup" ->
      """WITH e AS (
        |  SELECT user_id,
        |    [{'key': 'tracker', 'value': CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR)},
        |     {'key': 'etype', 'value': event_type}] AS settings
        |  FROM events),
        |x AS (
        |  SELECT user_id,
        |    list_filter(settings, s -> s.key = 'tracker')[1].value AS tracker,
        |    list_filter(settings, s -> s.key = 'etype')[1].value AS etype
        |  FROM e)
        |SELECT user_id,
        |  MAX(CAST(tracker AS BIGINT)) AS tracker_token,
        |  COUNT(DISTINCT etype) AS n_etypes
        |FROM x GROUP BY 1""".stripMargin,
    "q_dedup_resolve" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  CASE WHEN len(toks) >= 3
        |    THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |    ELSE CAST([] AS VARCHAR[]) END AS shs
        |  FROM t),
        |ex AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS sh FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter,
        |    MAX(a.sz) AS sz_a, MAX(b.sz) AS sz_b
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT doc_a, doc_b FROM pairs
        |  WHERE ROUND(inter / (sz_a + sz_b - inter), 6) >= 0.05),
        |edges AS (
        |  SELECT doc_b AS doc_id, doc_a AS partner FROM cand
        |  UNION ALL
        |  SELECT doc_a AS doc_id, doc_b AS partner FROM cand)
        |SELECT doc_id,
        |  LEAST(MIN(partner), MIN(doc_id)) AS canonical_id,
        |  COUNT(*) AS n_partners
        |FROM edges GROUP BY 1""".stripMargin,
    "q_dedup_resolve_cc" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  CASE WHEN len(toks) >= 3
        |    THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |    ELSE CAST([] AS VARCHAR[]) END AS shs
        |  FROM t),
        |ex AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS sh FROM s),
        |dfok AS (SELECT sh FROM ex GROUP BY sh HAVING COUNT(*) <= 4),
        |exc AS (SELECT ex.doc_id, ex.sz, ex.sh FROM ex JOIN dfok USING (sh)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter,
        |    MAX(a.sz) AS sz_a, MAX(b.sz) AS sz_b
        |  FROM exc a JOIN exc b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT doc_a, doc_b FROM pairs
        |  WHERE ROUND(inter / (sz_a + sz_b - inter), 6) >= 0.05),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM cand
        |  UNION ALL
        |  SELECT doc_b AS src, doc_a AS dst FROM cand),
        |reach(doc_id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT reach.doc_id, e.dst FROM reach JOIN edges e ON reach.r = e.src)
        |SELECT doc_id, MIN(r) AS canonical_id FROM reach GROUP BY 1""".stripMargin,
    "q_ann_ivf" ->
      """WITH e AS (SELECT vec_id, label AS true_label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (
        |  SELECT true_label AS label, CAST(i AS BIGINT) AS dim, v[i] AS val
        |  FROM e, UNNEST(range(1, 65)) AS t(i)),
        |cent AS (
        |  SELECT label, dim, ROUND(AVG(val), 6) AS centroid FROM x GROUP BY 1, 2),
        |ca AS (
        |  SELECT label, list(centroid ORDER BY dim) AS cv FROM cent GROUP BY 1),
        |scored AS (
        |  SELECT e.vec_id, e.v, ca.label,
        |    ROUND(list_sum(list_transform(range(1, 65), i -> e.v[i] * ca.cv[i]))
        |      / (sqrt(list_sum(list_transform(e.v, y -> y*y)))
        |         * sqrt(list_sum(list_transform(ca.cv, y -> y*y)))), 6) AS ccos
        |  FROM e, ca),
        |assigned AS (
        |  SELECT vec_id, v, label AS bucket FROM scored
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, label) = 1),
        |probes AS (
        |  SELECT vec_id AS q_id, label AS bucket FROM scored
        |  WHERE vec_id < 5
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, label) <= 2),
        |pairs AS (
        |  SELECT p.q_id, c.vec_id AS n_id,
        |    ROUND(list_sum(list_transform(range(1, 65), i -> qe.v[i] * c.v[i]))
        |      / (sqrt(list_sum(list_transform(qe.v, y -> y*y)))
        |         * sqrt(list_sum(list_transform(c.v, y -> y*y)))), 6) AS cos
        |  FROM probes p
        |  JOIN e qe ON qe.vec_id = p.q_id
        |  JOIN assigned c ON c.bucket = p.bucket AND c.vec_id <> p.q_id)
        |SELECT q_id,
        |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank,
        |  n_id, cos
        |FROM pairs
        |QUALIFY rank <= 3""".stripMargin,
    "q_rolling_window" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, ROUND(SUM(value), 6) AS day_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT user_id, day, day_value,
        |  ROUND(SUM(day_value) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 6) AS rolling_7d
        |FROM daily""".stripMargin,
    "q_funnel_sequence" ->
      """WITH s0 AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS t_signup
        |  FROM events GROUP BY 1),
        |s1 AS (
        |  SELECT s0.user_id, s0.t_signup, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
        |  FROM s0 JOIN events e ON e.user_id = s0.user_id AND e.event_type = 'click'
        |    AND CAST(e.ts AS TIMESTAMP) > s0.t_signup
        |  WHERE s0.t_signup IS NOT NULL
        |  GROUP BY 1, 2),
        |s2 AS (
        |  SELECT s1.user_id, s1.t_signup, s1.t_click, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
        |  FROM s1 JOIN events e ON e.user_id = s1.user_id AND e.event_type = 'purchase'
        |    AND CAST(e.ts AS TIMESTAMP) > s1.t_click
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, t_signup, t_click, t_purchase FROM s2""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin, COUNT(*) AS n,
        |  ROUND(CAST(FLOOR(value / 25.0) AS BIGINT) * 25.0, 6) AS bin_lo
        |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    "q_grouping_sets" ->
      """WITH m AS (
        |  SELECT CASE
        |    WHEN n_name IS NULL THEN 'Unknown'
        |    WHEN n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4','NATION_5') THEN 'APAC'
        |    WHEN n_name IN ('NATION_6','NATION_7','NATION_8','NATION_9','NATION_10') THEN 'EMEA'
        |    WHEN n_name IN ('NATION_11','NATION_12','NATION_13','NATION_14','NATION_15') THEN 'AMER'
        |    WHEN n_name IN ('NATION_16','NATION_17','NATION_18','NATION_19','NATION_20') THEN 'AFRICA'
        |    ELSE 'Others' END AS market,
        |    c_acctbal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |r AS (
        |  SELECT market, COUNT(*) AS customers,
        |    ROUND(SUM(c_acctbal), 2) AS total_acctbal
        |  FROM m GROUP BY ROLLUP(market))
        |SELECT COALESCE(market, 'Overall') AS market, customers, total_acctbal,
        |  CAST(CASE COALESCE(market, 'Overall')
        |    WHEN 'Overall' THEN 0 WHEN 'APAC' THEN 1 WHEN 'EMEA' THEN 2
        |    WHEN 'AMER' THEN 3 WHEN 'AFRICA' THEN 4
        |    WHEN 'Unknown' THEN 99 WHEN 'Others' THEN 100 ELSE 9999 END AS INTEGER) AS market_order
        |FROM r""".stripMargin,
    "q_stratified_sample" ->
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    (ascii(substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 1)) * 256
        |     + ascii(substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 2, 1))) % 100 AS pct
        |  FROM documents)
        |SELECT lang, COUNT(*) AS sampled_docs,
        |  ROUND(AVG(n_chars), 6) AS avg_chars
        |FROM d
        |WHERE pct < CASE WHEN lang = 'en' THEN 50 ELSE 90 END
        |GROUP BY 1""".stripMargin,
    "q_data_split" ->
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    (ascii(substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 1)) * 256
        |     + ascii(substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 2, 1))) % 100 AS pct
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN pct < 80 THEN 'train' WHEN pct < 90 THEN 'valid' ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  ROUND(AVG(n_chars), 6) AS avg_chars
        |FROM d GROUP BY 1, 2""".stripMargin,
    "q_corpus_stats" ->
      """WITH t AS (
        |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT source,
        |  COUNT(DISTINCT doc_id) AS n_docs,
        |  COUNT(*) AS total_tokens,
        |  COUNT(DISTINCT token) AS vocab_size,
        |  ROUND(COUNT(DISTINCT token) / COUNT(*), 6) AS type_token_ratio
        |FROM t WHERE token <> '' GROUP BY 1""".stripMargin
  )
}
