package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Statistical / data-science batch (SURVEY §2 #118-125): the
  * profiling, record-linkage, stochastic-process and graph-metric
  * shapes an analytics engine is asked for once the relational core
  * exists — column profiling (#118), blocked fuzzy record linkage
  * (#119), Markov transition matrices (#120), A/B-test lift with a
  * two-proportion z-score (#121), Spearman rank correlation (#122),
  * triangle counting / clustering coefficient (#123), exact-dyadic
  * EWMA smoothing (#124) and CUSUM changepoint detection (#125).
  *
  * Cross-engine determinism notes: every ranked selection is
  * tie-broken on a key column; EWMA uses α = 1/2 so the geometric
  * scaling (powers of two) is EXACT in doubles and both engines
  * produce bit-identical values; the Spearman rho stays in integer
  * arithmetic until the final division.
  */
object Stats {

  /** #118 COLUMN PROFILING — the per-column data-quality report
    * every ETL suite emits before trusting a feed (the statistical
    * generalization of the reference's schema/range checks,
    * reference tasks/base.py schema gate + validation/Checks.scala
    * here): for each column of `customer`, row/null/distinct counts,
    * numeric min/max, and mean string length.
    *
    * Scale shape: ONE aggregate pass over the scan computes all five
    * columns' stats (the multi-COUNT(DISTINCT) rewrites to a single
    * expand + hash agg with map-side partials), and the per-column
    * report rows come from a row-local explode of that single
    * result row — the table is read once, nothing loops per column. */
  def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    def nNull(cn: String) = count(when(col(cn).isNull, 1)).as(s"${cn}_null")
    val a = c.agg(
      count(lit(1)).as("n_rows"),
      nNull("c_custkey"), countDistinct(col("c_custkey")).as("c_custkey_nd"),
      round(min(col("c_custkey").cast("double")), 6).as("c_custkey_min"),
      round(max(col("c_custkey").cast("double")), 6).as("c_custkey_max"),
      nNull("c_name"), countDistinct(col("c_name")).as("c_name_nd"),
      round(avg(length(col("c_name")).cast("double")), 6).as("c_name_len"),
      nNull("c_nationkey"), countDistinct(col("c_nationkey")).as("c_nationkey_nd"),
      round(min(col("c_nationkey").cast("double")), 6).as("c_nationkey_min"),
      round(max(col("c_nationkey").cast("double")), 6).as("c_nationkey_max"),
      nNull("c_acctbal"), countDistinct(col("c_acctbal")).as("c_acctbal_nd"),
      round(min(col("c_acctbal")), 6).as("c_acctbal_min"),
      round(max(col("c_acctbal")), 6).as("c_acctbal_max"),
      nNull("c_mktsegment"), countDistinct(col("c_mktsegment")).as("c_mktsegment_nd"),
      round(avg(length(col("c_mktsegment")).cast("double")), 6).as("c_mktsegment_len"))
    val dNull = lit(null).cast("double")
    def row(name: String, nd: String, mn: Column, mx: Column, len: Column) =
      struct(lit(name).as("col_name"), col("n_rows"),
        col(s"${name}_null").as("n_null"), col(nd).as("n_distinct"),
        mn.as("min_num"), mx.as("max_num"), len.as("avg_len"))
    a.select(explode(array(
        row("c_custkey", "c_custkey_nd", col("c_custkey_min"), col("c_custkey_max"), dNull),
        row("c_name", "c_name_nd", dNull, dNull, col("c_name_len")),
        row("c_nationkey", "c_nationkey_nd", col("c_nationkey_min"), col("c_nationkey_max"), dNull),
        row("c_acctbal", "c_acctbal_nd", col("c_acctbal_min"), col("c_acctbal_max"), dNull),
        row("c_mktsegment", "c_mktsegment_nd", dNull, dNull, col("c_mktsegment_len"))
      )).as("p"))
      .select(col("p.*"))
  }

  /** #119 BLOCKED FUZZY RECORD LINKAGE — entity resolution on the
    * part-name dictionary: names within edit distance ≤ 2 are match
    * candidates, but only pairs sharing a BLOCKING KEY (the head
    * noun) are ever compared — the classic blocking design that
    * makes record linkage subquadratic (same philosophy as the LSH
    * band index in dedup/TextDedup.scala, applied to structured
    * records).
    *
    * Scale shape: the distinct-name dictionary build is a map-side-
    * combined agg (the dictionary is orders of magnitude smaller
    * than the record table); the quadratic levenshtein step is
    * BLOCK-LOCAL via a SHUFFLE_HASH self-join on the blocking key;
    * record counts ride the dictionary rows so mapping matches back
    * to record volume costs no extra join. */
  def entityMatch(s: SparkSession, dir: String): DataFrame = {
    val dict = Tables.part(s, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_recs"))
      // coalesce to '' so a single-token name blocks like DuckDB's
      // split_part (which returns '' past the last token, not NULL)
      .withColumn("block", coalesce(split(col("p_name"), " ").getItem(1), lit("")))
    dict.as("a")
      .join(dict.as("b").hint("shuffle_hash"),
        col("a.block") === col("b.block") && col("a.p_name") < col("b.p_name"))
      .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= 2)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"),
        col("a.n_recs").as("n_recs_a"), col("b.n_recs").as("n_recs_b"))
  }

  /** #120 MARKOV TRANSITION MATRIX — per-user event-type transition
    * probabilities (the behavioral-model summary next to the funnel
    * (#63) and timeline (#101) views: "after a view, what happens
    * next?").
    *
    * Scale shape: ONE user-keyed window gives each event its
    * successor (no self-join), one map-side-combined agg counts
    * (from, to) cells, and the row-normalizing totals come from a
    * second tiny window over the |event_types|² cell frame — raw
    * events shuffle exactly once. */
  def markovChain(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cells = Tables.events(s, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("from_type"))
    cells.select(col("from_type"), col("to_type"), col("n"),
      round(col("n").cast("double") / sum(col("n")).over(tot), 6).as("p"))
  }

  /** #121 A/B-TEST LIFT — deterministic 50/50 experiment assignment
    * (md5 bucket — the reproducible-split idiom of #58/#61, no
    * rand()), per-variant conversion to `purchase`, absolute lift
    * and the pooled two-proportion z-score an experimentation
    * readout reports.
    *
    * Scale shape: per-user conversion flags are one map-side-
    * combined agg over the event scan; the variant split and both
    * rates collapse into ONE conditional-aggregate pass over the
    * per-user frame; the z-score is row-local arithmetic on a
    * single summary row. All inputs to the score are exact integer
    * counts, so both engines compute identical doubles. */
  def abLift(s: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("user_id").cast("string"), lit(":ab")))
    val bucket = (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 2
    val users = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      .withColumn("variant", when(bucket === 0, "control").otherwise("treatment"))
    users.agg(
        count(when(col("variant") === "control", 1)).as("n_control"),
        count(when(col("variant") === "control" && col("conv") === 1, 1)).as("conv_control"),
        count(when(col("variant") === "treatment", 1)).as("n_treatment"),
        count(when(col("variant") === "treatment" && col("conv") === 1, 1)).as("conv_treatment"))
      .select(col("n_control"), col("conv_control"), col("n_treatment"), col("conv_treatment"),
        round(col("conv_control").cast("double") / col("n_control"), 6).as("rate_control"),
        round(col("conv_treatment").cast("double") / col("n_treatment"), 6).as("rate_treatment"),
        round(col("conv_treatment").cast("double") / col("n_treatment")
          - col("conv_control").cast("double") / col("n_control"), 6).as("lift"),
        round(
          (col("conv_treatment").cast("double") / col("n_treatment")
            - col("conv_control").cast("double") / col("n_control"))
          // degenerate experiments (0% or 100% pooled conversion) have a
          // zero standard error: NULL z rather than a divide-by-zero
          / nullif(sqrt(
              ((col("conv_control") + col("conv_treatment")).cast("double")
                / (col("n_control") + col("n_treatment")))
              * (lit(1.0) - (col("conv_control") + col("conv_treatment")).cast("double")
                  / (col("n_control") + col("n_treatment")))
              * (lit(1.0) / col("n_control") + lit(1.0) / col("n_treatment"))), lit(0.0)),
          6).as("z_score"))
  }

  /** #122 SPEARMAN RANK CORRELATION — per-source monotonic
    * association between document length and whitespace token count
    * (the "are these two quality signals redundant?" check a
    * curation run asks about its metric columns).
    *
    * Deterministic variant: ranks are `row_number` with a doc_id
    * tie-break, so each metric's ranks are a PERMUTATION of 1..n and
    * rho = 1 − 6·Σd²/(n(n²−1)) holds in EXACT integer arithmetic
    * until the final division — the gate is an exact hash compare.
    *
    * Scale shape: two per-source ranking windows (distributed range-
    * partitioned sorts — the unavoidable cost of exact ranks) over a
    * 2-metric projection, then one map-side-combined agg; Σd² stays
    * in BIGINT (a 10¹⁰-row source needs DECIMAL — noted, not hit at
    * any test SF). */
  def rankCorr(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"))
    val wx = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val wy = Window.partitionBy(col("source")).orderBy(col("ws_tokens"), col("doc_id"))
    d.withColumn("rx", row_number().over(wx).cast("long"))
      .withColumn("ry", row_number().over(wy).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("sum_d2"))
      .select(col("source"), col("n_docs"), col("sum_d2"),
        round(lit(1.0) - lit(6.0) * col("sum_d2")
          / (col("n_docs") * (col("n_docs") * col("n_docs") - 1)).cast("double"),
          6).as("spearman_rho"))
      .filter(col("n_docs") > 1)
  }

  /** #123 TRIANGLE COUNT + GLOBAL CLUSTERING COEFFICIENT over the
    * co-purchase graph (same edge definition as #106 PageRank:
    * parts sharing an order) — the graph-density summary next to
    * the iterative family (PageRank, connected components).
    *
    * Scale shape: the distinct directed EDGE frame is materialized
    * ONCE (GraphCore.copurchaseEdges — hub-safe: per-row agg state is
    * a single edge, never a node's whole neighborhood; its consumers
    * would otherwise each replay the lineitem self-join). Triangle
    * enumeration is the shared GraphCore builder (one definition with
    * #138): edges ORIENTED by the (degree, id) total order —
    * compact-forward, O(√m) out-neighborhoods, the skew killer on a
    * power-law graph — wedges generated ROW-LOCALLY from each
    * source's sorted out-neighbor array (Σ outdeg² bound), pruned by
    * the edge-set bloom before the exchange (41M → ~2M rows at
    * sf0.1, exact: no false negatives), closed by ONE SHUFFLE_HASH
    * probe (never broadcast — the edge set is the big side at
    * scale). Node/edge/wedge counts are scalar aggregates off the
    * adjacency row (Σ deg·(deg−1)/2 in exact integers). The one-row
    * outputs compose via broadcast-scalar cross joins (the
    * Analytics.scala factor idiom). */
  def triangleCount(s: SparkSession, dir: String): DataFrame = {
    val edges = GraphCore.copurchaseEdges(s, dir)
    val degL = col("deg").cast("long")
    // node/edge/wedge scalars off the node-sized degree frame (one
    // map-side count over the edge frame — Σ deg·(deg−1)/2 in exact
    // integers; no neighbor arrays anywhere in this plan)
    val nodesEdges = GraphCore.degreesOf(edges).agg(
      count(lit(1)).as("n_nodes"),
      (sum(degL) / 2).cast("long").as("n_edges"),
      (sum(degL * (degL - 1)) / 2).cast("long").as("n_wedges"))
    val tri = GraphCore.triangles(GraphCore.orientedOf(edges))
      .agg(count(lit(1)).as("n_triangles"))
    nodesEdges.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / nullif(col("n_wedges").cast("double"), lit(0.0)),
          6).as("global_clustering"))
  }

  /** #236 SAMPLED TRIANGLE ESTIMATE (`q_triangle_estimate`) — DOULION
    * (Tsourakakis et al., KDD 2009): keep each undirected edge with
    * probability p, count triangles EXACTLY on the sampled graph,
    * estimate the true count as t_sampled / p³ — unbiased, and
    * concentration follows from the triangle count itself
    * (Var/E² ≲ 1/(p³·t)), so on any graph dense enough for the exact
    * count to hurt, the estimate is tight. This is the AT-SCALE
    * sibling of #123's exact form — the one bench-tail row whose
    * 14.2x ScaleProbe growth is provably optimal for exact semantics
    * (work ≡ Σ outdeg², which the oriented plan already minimizes):
    * sampling is the only way below it, and the wedge work shrinks by
    * p² (p = 0.1 → 100x less closure shuffle). The sampling is
    * DETERMINISTIC (md5 of the canonical edge key, the engine-portable
    * convention every sampler here uses — no rand()), so the oracle
    * replays the identical sample and the gate hash-matches estimate
    * and flag exactly. The keep probability is the EXACT mass of the
    * two-hex-char bucket below the threshold — 126/256, not 50/100:
    * the 256 equiprobable (char, char) pairs spread unevenly over the
    * 100 residues, and an estimator dividing by the nominal rate
    * would carry a silent −4.7% bias (measured: it was most of the
    * gate's apparent "sampling error"). The intermediate
    * t·256³ stays integer-exact in a double, so multiply-then-divide
    * is bit-identical across engines. Production tunes p DOWN with
    * corpus size (p ∝ n^(-1/3) holds accuracy constant — ScaleProbe's
    * doulion_scaled row measures that recipe at 2.9x for 16x data vs
    * the exact form's ~12x). The flag recomputes the EXACT count
    * alongside (the #49/#98 convention): tolerance is graded data,
    * not a promise. */
  def triangleEstimate(s: SparkSession, dir: String): DataFrame = {
    val edges = GraphCore.copurchaseEdges(s, dir)
    val canon = edges.filter(col("src") < col("dst"))
    val h = md5(concat(col("src").cast("string"), lit(":"),
      col("dst").cast("string"), lit(":doulion")))
    val pct = (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 100
    val sampled = GraphCore.edgesFromDistinctPairs(
      canon.filter(pct < 50).select(col("src").as("pa"), col("dst").as("pb")))
    val est = GraphCore.triangles(GraphCore.orientedOf(sampled))
      .agg(count(lit(1)).as("t_sampled"))
    val exact = GraphCore.triangles(GraphCore.orientedOf(edges))
      .agg(count(lit(1)).as("n_triangles"))
    // p = 126/256 exactly, so 1/p^3 = 256^3/126^3 = 16777216/2000376;
    // multiply-then-divide keeps the intermediate integer-exact in a
    // double (t*2^24 << 2^53) -> bit-identical across engines
    val estimate =
      round(col("t_sampled") * lit(16777216.0) / lit(2000376.0), 6)
    exact.crossJoin(broadcast(est))
      .select(col("n_triangles"), col("t_sampled"),
        estimate.as("estimate"),
        (abs(col("t_sampled") * lit(16777216.0) / lit(2000376.0) -
            col("n_triangles")) /
          nullif(col("n_triangles").cast("double"), lit(0.0)) <= 0.25)
          .cast("int").as("est_within_25pct"))
  }

  /** #238 ESTIMATOR-ONLY DOULION (`q_triangle_doulion`) — the
    * PRODUCTION identity of #236, published as its own bench row: the
    * gate above deliberately recomputes the exact triangle count for
    * its tolerance flag (the #49/#98 graded-data convention), so its
    * timing necessarily tracks the EXACT side's Θ(Σ outdeg²) curve —
    * it was the one disputed row in BENCH_r12. This query is the path
    * a deployment actually runs: sample, count on the sample, scale by
    * 1/p³ — nothing exact anywhere, so its bench row measures the
    * estimator's own cost (wedge work ∝ p² of the exact form's; the
    * at-scale p ∝ n^(-1/3) recipe is ScaleProbe's `doulion_scaled`
    * row, measured 2.9x under 16x data vs the exact ~12x). Same
    * deterministic md5 sample and exact-rational 126/256 mass as
    * #236, so the oracle replays it hash-exactly; accuracy is graded
    * by #236's own flag on the identical sample. */
  def triangleDoulion(s: SparkSession, dir: String): DataFrame = {
    val edges = GraphCore.copurchaseEdges(s, dir)
    val canon = edges.filter(col("src") < col("dst"))
    val h = md5(concat(col("src").cast("string"), lit(":"),
      col("dst").cast("string"), lit(":doulion")))
    val pct = (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 100
    val sampled = GraphCore.edgesFromDistinctPairs(
      canon.filter(pct < 50).select(col("src").as("pa"), col("dst").as("pb")))
    GraphCore.triangles(GraphCore.orientedOf(sampled))
      .agg(count(lit(1)).as("t_sampled"))
      .select(col("t_sampled"),
        round(col("t_sampled") * lit(16777216.0) / lit(2000376.0), 6)
          .as("estimate"))
  }

  /** #124 EWMA SMOOTHING (α = 1/2) of each event type's daily value
    * total — the denoised view a metrics dashboard overlays on the
    * raw series (complements #62's rolling mean and #116's anomaly
    * flags).
    *
    * α = 1/2 is chosen so the geometric weights are powers of two:
    * the recurrence unrolls to s_t = 2^−(t−1)·x₁ + Σ 2^−(t−i+1)·x_i
    * computed as ONE ordered window cumsum of u_i = x_i·2^i, and
    * because dyadic scaling is exact in IEEE doubles and both
    * engines run the cumsum in the same day order, the result is
    * bit-identical across engines — an exact hash gate on a
    * floating-point recurrence.
    *
    * Scale shape: one map-side-combined daily agg over the scan,
    * then one tiny per-type ordered window; the 2^i scaling caps at
    * the series length (the reporting window bounds it in
    * production — 2^1000 would overflow, 2^30 is exact). */
  def ewmaSmooth(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 6).as("x"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("t", row_number().over(wOrd).cast("double"))
      .withColumn("x1", first(col("x")).over(wCum))
      .withColumn("cum", sum(col("x") * pow(lit(2.0), col("t"))).over(wCum))
      .select(col("event_type"), col("day"), col("x"),
        round(
          pow(lit(2.0), lit(1.0) - col("t")) * col("x1") +
            pow(lit(2.0), -col("t") - 1) * (col("cum") - col("x1") * 2),
          6).as("ewma"))
  }

  /** #125 CUSUM CHANGEPOINT — for each event type's daily count
    * series, the day where the cumulative deviation from the series
    * mean peaks in magnitude: the standard single-changepoint
    * estimator (where did the level shift?) behind drift monitors —
    * the "when" to #112 PSI's "how much" and #116 MAD's "which
    * days".
    *
    * Scale shape: daily counts are one map-side-combined agg; the
    * mean joins back as a broadcast scalar per type; the CUSUM is
    * one ordered window cumsum over the tiny daily frame and the
    * argmax day is a rank-1 filter with a day tie-break — raw
    * events are scanned once. */
  def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val mean = daily.groupBy(col("event_type"))
      .agg((sum(col("n")).cast("double") / count(lit(1))).as("mu"),
        count(lit(1)).as("n_days"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = daily.join(broadcast(mean), Seq("event_type"))
      .withColumn("cusum", sum(col("n").cast("double") - col("mu")).over(wCum))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("day"))
    cusum.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n_days"),
        col("day").as("cp_day"), round(col("cusum"), 6).as("peak_cusum"),
        round(col("mu"), 6).as("mean_daily"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_column_profile" -> columnProfile _,
    "q_entity_match"   -> entityMatch _,
    "q_markov_chain"   -> markovChain _,
    "q_ab_lift"        -> abLift _,
    "q_rank_corr"      -> rankCorr _,
    "q_triangle_count" -> triangleCount _,
    "q_triangle_estimate" -> triangleEstimate _,
    "q_triangle_doulion" -> triangleDoulion _,
    "q_ewma_smooth"    -> ewmaSmooth _,
    "q_cusum_changepoint" -> cusumChangepoint _
  )

  val oracles: Map[String, String] = Map(
    "q_column_profile" ->
      """SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS n_null,
        |  COUNT(DISTINCT c_custkey) AS n_distinct,
        |  ROUND(MIN(CAST(c_custkey AS DOUBLE)), 6) AS min_num,
        |  ROUND(MAX(CAST(c_custkey AS DOUBLE)), 6) AS max_num,
        |  CAST(NULL AS DOUBLE) AS avg_len
        |FROM customer
        |UNION ALL
        |SELECT 'c_name', COUNT(*),
        |  COUNT(CASE WHEN c_name IS NULL THEN 1 END),
        |  COUNT(DISTINCT c_name),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  ROUND(AVG(CAST(LEN(c_name) AS DOUBLE)), 6)
        |FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', COUNT(*),
        |  COUNT(CASE WHEN c_nationkey IS NULL THEN 1 END),
        |  COUNT(DISTINCT c_nationkey),
        |  ROUND(MIN(CAST(c_nationkey AS DOUBLE)), 6),
        |  ROUND(MAX(CAST(c_nationkey AS DOUBLE)), 6),
        |  CAST(NULL AS DOUBLE)
        |FROM customer
        |UNION ALL
        |SELECT 'c_acctbal', COUNT(*),
        |  COUNT(CASE WHEN c_acctbal IS NULL THEN 1 END),
        |  COUNT(DISTINCT c_acctbal),
        |  ROUND(MIN(c_acctbal), 6), ROUND(MAX(c_acctbal), 6),
        |  CAST(NULL AS DOUBLE)
        |FROM customer
        |UNION ALL
        |SELECT 'c_mktsegment', COUNT(*),
        |  COUNT(CASE WHEN c_mktsegment IS NULL THEN 1 END),
        |  COUNT(DISTINCT c_mktsegment),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  ROUND(AVG(CAST(LEN(c_mktsegment) AS DOUBLE)), 6)
        |FROM customer""".stripMargin,
    "q_entity_match" ->
      """WITH dict AS (
        |  SELECT p_name, COUNT(*) AS n_recs, split_part(p_name, ' ', 2) AS block
        |  FROM part GROUP BY p_name)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |  a.n_recs AS n_recs_a, b.n_recs AS n_recs_b
        |FROM dict a JOIN dict b
        |  ON a.block = b.block AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,
    "q_markov_chain" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |cells AS (
        |  SELECT from_type, to_type, COUNT(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM cells""".stripMargin,
    "q_ab_lift" ->
      """WITH users AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
        |    CASE WHEN (ascii(substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1)) * 256
        |             + ascii(substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 2, 1))) % 2 = 0
        |         THEN 'control' ELSE 'treatment' END AS variant
        |  FROM events GROUP BY user_id),
        |agg AS (
        |  SELECT
        |    COUNT(CASE WHEN variant = 'control' THEN 1 END) AS n_control,
        |    COUNT(CASE WHEN variant = 'control' AND conv = 1 THEN 1 END) AS conv_control,
        |    COUNT(CASE WHEN variant = 'treatment' THEN 1 END) AS n_treatment,
        |    COUNT(CASE WHEN variant = 'treatment' AND conv = 1 THEN 1 END) AS conv_treatment
        |  FROM users)
        |SELECT n_control, conv_control, n_treatment, conv_treatment,
        |  ROUND(CAST(conv_control AS DOUBLE) / n_control, 6) AS rate_control,
        |  ROUND(CAST(conv_treatment AS DOUBLE) / n_treatment, 6) AS rate_treatment,
        |  ROUND(CAST(conv_treatment AS DOUBLE) / n_treatment
        |      - CAST(conv_control AS DOUBLE) / n_control, 6) AS lift,
        |  ROUND(
        |    (CAST(conv_treatment AS DOUBLE) / n_treatment
        |      - CAST(conv_control AS DOUBLE) / n_control)
        |    / NULLIF(sqrt(
        |        (CAST(conv_control + conv_treatment AS DOUBLE) / (n_control + n_treatment))
        |        * (1.0 - CAST(conv_control + conv_treatment AS DOUBLE) / (n_control + n_treatment))
        |        * (1.0 / n_control + 1.0 / n_treatment)), 0.0),
        |    6) AS z_score
        |FROM agg""".stripMargin,
    "q_rank_corr" ->
      """WITH d AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens
        |  FROM documents),
        |ranked AS (
        |  SELECT source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rx,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY ws_tokens, doc_id) AS BIGINT) AS ry
        |  FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
        |  ROUND(1.0 - 6.0 * SUM((rx - ry) * (rx - ry))
        |    / CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1) AS DOUBLE), 6) AS spearman_rho
        |FROM ranked GROUP BY source HAVING COUNT(*) > 1""".stripMargin,
    "q_triangle_count" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT node, COUNT(*) AS deg FROM (
        |    SELECT pa AS node FROM pairs UNION ALL SELECT pb FROM pairs)
        |  GROUP BY node),
        |ne AS (
        |  SELECT COUNT(*) AS n_nodes,
        |    CAST(SUM(deg) / 2 AS BIGINT) AS n_edges,
        |    CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges
        |  FROM deg),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM pairs e1
        |  JOIN pairs e2 ON e1.pb = e2.pa
        |  JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  ROUND(3.0 * n_triangles / NULLIF(CAST(n_wedges AS DOUBLE), 0.0), 6)
        |    AS global_clustering
        |FROM ne, tri""".stripMargin,
    "q_triangle_estimate" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |samp AS (
        |  SELECT pa, pb FROM pairs
        |  WHERE (ascii(substr(md5(CAST(pa AS VARCHAR) || ':' ||
        |                          CAST(pb AS VARCHAR) || ':doulion'), 1, 1)) * 256
        |       + ascii(substr(md5(CAST(pa AS VARCHAR) || ':' ||
        |                          CAST(pb AS VARCHAR) || ':doulion'), 2, 1))) % 100 < 50),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM pairs e1
        |  JOIN pairs e2 ON e1.pb = e2.pa
        |  JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        |stri AS (
        |  SELECT COUNT(*) AS t_sampled
        |  FROM samp e1
        |  JOIN samp e2 ON e1.pb = e2.pa
        |  JOIN samp e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
        |SELECT n_triangles, t_sampled,
        |  ROUND(t_sampled * 16777216.0 / 2000376.0, 6) AS estimate,
        |  CAST(ABS(t_sampled * 16777216.0 / 2000376.0 - n_triangles)
        |       / NULLIF(CAST(n_triangles AS DOUBLE), 0.0) <= 0.25 AS INT)
        |    AS est_within_25pct
        |FROM tri, stri""".stripMargin,
    "q_triangle_doulion" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |samp AS (
        |  SELECT pa, pb FROM pairs
        |  WHERE (ascii(substr(md5(CAST(pa AS VARCHAR) || ':' ||
        |                          CAST(pb AS VARCHAR) || ':doulion'), 1, 1)) * 256
        |       + ascii(substr(md5(CAST(pa AS VARCHAR) || ':' ||
        |                          CAST(pb AS VARCHAR) || ':doulion'), 2, 1))) % 100 < 50),
        |stri AS (
        |  SELECT COUNT(*) AS t_sampled
        |  FROM samp e1
        |  JOIN samp e2 ON e1.pb = e2.pa
        |  JOIN samp e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
        |SELECT t_sampled,
        |  ROUND(t_sampled * 16777216.0 / 2000376.0, 6) AS estimate
        |FROM stri""".stripMargin,
    "q_ewma_smooth" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, ROUND(SUM(value), 6) AS x
        |  FROM events GROUP BY 1, 2),
        |numbered AS (
        |  SELECT event_type, day, x,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS DOUBLE) AS t
        |  FROM daily),
        |seq AS (
        |  SELECT event_type, day, x, t,
        |    FIRST_VALUE(x) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x1,
        |    SUM(x * POW(2.0, t)) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM numbered)
        |SELECT event_type, day, x,
        |  ROUND(POW(2.0, 1.0 - t) * x1 + POW(2.0, -t - 1.0) * (cum - x1 * 2), 6) AS ewma
        |FROM seq""".stripMargin,
    "q_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu, COUNT(*) AS n_days
        |  FROM daily GROUP BY event_type),
        |c AS (
        |  SELECT d.event_type, d.day, m.mu, m.n_days,
        |    SUM(CAST(d.n AS DOUBLE) - m.mu) OVER (
        |      PARTITION BY d.event_type ORDER BY d.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM daily d JOIN m USING (event_type)),
        |picked AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY event_type ORDER BY ABS(cusum) DESC, day) AS rn
        |  FROM c)
        |SELECT event_type, n_days, day AS cp_day,
        |  ROUND(cusum, 6) AS peak_cusum, ROUND(mu, 6) AS mean_daily
        |FROM picked WHERE rn = 1""".stripMargin
  )
}
