package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.TextDedup
import graft.similarity.Embeddings
import graft.sources.Tables

/** Training-data preparation batch D (SURVEY §2 #190-195): the
  * EVALUATION side of a training-data program — pass@k estimation,
  * arena-style pairwise model comparison (win matrix + Bradley-Terry
  * ratings), SFT conversation assembly, LSH banding-parameter tuning,
  * and truncated-embedding (Matryoshka-style) retrieval recall.
  *
  * Float discipline (house rules): any DISTRIBUTED sum of doubles is
  * carried as round(x·1e9) integer nano-units and summed exactly;
  * row-local double chains are written with identical operation order
  * in both engines so the IEEE results are bit-equal before any
  * rounding.
  */
object TrainingD {

  /** #190 PASS@K ESTIMATION (Chen et al. 2021, "Evaluating Large
    * Language Models Trained on Code"): the unbiased estimator
    * pass@k = 1 − C(n−c,k)/C(n,k), computed in the numerically stable
    * product form 1 − Π_{i=0}^{k−1} (n−c−i)/(n−i). Problems are
    * users, samples their purchase events, "correct" = value > 10;
    * k ∈ {1,2,4} over problems with n ≥ 4 samples.
    *
    * Scale shape: one map-side-combined (user) agg over the event
    * scan; the k-explode multiplies the tiny per-problem frame, not
    * the events. The per-problem product is a row-local ascending-i
    * fold (identical order in both engines); the cross-problem mean
    * is summed in exact integer nano-units, never a distributed
    * double sum. */
  def passAtK(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 10.0, 1L).otherwise(0L)).as("c"))
      .filter(col("n") >= 4)
    val rows = per.select(col("n"), col("c"),
      explode(array(lit(1), lit(2), lit(4))).as("k"))
    // ascending-i left fold; once a factor hits zero (n−c < k) the
    // product is 0 and pass@k = 1, exactly the combinatorial value
    val prod = aggregate(sequence(lit(0), col("k") - 1), lit(1.0),
      (acc, i) => acc * ((col("n") - col("c") - i).cast("double")
        / (col("n") - i).cast("double")))
    rows
      .withColumn("nano", round((lit(1.0) - prod) * 1e9).cast("long"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_problems"), sum(col("nano")).as("pass_nano_sum"))
      .select(col("k").cast("long").as("k"), col("n_problems"),
        col("pass_nano_sum"),
        (col("pass_nano_sum").cast("double") / col("n_problems") / 1e9)
          .as("mean_pass"))
  }

  /** Pairwise MATCHES for the arena family (#191/#192): events pair
    * up by event_id DIV 2 (deterministic, id-contiguous), the two
    * event types compete, higher value wins (exact-tie → the
    * lexicographically smaller type — engine-stable). ONE map-side
    * max_by/min_by agg builds both sides of every match; odd-tail
    * and same-type matches are dropped. */
  private def matches(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(floor(col("event_id") / 2).cast("long").as("m"),
        (col("event_id") % 2).as("side"), col("event_type"), col("value"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("cnt"),
        min_by(struct(col("event_type").as("t"), col("value").as("v")),
          col("side")).as("a"),
        max_by(struct(col("event_type").as("t"), col("value").as("v")),
          col("side")).as("b"))
      .filter(col("cnt") === 2 && col("a.t") =!= col("b.t"))
      .select(least(col("a.t"), col("b.t")).as("x"),
        greatest(col("a.t"), col("b.t")).as("y"),
        when(
          when(col("a.v") > col("b.v"), col("a.t"))
            .when(col("b.v") > col("a.v"), col("b.t"))
            .otherwise(least(col("a.t"), col("b.t")))
            === least(col("a.t"), col("b.t")), 1L).otherwise(0L).as("wx"))

  /** Unordered pair aggregate of [[matches]]: (x < y, n, wins of x). */
  private def pairCounts(s: SparkSession, dir: String): DataFrame =
    matches(s, dir)
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n"), sum(col("wx")).as("wx"))

  /** #191 ARENA WIN MATRIX — the pairwise leaderboard table: per
    * model pair, match count, wins, win rate, and the Wilson-score
    * 95% lower bound (the ranking-stable statistic an arena publishes
    * instead of the raw rate). Everything after the one match agg is
    * a 10-row frame; the Wilson chain is row-local identical-order
    * double arithmetic. */
  def winMatrix(s: SparkSession, dir: String): DataFrame = {
    val z = lit(1.96)
    val z2 = lit(1.96) * lit(1.96)
    val nD = col("n").cast("double")
    val p = col("wx").cast("double") / nD
    val lo = ((p + z2 / (lit(2.0) * nD)
      - z * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nD)) / nD))
      / (lit(1.0) + z2 / nD))
    pairCounts(s, dir)
      .select(col("x").as("model_a"), col("y").as("model_b"),
        col("n").as("n_matches"), col("wx").as("wins_a"),
        round(p, 6).as("winrate_a"), round(lo, 6).as("wilson_lo_a"))
  }

  /** #192 BRADLEY-TERRY RATINGS — two minorization-maximization
    * rounds from a uniform start over the pairwise match counts:
    * r_i ← W_i / Σ_j n_ij/(r_i + r_j), normalized to Σr = 1, with a
    * 6dp re-sync per round so both engines replay the identical
    * fixed point (the house per-round re-sync discipline). The
    * denominator sums and the normalizer run in exact integer
    * nano-units / exact decimal — the model dimension is tiny but
    * the additions must still be order-free. */
  def btRating(s: SparkSession, dir: String): DataFrame = {
    val pairs = pairCounts(s, dir).localCheckpoint()
    val d = pairs.select(col("x").as("i"), col("y").as("j"),
        col("n").as("nij"), col("wx").as("wij"))
      .unionByName(pairs.select(col("y").as("i"), col("x").as("j"),
        col("n").as("nij"), (col("n") - col("wx")).as("wij")))
      .localCheckpoint()
    val w = d.groupBy(col("i"))
      .agg(sum(col("wij")).as("w"), sum(col("nij")).as("n_i"))

    // one MM round: ratings(i) → ratings'(i), 6dp-resynced, Σ=1
    def mmRound(r: DataFrame): DataFrame = {
      val den = d
        .join(broadcast(r.select(col("i"), col("r").as("ri"))), Seq("i"))
        .join(broadcast(r.select(col("i").as("j"), col("r").as("rj"))), Seq("j"))
        .select(col("i"),
          round(col("nij") / (col("ri") + col("rj")) * 1e9).cast("long")
            .as("term_nano"))
        .groupBy(col("i")).agg(sum(col("term_nano")).as("dn"))
      val raw = w.join(broadcast(den), Seq("i"))
        .select(col("i"),
          round(col("w").cast("double") * 1e9 / col("dn"), 6).as("ru"))
      val tot = raw.agg(sum(col("ru").cast("decimal(18,6)")).as("s"))
      raw.crossJoin(broadcast(tot))
        .select(col("i"), round(col("ru") / col("s").cast("double"), 6).as("r"))
    }

    val r0 = w.select(col("i"), lit(1.0).as("r"))
    val r1 = mmRound(r0).localCheckpoint()
    val r2 = mmRound(r1)
    w.join(broadcast(r1.withColumnRenamed("r", "rating_1")), Seq("i"))
      .join(broadcast(r2.withColumnRenamed("r", "rating")), Seq("i"))
      .select(col("i").as("model"), col("n_i").as("n_matches"),
        col("w").as("wins"), col("rating_1"), col("rating"))
  }

  /** #193 SFT CONVERSATION ASSEMBLY — the chat-template step of an
    * instruction-tuning pipeline: per (user, day) the time-ordered
    * event turns alternate user/assistant roles and concatenate into
    * ONE training example string, with turn and length accounting.
    * One exchange (the groupBy); ordering is array_sort over the
    * collected (ts, event_id) struct — no window; role assignment is
    * the post-sort transform index. Values render through
    * decimal(10,2) so both engines print identical digits (a raw
    * double→string cast is format-unstable across engines). */
  def sftAssemble(s: SparkSession, dir: String): DataFrame = {
    val pieces = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"),
        concat(col("event_type"), lit("="),
          col("value").cast("decimal(10,2)").cast("string")).as("piece"))
    pieces
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_turns"),
        array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("piece")))).as("turns"))
      .select(col("user_id"), col("day"), col("n_turns"),
        array_join(transform(col("turns"), (x, i) =>
          concat(when(i % 2 === 0, lit("<|user|>"))
            .otherwise(lit("<|assistant|>")), x.getField("piece"))), "")
          .as("example"))
      .withColumn("n_chars", length(col("example")).cast("long"))
  }

  /** #194 LSH BANDING-PARAMETER SWEEP — the tuning table read before
    * fixing (bands × rows) in production MinHash dedup: for each
    * rows-per-band r ∈ {1,2,4} over the same 8-hash signatures
    * (bands b = 8/r), the measured candidate volume, exact-Jaccard
    * precision at the 0.2 threshold, and recall of the PLANTED
    * near-dup pairs, next to the theoretical S-curve collision
    * probability at J = 0.5 (1−(1−0.5^r)^b).
    *
    * Scale shape: a parameter sweep is a MEASUREMENT, so it runs on
    * a bounded deterministic probe slice (doc_id < 2000 — the media
    * queries' planted-probe convention), which caps the permissive
    * r=1 config's quadratic candidate volume at any corpus size;
    * signatures are computed ONCE (localCheckpoint) and re-banded
    * three ways — banding is an explode over the signature frame,
    * never a corpus re-scan; candidates stay bucket-local per config;
    * verification joins are candidate-sized against ONE shared
    * shingle-set materialization. */
  def lshParamSweep(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 2000)
    val variants = base.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" near dup probe")).as("text"))
    val all = base.unionByName(variants)
    val sigs = TextDedup.minhashSignatures(all, "doc_id", "text")
      .localCheckpoint()
    // ONE shingle-set materialization serves all three verify passes
    // (re-deriving it per config would triple the heaviest row-local
    // work of the query)
    val shingleSets = all.select(col("doc_id").as("__id"),
      array_distinct(transform(
        graft.functions.TextAnalysis.shinglesOfText(col("text")),
        sh => xxhash64(sh))).as("__shs"))
      .localCheckpoint()
    val planted = base.select(col("doc_id").as("doc_a"),
      (col("doc_id") + 1000000L).as("doc_b"))
    val nPlanted = planted.agg(count(lit(1)).as("n_planted"))
    Seq(1, 2, 4).map { r =>
      val b = 8 / r
      val cand = TextDedup.lshCandidates(sigs, "doc_id", 8, r).localCheckpoint()
      val stats = TextDedup.verifyJaccardSets(cand, shingleSets)
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("jaccard") >= 0.2, 1L).otherwise(0L)).as("n_verified"))
      val found = cand.join(planted, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_planted_found"))
      stats.crossJoin(found).crossJoin(nPlanted)
        .select(lit(r).cast("long").as("rows_per_band"),
          lit(b).cast("long").as("n_bands"),
          round(lit(1.0) - pow(lit(1.0) - pow(lit(0.5), lit(r)), lit(b)), 6)
            .as("p_collide_at_05"),
          col("n_candidates"), col("n_verified"),
          round(col("n_verified").cast("double") / col("n_candidates"), 6)
            .as("precision_02"),
          col("n_planted_found"), col("n_planted"),
          round(col("n_planted_found").cast("double") / col("n_planted"), 6)
            .as("recall_planted"))
    }.reduce(_ unionByName _)
  }

  /** #195 TRUNCATED-EMBEDDING RETRIEVAL RECALL (the Matryoshka
    * readout): top-3 neighbors by full 64-dim cosine vs top-3 by the
    * FIRST-32-dims cosine, per probe — the measurement behind
    * "serve half the vector, keep X% of retrieval". Both rankings
    * ride [[Embeddings.bruteForceTopK]] (bounded map-side top-k, the
    * corpus never shuffles); the overlap join is 30 rows. */
  def truncRecall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    def topk(proj: DataFrame) = Embeddings.bruteForceTopK(
      proj.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv")),
      proj.select(col("vec_id").as("n_id"), col("v").as("nv")), 3)
    val full = topk(e.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v")))
      .select(col("q_id"), col("n_id"))
    val trunc = topk(e.select(col("vec_id"),
      slice(Embeddings.asDouble(col("embedding")), 1, 32).as("v")))
      .select(col("q_id"), col("n_id"))
    val overlap = full.join(trunc, Seq("q_id", "n_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("ov"))
    full.select(col("q_id")).distinct()
      .join(overlap, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("ov"), lit(0L)).as("n_overlap"),
        round(coalesce(col("ov"), lit(0L)).cast("double") / 3.0, 6)
          .as("recall_at_3"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pass_at_k"       -> passAtK _,
    "q_win_matrix"      -> winMatrix _,
    "q_bt_rating"       -> btRating _,
    "q_sft_assemble"    -> sftAssemble _,
    "q_lsh_param_sweep" -> lshParamSweep _,
    "q_trunc_recall"    -> truncRecall _)

  /** Shared match/pair CTE chain for the arena oracles. */
  private val matchCte =
    """ev AS (SELECT CAST(FLOOR(event_id / 2) AS BIGINT) AS m,
      |    event_id % 2 AS side, event_type, value FROM events),
      |mm AS (SELECT m, COUNT(*) AS cnt,
      |    arg_min(event_type, side) AS ta, arg_min(value, side) AS va,
      |    arg_max(event_type, side) AS tb, arg_max(value, side) AS vb
      |  FROM ev GROUP BY 1),
      |mt AS (SELECT LEAST(ta, tb) AS x, GREATEST(ta, tb) AS y,
      |    CASE WHEN (CASE WHEN va > vb THEN ta WHEN vb > va THEN tb
      |      ELSE LEAST(ta, tb) END) = LEAST(ta, tb) THEN 1 ELSE 0 END AS wx
      |  FROM mm WHERE cnt = 2 AND ta <> tb),
      |pairs AS (SELECT x, y, COUNT(*) AS n,
      |    CAST(SUM(wx) AS BIGINT) AS wx FROM mt GROUP BY 1, 2)""".stripMargin

  /** The 8-minhash signature + shingle-set CTEs over the planted
    * corpus (base ∪ appended-probe variants). */
  private val sweepSigCte =
    """d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
      |t0 AS (SELECT doc_id, text FROM d0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' near dup probe' FROM d0),
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM t0),
      |s AS (SELECT doc_id,
      |  CASE WHEN len(toks) >= 3
      |    THEN list_transform(range(1, len(toks) - 1),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |    ELSE CAST([] AS VARCHAR[]) END AS sh
      |  FROM t),
      |sig AS (SELECT doc_id, """.stripMargin +
      (0 until 8).map(h =>
        s"list_min(list_transform(sh, x -> md5('$h:' || x))) AS sig_$h")
        .mkString(", ") +
      """ FROM s),
        |shd AS (SELECT doc_id, list_distinct(sh) AS shs FROM s)""".stripMargin

  private def cosOver(a: String, b: String, d: Int): String =
    s"""list_sum(list_transform(range(1, ${d + 1}), i -> $a[i] * $b[i]))
       |  / (sqrt(list_sum(list_transform($a, x -> x*x)))
       |     * sqrt(list_sum(list_transform($b, x -> x*x))))""".stripMargin

  private def top3Cte(name: String, vecExpr: String, d: Int): String =
    s"""${name}_e AS (SELECT vec_id, $vecExpr AS v
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |        FROM embeddings)),
       |${name}_sc AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
       |    ROUND(${cosOver("a.v", "b.v", d)}, 6) AS cos
       |  FROM ${name}_e a, ${name}_e b
       |  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
       |$name AS (
       |  SELECT q_id, n_id FROM ${name}_sc
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, n_id) <= 3)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pass_at_k" ->
      """WITH per AS (SELECT user_id, COUNT(*) AS n,
        |    SUM(CASE WHEN value > 10.0 THEN 1 ELSE 0 END) AS c
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1 HAVING COUNT(*) >= 4),
        |r AS (SELECT n, c, unnest([1, 2, 4]) AS k FROM per),
        |p AS (SELECT k, CAST(ROUND((1.0 - list_reduce(
        |    list_prepend(1.0, list_transform(range(0, k),
        |      i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE))),
        |    (a, b) -> a * b)) * 1000000000, 0) AS BIGINT) AS nano
        |  FROM r)
        |SELECT CAST(k AS BIGINT) AS k, COUNT(*) AS n_problems,
        |  CAST(SUM(nano) AS BIGINT) AS pass_nano_sum,
        |  CAST(SUM(nano) AS DOUBLE) / COUNT(*) / 1000000000 AS mean_pass
        |FROM p GROUP BY 1""".stripMargin,
    "q_win_matrix" ->
      (s"WITH $matchCte\n" +
        """SELECT x AS model_a, y AS model_b, n AS n_matches, wx AS wins_a,
          |  ROUND(CAST(wx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS winrate_a,
          |  ROUND((CAST(wx AS DOUBLE) / CAST(n AS DOUBLE)
          |      + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
          |      - 1.96 * sqrt(((CAST(wx AS DOUBLE) / CAST(n AS DOUBLE))
          |          * (1.0 - CAST(wx AS DOUBLE) / CAST(n AS DOUBLE))
          |          + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE)))
          |        / CAST(n AS DOUBLE)))
          |    / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS wilson_lo_a
          |FROM pairs""".stripMargin),
    "q_bt_rating" ->
      (s"WITH $matchCte,\n" +
        """d AS (SELECT x AS i, y AS j, n AS nij, wx AS wij FROM pairs
          |  UNION ALL
          |  SELECT y, x, n, n - wx FROM pairs),
          |wt AS (SELECT i, CAST(SUM(wij) AS BIGINT) AS w,
          |    CAST(SUM(nij) AS BIGINT) AS n_i FROM d GROUP BY 1),
          |den1 AS (SELECT i, CAST(SUM(CAST(ROUND(
          |      nij / (1.0 + 1.0) * 1000000000, 0) AS BIGINT)) AS BIGINT) AS dn
          |  FROM d GROUP BY 1),
          |r1u AS (SELECT wt.i,
          |    ROUND(CAST(w AS DOUBLE) * 1000000000 / dn, 6) AS ru
          |  FROM wt JOIN den1 USING (i)),
          |t1 AS (SELECT SUM(CAST(ru AS DECIMAL(18,6))) AS s FROM r1u),
          |r1 AS (SELECT i, ROUND(ru / CAST(s AS DOUBLE), 6) AS r FROM r1u, t1),
          |den2 AS (SELECT d.i, CAST(SUM(CAST(ROUND(
          |      nij / (ri.r + rj.r) * 1000000000, 0) AS BIGINT)) AS BIGINT) AS dn
          |  FROM d JOIN r1 ri ON ri.i = d.i JOIN r1 rj ON rj.i = d.j
          |  GROUP BY 1),
          |r2u AS (SELECT wt.i,
          |    ROUND(CAST(w AS DOUBLE) * 1000000000 / dn, 6) AS ru
          |  FROM wt JOIN den2 USING (i)),
          |t2 AS (SELECT SUM(CAST(ru AS DECIMAL(18,6))) AS s FROM r2u),
          |r2 AS (SELECT i, ROUND(ru / CAST(s AS DOUBLE), 6) AS r FROM r2u, t2)
          |SELECT wt.i AS model, n_i AS n_matches, w AS wins,
          |  r1.r AS rating_1, r2.r AS rating
          |FROM wt JOIN r1 USING (i) JOIN r2 USING (i)""".stripMargin),
    "q_sft_assemble" ->
      """WITH p AS (SELECT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(ts AS TIMESTAMP) AS t, event_id,
        |    event_type || '=' ||
        |      CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR) AS piece
        |  FROM events),
        |r AS (SELECT user_id, day, t, event_id,
        |    CASE WHEN (ROW_NUMBER() OVER (PARTITION BY user_id, day
        |        ORDER BY t, event_id) - 1) % 2 = 0
        |      THEN '<|user|>' ELSE '<|assistant|>' END || piece AS turn
        |  FROM p),
        |g AS (SELECT user_id, day, COUNT(*) AS n_turns,
        |    string_agg(turn, '' ORDER BY t, event_id) AS example
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, day, n_turns, example,
        |  CAST(LEN(example) AS BIGINT) AS n_chars
        |FROM g""".stripMargin,
    "q_lsh_param_sweep" ->
      (s"WITH $sweepSigCte,\n" +
        """b1 AS (
          |  SELECT doc_id, 0 AS band, sig_0 AS bucket FROM sig
          |  UNION ALL SELECT doc_id, 1, sig_1 FROM sig
          |  UNION ALL SELECT doc_id, 2, sig_2 FROM sig
          |  UNION ALL SELECT doc_id, 3, sig_3 FROM sig
          |  UNION ALL SELECT doc_id, 4, sig_4 FROM sig
          |  UNION ALL SELECT doc_id, 5, sig_5 FROM sig
          |  UNION ALL SELECT doc_id, 6, sig_6 FROM sig
          |  UNION ALL SELECT doc_id, 7, sig_7 FROM sig),
          |b2 AS (
          |  SELECT doc_id, 0 AS band, sig_0 || '|' || sig_1 AS bucket FROM sig
          |  UNION ALL SELECT doc_id, 1, sig_2 || '|' || sig_3 FROM sig
          |  UNION ALL SELECT doc_id, 2, sig_4 || '|' || sig_5 FROM sig
          |  UNION ALL SELECT doc_id, 3, sig_6 || '|' || sig_7 FROM sig),
          |b4 AS (
          |  SELECT doc_id, 0 AS band,
          |    sig_0 || '|' || sig_1 || '|' || sig_2 || '|' || sig_3 AS bucket
          |  FROM sig
          |  UNION ALL SELECT doc_id, 1,
          |    sig_4 || '|' || sig_5 || '|' || sig_6 || '|' || sig_7 FROM sig),
          |allb AS (
          |  SELECT 1 AS rpb, * FROM b1
          |  UNION ALL SELECT 2, * FROM b2
          |  UNION ALL SELECT 4, * FROM b4),
          |cand AS (SELECT DISTINCT a.rpb, a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM allb a JOIN allb b
          |    ON a.rpb = b.rpb AND a.band = b.band AND a.bucket = b.bucket
          |      AND a.doc_id < b.doc_id),
          |ver AS (SELECT rpb,
          |    ROUND(len(list_intersect(sa.shs, sb.shs)) /
          |      (len(sa.shs) + len(sb.shs)
          |        - len(list_intersect(sa.shs, sb.shs))), 6) AS j
          |  FROM cand
          |  JOIN shd sa ON sa.doc_id = cand.doc_a
          |  JOIN shd sb ON sb.doc_id = cand.doc_b),
          |st AS (SELECT rpb, COUNT(*) AS n_candidates,
          |    CAST(SUM(CASE WHEN j >= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_verified
          |  FROM ver GROUP BY 1),
          |pl AS (SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
          |  FROM d0),
          |np AS (SELECT COUNT(*) AS n_planted FROM d0),
          |pf AS (SELECT rpb, COUNT(*) AS n_planted_found
          |  FROM cand JOIN pl USING (doc_a, doc_b) GROUP BY 1),
          |spine AS (SELECT * FROM (VALUES (1), (2), (4)) AS t(rpb))
          |SELECT CAST(spine.rpb AS BIGINT) AS rows_per_band,
          |  CAST(8 // spine.rpb AS BIGINT) AS n_bands,
          |  ROUND(1.0 - POW(1.0 - POW(0.5, spine.rpb), 8 // spine.rpb), 6)
          |    AS p_collide_at_05,
          |  COALESCE(n_candidates, 0) AS n_candidates, n_verified,
          |  CASE WHEN COALESCE(n_candidates, 0) = 0 THEN NULL
          |    ELSE ROUND(CAST(n_verified AS DOUBLE) / n_candidates, 6) END
          |    AS precision_02,
          |  CAST(COALESCE(n_planted_found, 0) AS BIGINT) AS n_planted_found,
          |  CAST(n_planted AS BIGINT) AS n_planted,
          |  ROUND(CAST(COALESCE(n_planted_found, 0) AS DOUBLE) / n_planted, 6)
          |    AS recall_planted
          |FROM spine
          |LEFT JOIN st ON st.rpb = spine.rpb
          |LEFT JOIN pf ON pf.rpb = spine.rpb
          |CROSS JOIN np""".stripMargin),
    "q_trunc_recall" ->
      (s"WITH ${top3Cte("ft", "emb", 64)},\n${top3Cte("tt", "emb[1:32]", 32)},\n" +
        """ov AS (SELECT q_id, COUNT(*) AS ovn
          |  FROM ft JOIN tt USING (q_id, n_id) GROUP BY 1),
          |qs AS (SELECT DISTINCT q_id FROM ft)
          |SELECT q_id, CAST(COALESCE(ovn, 0) AS BIGINT) AS n_overlap,
          |  ROUND(CAST(COALESCE(ovn, 0) AS DOUBLE) / 3.0, 6) AS recall_at_3
          |FROM qs LEFT JOIN ov USING (q_id)""".stripMargin))
}
