package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.similarity.Embeddings
import graft.sources.Tables

/** Training-data preparation batch (SURVEY §2 #170-174): retrieval
  * NDCG, hard-negative mining, quality-classifier inference,
  * competence-based curriculum pacing, and span-corruption masking —
  * the operators that sit between a curated corpus and an actual
  * training run (companions to the dedup/curation families and the
  * #154-158 evaluation readouts).
  */
object Training {

  /** #170 RETRIEVAL NDCG@10 — the ranking-quality readout for the
    * engine's own ANN surface: each probe vector ranks the corpus by
    * cosine, a neighbor is RELEVANT when it shares the probe's label,
    * and NDCG@10 = DCG/IDCG with binary gains (the standard retrieval
    * metric next to #89's recall and #154's AUC — recall says how many
    * relevant made top-k, NDCG says how HIGH they ranked).
    *
    * Float determinism: DCG folds the top-10 hit list in RANK order
    * (sort_array + a sequential `aggregate` fold — one fixed addition
    * order both engines replay), never a distributed double sum.
    *
    * Scale shape: ranking is [[Embeddings.bruteForceTopK]] — the
    * corpus streams scan-local past the bounded probe set and each map
    * task ships at most k rows per probe (TopKAgg); labels attach by
    * joining the probe-set-sized top-k frame INTO the corpus labels
    * (broadcast of the tiny side); per-label relevant totals are one
    * map-side agg. Nothing corpus-sized shuffles. */
  def ndcgAt10(s: SparkSession, dir: String): DataFrame = {
    val K = 10
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), Embeddings.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("n_id"), Embeddings.asDouble(col("embedding")).as("nv"))
    val top = Embeddings.bruteForceTopK(q, c, K)
    val labels = e.select(col("vec_id"), col("label"))
    val hits = labels.join(broadcast(top), col("vec_id") === col("n_id"))
      .select(col("q_id"), col("rank"), col("label").as("n_label"))
    val qLab = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    // per-label corpus counts: how many relevant exist for each probe
    // (minus the probe itself) — bounds the ideal DCG
    val labCnt = labels.groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("n_label_total"))
    // discount 1/log2(r+1) written as ln2/ln(r+1) in BOTH engines so
    // the same two library calls produce the same doubles
    def disc(r: Column): Column = log(lit(2.0)) / log(r.cast("double") + 1.0)
    val rel = hits.join(broadcast(qLab), Seq("q_id"))
      .select(col("q_id"), col("q_label"), col("rank"),
        (when(col("n_label") === col("q_label"), 1.0).otherwise(0.0)
          * disc(col("rank"))).as("term"))
    // rank-ordered sequential fold: one fixed addition order
    val dcg = rel.groupBy(col("q_id"), col("q_label"))
      .agg(sort_array(collect_list(struct(col("rank"), col("term")))).as("rr"))
      .select(col("q_id"), col("q_label"),
        round(aggregate(col("rr"), lit(0.0),
          (acc, x) => acc + x.getField("term")), 6).as("dcg"))
    // idcg = Σ_{i=1..min(k, n_rel)} disc(i), same sequential fold
    dcg.join(broadcast(labCnt), Seq("q_label"))
      .select(col("q_id"), col("q_label"), col("dcg"),
        least(col("n_label_total") - 1, lit(K.toLong)).as("n_ideal"))
      .select(col("q_id"), col("q_label"), col("dcg"),
        round(aggregate(sequence(lit(1L), col("n_ideal")), lit(0.0),
          (acc, i) => acc + disc(i)), 6).as("idcg"))
      .select(col("q_id"), col("q_label"), col("dcg"), col("idcg"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"))
  }

  /** #171 HARD-NEGATIVE MINING — for each probe vector, the 5 most
    * cosine-similar corpus vectors with a DIFFERENT label: the
    * highest-loss negatives for contrastive/embedding training
    * (random negatives are trivially easy; the near-boundary ones
    * carry the gradient). The label constraint makes this a FILTERED
    * top-k — the candidate filter composes before ranking, so k stays
    * exact at any selectivity (the #94 discipline).
    *
    * Scale shape: corpus streams scan-local past the broadcast probe
    * set (vectors + labels ride together — no join-back), the label
    * mismatch filters before scoring, and the bounded map-side TopKAgg
    * ships ≤ k rows per probe to the single shuffle. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        Embeddings.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("n_id"), col("label").as("n_label"),
      Embeddings.asDouble(col("embedding")).as("nv"))
    val top = c.crossJoin(broadcast(q))
      .filter(col("n_label") =!= col("q_label"))
      .select(col("q_id"), col("q_label"),
        round(Embeddings.cosine(col("qv"), col("nv")), 6).as("cos"),
        col("n_id"))
      .as[(Long, Int, Double, Long)]
      .groupByKey(r => (r._1, r._2))
      .mapValues(r => (r._3, r._4))
      .agg(graft.plans.TopKAgg(5).toColumn)
      .flatMap { case ((qid, qlab), hit) =>
        hit.zipWithIndex.map { case ((cs, nid), i) =>
          (qid, qlab, (i + 1).toLong, nid, cs)
        }
      }
      .toDF("q_id", "q_label", "rank", "n_id", "cos")
    // negative's own label rides back via the tiny broadcast top frame
    e.select(col("vec_id"), col("label"))
      .join(broadcast(top), col("vec_id") === col("n_id"))
      .select(col("q_id"), col("q_label"), col("rank"), col("n_id"),
        col("label").as("n_label"), col("cos"))
  }

  /** #172 QUALITY-CLASSIFIER INFERENCE — a linear (logistic) quality
    * model scored as a query: the fasttext-classifier shape every
    * web-scale curation pipeline runs (features → w·x + b → sigmoid →
    * keep/drop), with the model weights as literals so inference is
    * pure row-local arithmetic folded into the scan. Features: token
    * count (capped), stopword ratio, type-token ratio, mean word
    * length — the #42/#65 feature family, here COMBINED into one
    * calibrated score instead of independent threshold rules.
    *
    * Float determinism: z is rounded at 6dp before the sigmoid and
    * the score after it (the exp() dialect-drift guard the #163 decay
    * family established); per-source mean aggregates the 6dp scores
    * as DECIMAL — exact, order-free. */
  /** The #172 logistic score as a row-local Column — shared with the
    * #188 threshold sweep so both gates rank with the identical
    * model. */
  private[graft] def qualityScore: Column = {
    val toks = TextAnalysis.tokens(col("text"))
    val nTok = size(toks).cast("double")
    val x1 = least(nTok / 100.0, lit(2.0))
    val x2 = TextAnalysis.countIn(toks, TextAnalysis.Stopwords) / nTok
    val x3 = size(array_distinct(toks)).cast("double") / nTok
    val x4 = TextAnalysis.meanWordLen(toks) / 10.0
    val z = round(lit(0.8) * x1 + lit(3.0) * x2 + lit(1.5) * x3
      + lit(-0.6) * x4 + lit(-1.2), 6)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val score = qualityScore
    Tables.documents(s, dir)
      .select(col("source"), score.as("score"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") >= 0.5, 1L).otherwise(0L)).as("n_accept"),
        sum(col("score").cast("decimal(18,6)")).as("sum_score"))
      .select(col("source"), col("n_docs"), col("n_accept"),
        round((col("sum_score") / col("n_docs")).cast("double"), 6)
          .as("mean_score"))
  }

  /** #173 COMPETENCE-BASED CURRICULUM (Platanios et al. 2019) — a
    * 5-epoch pacing schedule: epoch e trains on the easiest e/5
    * quantile of the corpus, so each doc ENTERS at the first epoch
    * whose competence threshold covers its difficulty (mean word
    * length — the row-local proxy the #65 quality family already
    * measures). Output: per-epoch cohort sizes and token budgets —
    * the schedule a training loop consumes.
    *
    * Scale shape: thresholds come from the VALUE-DOMAIN cumulative
    * histogram (the #143 exact-median discipline): difficulty values
    * are 6dp-bounded, so the grouped value frame is domain-sized, the
    * ordered cumsum window runs over that tiny frame (never the
    * corpus), and the 5 thresholds broadcast back for a row-local
    * epoch assignment. No corpus-wide sort, no exact-percentile agg
    * (which holds per-group value buffers at scale). */
  def curriculumPacing(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        round(TextAnalysis.meanWordLen(toks), 6).as("d"),
        size(toks).cast("long").as("n_tokens"))
    val vals = docs.groupBy(col("d")).agg(count(lit(1)).as("c"))
    val wOrd = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals.select(col("d"), sum(col("c")).over(wOrd).as("cum"))
    val n = docs.agg(count(lit(1)).as("n"))
    // threshold of epoch e = smallest difficulty value whose cumulative
    // count reaches ceil(e·N/5)
    val thr = cum.crossJoin(broadcast(n))
      .crossJoin(broadcast(s.range(1, 6).select(col("id").as("epoch"))))
      .filter(col("cum") * 5 >= col("epoch") * col("n"))
      .groupBy(col("epoch")).agg(min(col("d")).as("thr"))
    val entered = docs.crossJoin(broadcast(thr))
      .filter(col("d") <= col("thr"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(min(col("epoch")).as("epoch"))
    val perEpoch = entered.groupBy(col("epoch"))
      .agg(count(lit(1)).as("n_new_docs"), sum(col("n_tokens")).as("new_tokens"))
    val wEp = Window.orderBy(col("epoch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perEpoch.select(col("epoch"), col("n_new_docs"), col("new_tokens"),
      sum(col("n_new_docs")).over(wEp).as("cum_docs"),
      sum(col("new_tokens")).over(wEp).as("cum_tokens"))
  }

  /** #174 SPAN-CORRUPTION statistics (the T5 denoising objective's
    * data prep): a deterministic 15% token mask (decoded md5 hex of
    * (doc_id, position) — the #140/#149 digit idiom, so both engines
    * draw the same "noise"), consecutive masked tokens merge into
    * SPANS, and the per-source readout is the corruption rate and
    * mean span length a seq2seq pipeline validates before writing
    * (input, target) pairs.
    *
    * Scale shape: the mask, the noise count and the span count (a
    * rise-edge fold over the mask array) are ALL row-local array
    * ops — no token explode, no window; one map-side-combined agg per
    * source ends the plan. */
  def spanCorruption(s: SparkSession, dir: String): DataFrame = {
    val hex = "0123456789abcdef"
    def noiseAt(i: Column): Column = {
      val h = md5(concat(col("doc_id").cast("string"), lit(":"),
        i.cast("string"), lit(":t5")))
      val v = (1 to 2).map(k =>
        (instr(lit(hex), substring(h, k, 1)) - 1).cast("long")
          * math.pow(16, 2 - k).toLong).reduce(_ + _)
      when(pmod(v, lit(100L)) < 15, 1).otherwise(0)
    }
    val toks = TextAnalysis.tokens(col("text"))
    val mask = transform(sequence(lit(0), size(toks) - 1), noiseAt _)
    val nNoise = aggregate(col("mask"), lit(0L), (acc, m) => acc + m)
    // a span starts at every masked position whose predecessor is clear:
    // rise edges of the mask against its 0-prepended shift — row-local,
    // no positional indexing
    val prevMask = concat(array(lit(0)),
      slice(col("mask"), lit(1), size(col("mask")) - 1))
    val nSpans = aggregate(
      zip_with(col("mask"), prevMask,
        (m, p) => when(m === 1 && p === 0, 1L).otherwise(0L)),
      lit(0L), _ + _)
    Tables.documents(s, dir)
      .select(col("source"), size(toks).cast("long").as("n_tokens"),
        mask.as("mask"))
      .select(col("source"), col("n_tokens"), nNoise.as("n_noise"),
        nSpans.as("n_spans"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tot_tokens"),
        sum(col("n_noise")).as("tot_noise"), sum(col("n_spans")).as("tot_spans"))
      .select(col("source"), col("n_docs"), col("tot_tokens"), col("tot_noise"),
        col("tot_spans"),
        round(col("tot_noise").cast("double") / col("tot_tokens"), 6)
          .as("corruption_rate"),
        round(col("tot_noise").cast("double") / col("tot_spans"), 6)
          .as("mean_span_len"))
  }

  /** #175 DATASET CARD — the per-source "datasheet" a corpus release
    * publishes (Gebru et al. 2021 datasheets, as one query): volume
    * (docs/tokens/chars), language profile (distinct langs + dominant
    * language and its share), and the exact-duplicate rate — the
    * summary table that rides next to every training-data drop.
    *
    * Scale shape: one row-local pass derives tokens/chars/content
    * hash; three map-side-combined aggregation branches (per-source
    * totals, per-(source, hash) → distinct-content counts,
    * per-(source, lang) → max_by dominant language) rejoin on the
    * BOUNDED source dimension. Nothing corpus-sized shuffles twice;
    * no windows. */
  def datasetCard(s: SparkSession, dir: String): DataFrame =
    datasetCardOf(Tables.documents(s, dir))

  /** Frame-level #175 — shared with the release pipeline
    * ([[graft.pipelines.CurationJob.release]] stage `card`). */
  private[graft] def datasetCardOf(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("source"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("n_chars"),
        md5(col("text")).as("h"))
      .localCheckpoint() // three aggregation branches below share it
    val vol = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tot_tokens"),
        sum(col("n_chars")).as("tot_chars"))
    val dup = base.groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct"))
    val langs = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_langs"),
        max_by(col("lang"), struct(col("c"), col("lang"))).as("top_lang"),
        max(struct(col("c"), col("lang"))).getField("c").as("top_lang_docs"))
    vol.join(dup, Seq("source")).join(langs, Seq("source"))
      .select(col("source"), col("n_docs"), col("tot_tokens"), col("tot_chars"),
        round(col("tot_tokens").cast("double") / col("n_docs"), 6)
          .as("mean_doc_tokens"),
        col("n_langs"), col("top_lang"),
        round(col("top_lang_docs").cast("double") / col("n_docs"), 6)
          .as("top_lang_share"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 6)
          .as("dup_rate"))
  }

  /** #176 TOKENIZER FERTILITY — per language: BPE-ish tokens per
    * whitespace word and characters per token, the tokenizer-budget
    * diagnostics (fertility >> 1 for a language means the tokenizer
    * fragments it — its documents cost more sequence length per word,
    * the classic multilingual-budget skew). Row-local counting
    * (regexp token runs, the #44 counter) + one map-side agg; ratios
    * from exact integer sums. */
  def tokenizerFertility(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("words"),
        TextAnalysis.bpeTokenCount(col("text")).as("bpe"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("words")).as("tot_words"),
        sum(col("bpe")).as("tot_bpe_tokens"), sum(col("chars")).as("tot_chars"))
      .select(col("lang"), col("n_docs"), col("tot_words"), col("tot_bpe_tokens"),
        round(col("tot_bpe_tokens").cast("double") / col("tot_words"), 6)
          .as("fertility"),
        round(col("tot_chars").cast("double") / col("tot_bpe_tokens"), 6)
          .as("chars_per_token"))

  /** #177 MMR DIVERSIFIED RE-RANKING (Carbonell & Goldstein 1998) —
    * maximal marginal relevance over each probe's top-10 candidate
    * set: 5 picks, pick 1 = highest relevance, every later pick
    * maximizes λ·rel − (1−λ)·max-sim-to-already-picked (λ = 0.7) —
    * the standard redundancy-pruning re-rank between ANN retrieval
    * and a RAG context window.
    *
    * Determinism: relevance, pairwise sims and every step score are
    * 6dp-rounded; argmax ties break toward the smaller candidate id —
    * the oracle replays all four selection rounds as chained CTEs.
    *
    * Scale shape: the candidate set is BOUNDED (k = 10 per probe via
    * bruteForceTopK's map-side TopKAgg), so the pairwise sim matrix is
    * ≤ k² rows per probe and every selection round joins probe-sized
    * frames (both sides checkpointed once); the corpus is touched
    * exactly once, by the initial retrieval. The unrolled loop adds
    * rounds × tiny-join stages, never another corpus pass. */
  def mmrDiversify(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), Embeddings.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("n_id"), Embeddings.asDouble(col("embedding")).as("nv"))
    val cand = Embeddings.bruteForceTopK(q, c, 10)
      .select(col("q_id"), col("n_id"), col("cos").as("rel"), col("rank"))
      .localCheckpoint()
    // candidate vectors ride back via the tiny top frame (#171 idiom)
    val cv = e.select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
      .join(broadcast(cand.select(col("q_id"), col("n_id"))),
        col("vec_id") === col("n_id"))
      .select(col("q_id"), col("n_id"), col("v"))
    // pairwise sims within each probe's candidate set: ≤ k² per probe
    val pair = cv.alias("a")
      .join(cv.alias("b"), col("a.q_id") === col("b.q_id") &&
        col("a.n_id") =!= col("b.n_id"))
      .select(col("a.q_id").as("q_id"), col("a.n_id").as("a_id"),
        col("b.n_id").as("b_id"),
        round(Embeddings.cosine(col("a.v"), col("b.v")), 6).as("sim"))
      .localCheckpoint()
    // the λ/μ blend runs in EXACT DECIMAL over the already-6dp inputs:
    // 0.7 × a 6dp value lands on a 7th-decimal half EVERY time the
    // scaled digit is odd, exactly where double rounding diverges
    // across engines — decimal arithmetic has no such boundary
    val lamD = lit(new java.math.BigDecimal("0.7"))
    val muD = lit(new java.math.BigDecimal("0.3"))
    def dec(c: Column): Column = c.cast("decimal(10,6)")
    // pick 1: pure relevance (rank 1 of the retrieval)
    var selected = cand.filter(col("rank") === 1)
      .select(col("q_id"), col("n_id"), lit(1L).as("pick"),
        round(lamD * dec(col("rel")), 6).cast("double").as("score"))
    for (step <- 2 to 5) {
      val rem = cand.join(selected.select(col("q_id"), col("n_id")),
        Seq("q_id", "n_id"), "left_anti")
      val msim = pair
        .join(selected.select(col("q_id"), col("n_id").as("b_id")),
          Seq("q_id", "b_id"))
        .groupBy(col("q_id"), col("a_id").as("n_id"))
        .agg(max(col("sim")).as("msim"))
      val next = rem.join(msim, Seq("q_id", "n_id"))
        .select(col("q_id"), col("n_id"),
          round(lamD * dec(col("rel")) - muD * dec(col("msim")), 6)
            .cast("double").as("score"))
        .groupBy(col("q_id"))
        .agg(max_by(struct(col("n_id"), col("score")),
          struct(col("score"), negate(col("n_id")))).as("w"))
        .select(col("q_id"), col("w.n_id").as("n_id"),
          lit(step.toLong).as("pick"), col("w.score").as("score"))
      selected = selected.unionByName(next).localCheckpoint()
    }
    selected
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mmr_diversify"      -> mmrDiversify _,
    "q_ndcg"               -> ndcgAt10 _,
    "q_hard_negatives"     -> hardNegatives _,
    "q_quality_classifier" -> qualityClassifier _,
    "q_curriculum"         -> curriculumPacing _,
    "q_span_corruption"    -> spanCorruption _,
    "q_dataset_card"       -> datasetCard _,
    "q_tokenizer_fertility" -> tokenizerFertility _)

  private def cosSqlFor(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
       |  / (sqrt(list_sum(list_transform($a, x -> x*x)))
       |     * sqrt(list_sum(list_transform($b, x -> x*x))))""".stripMargin

  /** The 4 MMR selection rounds replayed as chained CTEs. */
  private def mmrOracle: String = {
    val steps = (2 to 5).map { k =>
      s"""ms$k AS (SELECT p.q_id, p.a_id AS n_id, MAX(p.sim) AS msim
         |  FROM pair p JOIN all${k - 1} s
         |    ON p.q_id = s.q_id AND p.b_id = s.n_id GROUP BY 1, 2),
         |sc$k AS (SELECT c.q_id, c.n_id,
         |    CAST(ROUND(0.7 * CAST(c.rel AS DECIMAL(10,6))
         |      - 0.3 * CAST(m.msim AS DECIMAL(10,6)), 6) AS DOUBLE) AS score
         |  FROM cand c JOIN ms$k m ON c.q_id = m.q_id AND c.n_id = m.n_id
         |  WHERE NOT EXISTS (SELECT 1 FROM all${k - 1} s
         |    WHERE s.q_id = c.q_id AND s.n_id = c.n_id)),
         |sel$k AS (SELECT q_id, n_id, $k AS pick, score
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, n_id) AS rn FROM sc$k) WHERE rn = 1),
         |all$k AS (SELECT * FROM all${k - 1}
         |  UNION ALL SELECT * FROM sel$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
       |    ROUND(${cosSqlFor("a.v", "b.v")}, 6) AS rel
       |  FROM e a, e b WHERE a.vec_id < 5 AND a.vec_id <> b.vec_id),
       |cand AS (
       |  SELECT q_id, n_id, rel, rank FROM (SELECT q_id, n_id, rel,
       |      ROW_NUMBER() OVER (PARTITION BY q_id
       |        ORDER BY rel DESC, n_id) AS rank
       |    FROM scored) WHERE rank <= 10),
       |cv AS (SELECT c.q_id, c.n_id, e.v FROM cand c
       |  JOIN e ON e.vec_id = c.n_id),
       |pair AS (
       |  SELECT a.q_id, a.n_id AS a_id, b.n_id AS b_id,
       |    ROUND(${cosSqlFor("a.v", "b.v")}, 6) AS sim
       |  FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.n_id <> b.n_id),
       |all1 AS (SELECT q_id, n_id, 1 AS pick,
       |    CAST(ROUND(0.7 * CAST(rel AS DECIMAL(10,6)), 6) AS DOUBLE) AS score
       |  FROM cand WHERE rank = 1),
       |$steps
       |SELECT q_id, n_id, CAST(pick AS BIGINT) AS pick, score FROM all5""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_mmr_diversify" -> mmrOracle,
    "q_ndcg" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |scored AS (
         |  SELECT a.vec_id AS q_id, a.label AS q_label, b.vec_id AS n_id,
         |    b.label AS n_label, ROUND(${cosSqlFor("a.v", "b.v")}, 6) AS cos
         |  FROM e a, e b WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id),
         |top AS (
         |  SELECT q_id, q_label,
         |    (CASE WHEN n_label = q_label THEN 1.0 ELSE 0.0 END)
         |      * (ln(2.0) / ln(CAST(rank AS DOUBLE) + 1.0)) AS term, rank
         |  FROM (SELECT q_id, q_label, n_label,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY cos DESC, n_id) AS rank
         |    FROM scored QUALIFY rank <= 10)),
         |dcg AS (SELECT q_id, q_label,
         |    ROUND(list_sum(list(term ORDER BY rank)), 6) AS dcg
         |  FROM top GROUP BY 1, 2),
         |lc AS (SELECT label AS q_label, COUNT(*) AS n_label_total
         |  FROM e GROUP BY 1),
         |idcg AS (SELECT q_id, dcg.q_label, dcg,
         |    ROUND(list_sum(list_transform(
         |      range(1, CAST(LEAST(n_label_total - 1, 10) AS BIGINT) + 1),
         |      i -> ln(2.0) / ln(CAST(i AS DOUBLE) + 1.0))), 6) AS idcg
         |  FROM dcg JOIN lc USING (q_label))
         |SELECT q_id, q_label, dcg, idcg, ROUND(dcg / idcg, 6) AS ndcg
         |FROM idcg""".stripMargin,
    "q_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |scored AS (
         |  SELECT a.vec_id AS q_id, a.label AS q_label, b.vec_id AS n_id,
         |    b.label AS n_label, ROUND(${cosSqlFor("a.v", "b.v")}, 6) AS cos
         |  FROM e a, e b WHERE a.vec_id < 10 AND a.label <> b.label)
         |SELECT q_id, q_label,
         |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank,
         |  n_id, n_label, cos
         |FROM scored
         |QUALIFY rank <= 5""".stripMargin,
    "q_quality_classifier" ->
      """WITH f AS (SELECT source, string_split(text, ' ') AS tk
        |  FROM documents),
        |x AS (SELECT source,
        |    LEAST(CAST(LEN(tk) AS DOUBLE) / 100.0, 2.0) AS x1,
        |    CAST(LEN(list_filter(tk, t -> t IN
        |      ('the','a','of','to','and','in','is','it','on','for')))
        |      AS DOUBLE) / LEN(tk) AS x2,
        |    CAST(LEN(list_distinct(tk)) AS DOUBLE) / LEN(tk) AS x3,
        |    (CAST(list_sum(list_transform(tk, t -> LEN(t))) AS DOUBLE)
        |      / LEN(tk)) / 10.0 AS x4
        |  FROM f),
        |z AS (SELECT source, ROUND(0.8*x1 + 3.0*x2 + 1.5*x3 - 0.6*x4 - 1.2, 6)
        |    AS z FROM x),
        |sc AS (SELECT source, ROUND(1.0 / (1.0 + exp(-z)), 6) AS score FROM z)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_accept,
        |  ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_score
        |FROM sc GROUP BY 1""".stripMargin,
    "q_curriculum" ->
      """WITH d AS (SELECT doc_id,
        |    ROUND(CAST(list_sum(list_transform(tk, t -> LEN(t))) AS DOUBLE)
        |      / LEN(tk), 6) AS d,
        |    CAST(LEN(tk) AS BIGINT) AS n_tokens
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |    FROM documents)),
        |vals AS (SELECT d.d, COUNT(*) AS c FROM d GROUP BY 1),
        |cum AS (SELECT d, SUM(c) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM vals),
        |n AS (SELECT COUNT(*) AS n FROM d),
        |thr AS (SELECT epoch, MIN(d) AS thr
        |  FROM cum, n, (SELECT unnest(range(1, 6)) AS epoch)
        |  WHERE cum * 5 >= epoch * n GROUP BY 1),
        |entered AS (SELECT doc_id, n_tokens,
        |    CAST(MIN(epoch) AS BIGINT) AS epoch
        |  FROM d JOIN thr ON d.d <= thr.thr GROUP BY 1, 2),
        |pe AS (SELECT epoch, COUNT(*) AS n_new_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS new_tokens
        |  FROM entered GROUP BY 1)
        |SELECT epoch, n_new_docs, new_tokens,
        |  CAST(SUM(n_new_docs) OVER (ORDER BY epoch
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_docs,
        |  CAST(SUM(new_tokens) OVER (ORDER BY epoch
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens
        |FROM pe""".stripMargin,
    "q_span_corruption" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk
        |  FROM documents),
        |m AS (SELECT doc_id, source, CAST(LEN(tk) AS BIGINT) AS n_tokens,
        |    list_transform(range(0, LEN(tk)), i -> CASE WHEN
        |      ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)
        |          || ':' || CAST(i AS VARCHAR) || ':t5'), 1, 1)) - 1) * 16 +
        |       (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)
        |          || ':' || CAST(i AS VARCHAR) || ':t5'), 2, 1)) - 1)) % 100 < 15
        |      THEN 1 ELSE 0 END) AS mask
        |  FROM t),
        |per AS (SELECT source, n_tokens,
        |    CAST(list_sum(mask) AS BIGINT) AS n_noise,
        |    CAST(list_sum(list_transform(range(0, LEN(mask)),
        |      i -> CASE WHEN mask[i + 1] = 1 AND
        |        (i = 0 OR mask[i] = 0) THEN 1 ELSE 0 END)) AS BIGINT)
        |      AS n_spans
        |  FROM m)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
        |  CAST(SUM(n_noise) AS BIGINT) AS tot_noise,
        |  CAST(SUM(n_spans) AS BIGINT) AS tot_spans,
        |  ROUND(CAST(SUM(n_noise) AS DOUBLE) / SUM(n_tokens), 6)
        |    AS corruption_rate,
        |  ROUND(CAST(SUM(n_noise) AS DOUBLE) / SUM(n_spans), 6)
        |    AS mean_span_len
        |FROM per GROUP BY 1""".stripMargin,
    "q_dataset_card" ->
      """WITH base AS (SELECT source, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(len(text) AS BIGINT) AS n_chars, md5(text) AS h
        |  FROM documents),
        |vol AS (SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS tot_tokens,
        |    CAST(SUM(n_chars) AS BIGINT) AS tot_chars
        |  FROM base GROUP BY 1),
        |dup AS (SELECT source, COUNT(*) AS n_distinct
        |  FROM (SELECT source, h FROM base GROUP BY 1, 2) GROUP BY 1),
        |lc AS (SELECT source, lang, COUNT(*) AS c FROM base GROUP BY 1, 2),
        |langs AS (SELECT source, n_langs, lang AS top_lang,
        |    c AS top_lang_docs
        |  FROM (SELECT source, lang, c,
        |      COUNT(*) OVER (PARTITION BY source) AS n_langs,
        |      ROW_NUMBER() OVER (PARTITION BY source
        |        ORDER BY c DESC, lang DESC) AS rn
        |    FROM lc) WHERE rn = 1)
        |SELECT vol.source, n_docs, tot_tokens, tot_chars,
        |  ROUND(CAST(tot_tokens AS DOUBLE) / n_docs, 6) AS mean_doc_tokens,
        |  n_langs, top_lang,
        |  ROUND(CAST(top_lang_docs AS DOUBLE) / n_docs, 6) AS top_lang_share,
        |  ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_docs, 6) AS dup_rate
        |FROM vol JOIN dup ON vol.source = dup.source
        |JOIN langs ON vol.source = langs.source""".stripMargin,
    "q_tokenizer_fertility" ->
      """WITH t AS (SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe,
        |    CAST(len(text) AS BIGINT) AS chars
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(words) AS BIGINT) AS tot_words,
        |  CAST(SUM(bpe) AS BIGINT) AS tot_bpe_tokens,
        |  ROUND(CAST(SUM(bpe) AS DOUBLE) / SUM(words), 6) AS fertility,
        |  ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(bpe), 6) AS chars_per_token
        |FROM t GROUP BY 1""".stripMargin)
}
