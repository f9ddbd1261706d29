package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TokenizerStore
import graft.sources.Tables

/** Training-data preparation batch C (SURVEY §2 #184-187): encoding
  * with the STORED tokenizer, domain-divergence (KL), n-gram
  * diversity, and class-balanced reweighting — closing the loops
  * batch B opened (train → store → encode; mixture → divergence).
  */
object TrainingC {

  /** #184 BPE ENCODE over the STORED tokenizer ([[TokenizerStore]]):
    * builds the 3-merge artifact once per corpus (idempotent —
    * content-fingerprint root, a retried run never retrains), then
    * encodes the per-source vocabulary against the persisted merge
    * list and reports per-source fertility (tokens/word) and
    * compression (chars/token) — the readout that tells a tokenizer
    * owner which domains pay the sequence-length cost.
    *
    * Scale shape: the corpus is scanned ONCE into the (source, word)
    * frequency frame; the stored merges (3 rows — broadcast-variable
    * scale) unroll into a chain of codegen'd `replace` calls, so
    * encoding is pure row-local work on the vocab frame; NO training
    * aggregate appears in this plan after the artifact exists. All
    * later arithmetic is integer sums on the 20-row source dim. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val words = TrainingB.bpeWordFreq(s, dir)
    val root = TokenizerStore.defaultRoot(words, rounds = 3)
    TokenizerStore.buildIfAbsent(words, root, rounds = 3)
    val sw = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")).between(2, 20))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("f"))
    val enc = sw.withColumn("n_sym",
      size(split(trim(TokenizerStore.encodeSym(s, root, col("word")), "<>"),
        "><")).cast("long"))
    enc.groupBy(col("source"))
      .agg(sum(col("f")).as("n_words"),
        sum(col("f") * length(col("word"))).as("tot_chars"),
        sum(col("f") * col("n_sym")).as("tot_tokens"))
      .select(col("source"), col("n_words"), col("tot_chars"), col("tot_tokens"),
        round(col("tot_tokens").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("tot_chars").cast("double") / col("tot_tokens"), 6)
          .as("chars_per_token"))
  }

  /** #185 DOMAIN KL DIVERGENCE — per-source unigram distribution vs
    * the corpus distribution: KL(p_s ‖ q) = Σ_t p_s(t)·ln(p_s(t)/q(t)),
    * the mixture-design companion to #112's numeric PSI (which domain
    * is lexically farthest from the blend it feeds). Support(p) ⊆
    * support(q) by construction, so no smoothing is needed.
    *
    * Float determinism: the vocabulary-sized sum of tiny doubles must
    * not be a distributed double sum (order-dependent); each term is
    * fixed to integer NANO-units (round(x·1e9) — never on an exact
    * boundary, the value is transcendental) and summed exactly; the
    * output divides the exact integer by 1e9 WITHOUT re-rounding —
    * S/1e9 is a terminating 9dp decimal, so a 6dp round could land on
    * an exact half, while the raw IEEE division is the same double in
    * both engines.
    *
    * Scale shape: the corpus is scanned once into (source, term)
    * counts (map-side combined); global term counts derive from the
    * per-source frame (vocab-sized, never the corpus); per-source
    * totals are one more tiny agg; everything joins on term within
    * the vocab frame. */
  def klDivergence(s: SparkSession, dir: String): DataFrame = {
    val cst = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val ns = cst.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val g = cst.groupBy(col("t")).agg(sum(col("c")).as("g"))
    val tot = g.agg(sum(col("g")).as("n_all"))
    val terms = cst.join(g.hint("shuffle_hash"), Seq("t"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"),
        round((col("c").cast("double") / col("n_s"))
          * log((col("c").cast("double") / col("n_s"))
            / (col("g").cast("double") / col("n_all"))) * 1e9)
          .cast("long").as("nano"))
    terms.groupBy(col("source"))
      .agg(first(col("n_s")).as("n_tokens"), count(lit(1)).as("n_terms"),
        sum(col("nano")).as("kl_nano"))
      .select(col("source"), col("n_tokens"), col("n_terms"), col("kl_nano"),
        (col("kl_nano").cast("double") / 1e9).as("kl"))
  }

  /** #186 N-GRAM DIVERSITY — per-source distinct-n ratios for
    * n = 1, 2, 3 (the distinct-1/distinct-2 metrics of generation
    * diversity, applied corpus-side): a low ratio flags templated or
    * repetitive sources before they teach the model to loop. Shingles
    * come from the native [[graft.plans.WordShingles]] codegen kernel;
    * all three n values ride ONE corpus scan (tagged structs in one
    * explode), then a (source, n, gram) two-level agg — map-side
    * combined, vocab-sized intermediates, no window. */
  def ngramDiversity(s: SparkSession, dir: String): DataFrame = {
    def tagged(n: Int) = transform(graft.plans.WordShingles(col("text"), n),
      x => struct(lit(n).as("n"), x.as("gram")))
    Tables.documents(s, dir)
      .select(col("source"),
        explode(concat(tagged(1), tagged(2), tagged(3))).as("e"))
      .select(col("source"), col("e.n").as("n"), col("e.gram").as("gram"))
      .groupBy(col("source"), col("n"))
      .agg(count(lit(1)).as("total_ngrams"),
        count_distinct(col("gram")).as("distinct_ngrams"))
      .select(col("source"), col("n").cast("long").as("n"),
        col("total_ngrams"), col("distinct_ngrams"),
        round(col("distinct_ngrams").cast("double") / col("total_ngrams"), 6)
          .as("diversity"))
  }

  /** #187 CLASS-BALANCED REWEIGHTING (Cui et al. 2019): per embedding
    * label, the effective sample count (1-β^n)/(1-β) with β = 0.999
    * and the normalized inverse-effective-number weight — the standard
    * reweighting for long-tailed classifier training (a labelled-data
    * loop consumes these as loss weights). One map-side label count
    * agg; the weight normalization sums the 6dp inverses in exact
    * DECIMAL over the label dimension. */
  def labelBalance(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.embeddings(s, dir)
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
      .withColumn("effective_n",
        round((lit(1.0) - pow(lit(0.999), col("n"))) / 0.001, 6))
      .withColumn("inv", round(lit(1.0) / col("effective_n"), 6))
    val tot = per.agg(sum(col("inv").cast("decimal(18,6)")).as("si"))
    per.crossJoin(broadcast(tot))
      .select(col("label"), col("n"), col("effective_n"),
        round(col("inv") / col("si").cast("double"), 6).as("weight"))
  }

  /** #188 QUALITY-THRESHOLD SWEEP — the tuning curve for the #172
    * classifier gate (the #167 sweep discipline applied to quality
    * filtering): for each candidate threshold, how many documents and
    * tokens survive — the kept-volume-vs-strictness trade a filter
    * owner reads before fixing the production threshold. The corpus
    * is scanned ONCE (score + token count row-local); the 5-threshold
    * explode multiplies rows 5× BEFORE the map-side-combined agg but
    * after all heavy derivation; corpus totals are one broadcast
    * scalar. Scores are 6dp and thresholds exact decimals, so the >=
    * compare is engine-stable; doc fractions divide by 2^a·5^b counts
    * that terminate well inside 6dp (exact in both engines). */
  def qualitySweep(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir)
      .select(Training.qualityScore.as("score"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .localCheckpoint()
    val tot = scored.agg(count(lit(1)).as("total_docs"),
      sum(col("n_tok")).as("total_tokens"))
    scored
      .select(col("score"), col("n_tok"),
        explode(array(Seq(0.4, 0.45, 0.5, 0.55, 0.6).map(lit): _*))
          .as("threshold"))
      .filter(col("score") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("docs_kept"), sum(col("n_tok")).as("tokens_kept"))
      .crossJoin(broadcast(tot))
      .select(col("threshold"), col("docs_kept"), col("tokens_kept"),
        round(col("docs_kept").cast("double") / col("total_docs"), 6)
          .as("frac_docs"),
        round(col("tokens_kept").cast("double") / col("total_tokens"), 6)
          .as("frac_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_encode"      -> bpeEncode _,
    "q_kl_divergence"   -> klDivergence _,
    "q_ngram_diversity" -> ngramDiversity _,
    "q_label_balance"   -> labelBalance _,
    "q_quality_sweep"   -> qualitySweep _)

  /** The 3 training rounds with the word column carried, then the
    * per-source encode join — the SQL replay of train→store→encode. */
  private def bpeEncodeOracle: String = {
    val steps = (1 to 3).map { m =>
      val prev = s"s${m - 1}"
      s"""p$m AS (SELECT pair, SUM(freq) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(t)),
         |      i -> t[i] || ' ' || t[i+1])) AS pair
         |    FROM (SELECT string_split(trim(sym, '<>'), '><') AS t, freq
         |      FROM $prev)
         |    WHERE len(t) >= 2) GROUP BY 1),
         |b$m AS (SELECT pair FROM p$m ORDER BY cnt DESC, pair LIMIT 1),
         |s$m AS (SELECT word, replace(sym, '<'||replace(b.pair,' ','><')||'>',
         |    '<'||replace(b.pair,' ','')||'>') AS sym, freq
         |  FROM $prev, b$m b)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (SELECT word, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text,' ')) AS word FROM documents) t
       |  WHERE regexp_matches(word, '^[a-z]+$$') AND len(word) BETWEEN 2 AND 20
       |  GROUP BY 1),
       |s0 AS (SELECT word, regexp_replace(word, '(.)', '<\\1>', 'g')
       |    AS sym, freq FROM w),
       |$steps,
       |enc AS (SELECT word,
       |    CAST(len(string_split(trim(sym, '<>'), '><')) AS BIGINT) AS n_sym
       |  FROM s3),
       |sw AS (SELECT source, word, COUNT(*) AS f FROM (
       |    SELECT source, unnest(string_split(text,' ')) AS word
       |    FROM documents) t
       |  WHERE regexp_matches(word, '^[a-z]+$$') AND len(word) BETWEEN 2 AND 20
       |  GROUP BY 1, 2),
       |agg AS (SELECT source, CAST(SUM(f) AS BIGINT) AS n_words,
       |    CAST(SUM(f * len(word)) AS BIGINT) AS tot_chars,
       |    CAST(SUM(f * n_sym) AS BIGINT) AS tot_tokens
       |  FROM sw JOIN enc USING (word) GROUP BY 1)
       |SELECT source, n_words, tot_chars, tot_tokens,
       |  ROUND(CAST(tot_tokens AS DOUBLE) / n_words, 6) AS fertility,
       |  ROUND(CAST(tot_chars AS DOUBLE) / tot_tokens, 6) AS chars_per_token
       |FROM agg""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_bpe_encode" -> bpeEncodeOracle,
    "q_kl_divergence" ->
      """WITH tk AS (SELECT source, t FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS t
        |    FROM documents) x WHERE len(t) > 0),
        |cst AS (SELECT source, t, COUNT(*) AS c FROM tk GROUP BY 1, 2),
        |ns AS (SELECT source, SUM(c) AS n_s FROM cst GROUP BY 1),
        |g AS (SELECT t, SUM(c) AS g FROM cst GROUP BY 1),
        |tot AS (SELECT SUM(g) AS n_all FROM g),
        |terms AS (SELECT cst.source, ns.n_s,
        |    CAST(ROUND((CAST(c AS DOUBLE) / n_s)
        |      * ln((CAST(c AS DOUBLE) / n_s)
        |        / (CAST(g.g AS DOUBLE) / n_all)) * 1000000000, 0) AS BIGINT)
        |      AS nano
        |  FROM cst JOIN g USING (t) JOIN ns USING (source), tot)
        |SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_terms, CAST(SUM(nano) AS BIGINT) AS kl_nano,
        |  CAST(SUM(nano) AS DOUBLE) / 1000000000 AS kl
        |FROM terms GROUP BY 1""".stripMargin,
    "q_ngram_diversity" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT source, 1 AS n, unnest(toks) AS gram FROM t
        |  UNION ALL
        |  SELECT source, 2, unnest(CASE WHEN len(toks) >= 2
        |      THEN list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1])
        |      ELSE CAST([] AS VARCHAR[]) END)
        |  FROM t
        |  UNION ALL
        |  SELECT source, 3, unnest(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      ELSE CAST([] AS VARCHAR[]) END)
        |  FROM t)
        |SELECT source, CAST(n AS BIGINT) AS n, COUNT(*) AS total_ngrams,
        |  COUNT(DISTINCT gram) AS distinct_ngrams,
        |  ROUND(CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*), 6)
        |    AS diversity
        |FROM sh GROUP BY 1, 2""".stripMargin,
    "q_quality_sweep" ->
      """WITH f AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |x AS (SELECT CAST(LEN(tk) AS BIGINT) AS n_tok,
        |    LEAST(CAST(LEN(tk) AS DOUBLE) / 100.0, 2.0) AS x1,
        |    CAST(LEN(list_filter(tk, t -> t IN
        |      ('the','a','of','to','and','in','is','it','on','for')))
        |      AS DOUBLE) / LEN(tk) AS x2,
        |    CAST(LEN(list_distinct(tk)) AS DOUBLE) / LEN(tk) AS x3,
        |    (CAST(list_sum(list_transform(tk, t -> LEN(t))) AS DOUBLE)
        |      / LEN(tk)) / 10.0 AS x4
        |  FROM f),
        |sc AS (SELECT n_tok, ROUND(1.0 / (1.0 + exp(
        |    -ROUND(0.8*x1 + 3.0*x2 + 1.5*x3 - 0.6*x4 - 1.2, 6))), 6)
        |    AS score FROM x),
        |tot AS (SELECT COUNT(*) AS total_docs, SUM(n_tok) AS total_tokens
        |  FROM sc),
        |sw AS (SELECT t.threshold, COUNT(*) AS docs_kept,
        |    CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
        |  FROM sc, (SELECT unnest([0.4, 0.45, 0.5, 0.55, 0.6]) AS threshold) t
        |  WHERE score >= t.threshold GROUP BY 1)
        |SELECT threshold, docs_kept, tokens_kept,
        |  ROUND(CAST(docs_kept AS DOUBLE) / total_docs, 6) AS frac_docs,
        |  ROUND(CAST(tokens_kept AS DOUBLE) / total_tokens, 6) AS frac_tokens
        |FROM sw, tot""".stripMargin,
    "q_label_balance" ->
      """WITH per AS (SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n
        |  FROM embeddings GROUP BY 1),
        |e AS (SELECT label, n,
        |    ROUND((1.0 - pow(0.999, n)) / 0.001, 6) AS effective_n
        |  FROM per),
        |i AS (SELECT label, n, effective_n,
        |    ROUND(1.0 / effective_n, 6) AS inv FROM e),
        |t AS (SELECT SUM(CAST(inv AS DECIMAL(18,6))) AS si FROM i)
        |SELECT label, n, effective_n,
        |  ROUND(inv / CAST(si AS DOUBLE), 6) AS weight
        |FROM i, t""".stripMargin)
}
