package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Training-data preparation batch B (SURVEY §2 #178-183): domain
  * reweighting (DoReMi-style), rejection sampling / preference-pair
  * construction, length-bucketed batching diagnostics, data-
  * constrained epoch allocation, and a multi-merge BPE training loop
  * — the mixture/selection/tokenizer side of run preparation, next to
  * batch A's retrieval and masking operators.
  */
object TrainingB {

  /** Per-doc loss proxy shared by #178: ln(1 + mean word length), a
    * row-local, scale-free "hardness" stand-in for a reference-model
    * loss (longer words ≈ rarer subwords ≈ higher loss). 6dp-rounded
    * at the transcendental boundary (the #163/#172 dialect guard). */
  private def docLoss = {
    val tk = split(col("text"), " ")
    val sumLen = aggregate(tk, lit(0L), (a, t) => a + length(t))
    round(log(lit(1.0) + sumLen.cast("double") / size(tk)), 6)
  }

  /** #178 DOREMI-STYLE DOMAIN REWEIGHTING — one multiplicative-weights
    * update over per-domain excess loss (Xie et al. 2023, DoReMi): a
    * domain whose mean loss exceeds the corpus mean is upweighted by
    * exp(η·excess), the weights renormalize, and an ε-uniform smoothing
    * floor keeps every domain sampled. The loop that trains a mixture
    * re-feeds these weights; one gated step is the verifiable unit
    * (the #86 Lloyd-iteration convention).
    *
    * Float discipline: per-doc loss is 6dp at the ln() boundary, then
    * carried as exact ×1e6 integers; domain means are integer half-up
    * division ((2S+n) div 2n) — a decimal mean over a 2^a·5^b-sized
    * group terminates and CAN land on an exact 6dp half, where the
    * engines' double-round rules split; exp() output is 6dp before
    * the decimal-exact normalization; the (1-ε)·w + ε/n blend runs
    * entirely in DECIMAL — the mmr lesson: a double blend of 6dp
    * values lands on 7th-decimal halves exactly where engines
    * disagree on rounding.
    *
    * Scale shape: corpus is scanned ONCE into a per-source map-side
    * hash agg (20 rows); the overall mean and the weight-sum are
    * broadcast scalars; every later stage is domain-dimension-sized.
    * At 100 TB nothing but the one partial agg touches the data. */
  def doremiReweight(s: SparkSession, dir: String): DataFrame = {
    val eta = 1.0
    // per-doc loss in exact micro-units: per-source doc counts are
    // 2^a·5^b here, so a decimal mean CAN land on an exact 6dp half —
    // the (2S+n) div (2n) integer mean is half-up in both engines
    val per = Tables.documents(s, dir)
      .select(col("source"), round(docLoss * 1e6).cast("long").as("l_u"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("l_u")).as("sl"))
      .select(col("source"), col("n_docs"), col("sl"),
        expr("(2*sl + n_docs) div (2*n_docs)").as("ml_u"))
    val overall = per
      .agg(sum(col("sl")).as("st"), sum(col("n_docs")).as("nt"))
      .select(expr("(2*st + nt) div (2*nt)").as("ol_u"))
    val w = per.crossJoin(broadcast(overall))
      .select(col("source"), col("n_docs"),
        (col("ml_u").cast("double") / 1e6).as("mean_loss"),
        (greatest(lit(0L), col("ml_u") - col("ol_u")).cast("double") / 1e6)
          .as("excess"))
      .withColumn("w_raw", round(exp(lit(eta) * col("excess")), 6))
    val tot = w.agg(
      sum(col("w_raw").cast("decimal(18,6)")).as("sw"),
      count(lit(1)).as("n_domains"))
    w.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("mean_loss"), col("excess"),
        round(
          round(col("w_raw") / col("sw").cast("double"), 6)
            .cast("decimal(10,6)") * lit(0.98).cast("decimal(4,2)")
            + round(lit(0.02) / col("n_domains"), 12).cast("decimal(16,12)"),
          6).cast("double").as("weight"))
  }

  /** Row-local reward shared by #179/#180: type-token ratio (distinct
    * tokens / tokens) — the cheap "not-degenerate" quality signal a
    * best-of-n sampler would rank candidates by. Integer-over-integer
    * division: identical doubles in both engines. */
  private def reward = {
    val tk = split(col("text"), " ")
    round(size(array_distinct(tk)).cast("double") / size(tk), 6)
  }

  /** #179 REJECTION SAMPLING (best-of-n) — per candidate group, keep
    * the highest-reward sample: the RLHF-era selection step that turns
    * n generations per prompt into one accepted training example.
    * Prompt groups are deterministic (doc_id mod 64 — the planted-
    * probe idiom); reward is the row-local TTR proxy; the argmax
    * tie-breaks (reward desc, doc_id asc) so re-runs are stable.
    *
    * Scale shape: ONE map-side-combinable hash agg over the scan —
    * `max_by(struct, struct)` keeps the argmax inside the partial agg
    * (no window, no per-group sort, no shuffle beyond the group agg);
    * the mean rides the same agg in exact DECIMAL. */
  def rejectionSample(s: SparkSession, dir: String): DataFrame = {
    // rewards carried as exact micro-units (×1e6 integers): a group
    // mean over a 2^a·5^b-sized group terminates in decimal and CAN
    // land on an exact 6dp half, where engines' double-round rules
    // split — integer (2S+n) div (2n) is half-up in both, exactly
    Tables.documents(s, dir)
      .select(pmod(col("doc_id"), lit(64)).as("prompt_id"), col("doc_id"),
        round(reward * 1e6).cast("long").as("rw_u"))
      .groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_candidates"),
        max_by(struct(col("doc_id"), col("rw_u")),
          struct(col("rw_u"), negate(col("doc_id")))).as("best"),
        sum(col("rw_u")).as("sm"))
      .select(col("prompt_id"), col("n_candidates"),
        col("best.doc_id").as("chosen_id"),
        (col("best.rw_u").cast("double") / 1e6).as("best_reward"),
        expr("(2*sm + n_candidates) div (2*n_candidates)").as("mu"),
        col("best.rw_u").as("bu"))
      .select(col("prompt_id"), col("n_candidates"), col("chosen_id"),
        col("best_reward"),
        (col("mu").cast("double") / 1e6).as("mean_reward"),
        ((col("bu") - col("mu")).cast("double") / 1e6).as("reward_gap"))
  }

  /** #180 PREFERENCE-PAIR CONSTRUCTION — the DPO/RLHF data shape: per
    * prompt group, (chosen, rejected) = reward argmax vs argmin, kept
    * only when the margin clears a usability threshold (a pair the
    * model already orders correctly by a hair teaches nothing). Margin
    * compares in exact DECIMAL — both rewards are 6dp, so the
    * subtraction and the >= 0.05 test are exact in both engines.
    *
    * Scale shape: same single map-side agg as #179 — `max_by` and
    * `min_by` ride one hash aggregate (each task ships one candidate
    * pair per group), no window, no self-join of the corpus. */
  def preferencePairs(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(pmod(col("doc_id"), lit(64)).as("prompt_id"), col("doc_id"),
        reward.as("reward"))
      .groupBy(col("prompt_id"))
      .agg(
        max_by(struct(col("doc_id"), col("reward")),
          struct(col("reward"), negate(col("doc_id")))).as("ch"),
        min_by(struct(col("doc_id"), col("reward")),
          struct(col("reward"), col("doc_id"))).as("rj"))
      .select(col("prompt_id"),
        col("ch.doc_id").as("chosen_id"), col("ch.reward").as("chosen_reward"),
        col("rj.doc_id").as("rejected_id"),
        col("rj.reward").as("rejected_reward"))
      .withColumn("margin",
        (col("chosen_reward").cast("decimal(10,6)")
          - col("rejected_reward").cast("decimal(10,6)")).cast("double"))
      .filter(col("margin") >= 0.05)
  }

  /** #181 LENGTH-BUCKETED BATCHING diagnostics — the padding-waste
    * readout that decides a training loader's bucket boundaries: docs
    * bucket to the next power-of-two token cap (explicit CASE ladder,
    * never floating log2 — exact at the boundaries in both engines),
    * and each bucket reports its padded-token waste vs the waste the
    * same docs would cost padded to the GLOBAL max — the number that
    * justifies bucketing at all.
    *
    * Scale shape: bucket assignment is row-local on the scan; one
    * map-side agg to the handful of bucket rows; the global cap is a
    * broadcast scalar off the bucket frame (never a second corpus
    * scan). All-integer until the final ratios. */
  def lengthBuckets(s: SparkSession, dir: String): DataFrame = {
    val n = size(split(col("text"), " ")).cast("long")
    val cap = when(n <= 16, 16L).when(n <= 32, 32L).when(n <= 64, 64L)
      .when(n <= 128, 128L).when(n <= 256, 256L).otherwise(512L)
    val per = Tables.documents(s, dir)
      .select(cap.as("bucket_cap"), n.as("n_tok"))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tot_tokens"))
      .withColumn("tot_padded", col("bucket_cap") * col("n_docs"))
    val g = per.agg(max(col("bucket_cap")).as("global_cap"))
    // waste/padded has a power-of-two denominator — a terminating
    // decimal that CAN land on an exact 6dp half; integer half-up
    // division keeps both engines on the same side
    per.crossJoin(broadcast(g))
      .withColumn("gpad", col("n_docs") * col("global_cap"))
      .select(col("bucket_cap"), col("n_docs"), col("tot_tokens"),
        col("tot_padded"),
        (expr("(2*(tot_padded - tot_tokens)*1000000 + tot_padded) div (2*tot_padded)")
          .cast("double") / 1e6).as("waste_ratio"),
        (expr("(2*(gpad - tot_tokens)*1000000 + gpad) div (2*gpad)")
          .cast("double") / 1e6).as("global_waste_ratio"))
  }

  /** #182 DATA-CONSTRAINED EPOCH ALLOCATION — given a token budget of
    * 3× the corpus and a temperature-smoothed target mixture (#85's
    * τ=0.5 sqrt weights), how many EPOCHS of each source does the run
    * consume, capped at 4 (past which repeated data stops paying —
    * Muennighoff et al. 2023)? The capped sources report their unmet
    * deficit: the signal to go buy more of that domain.
    *
    * Float discipline: sqrt weights are 6dp before the DECIMAL-exact
    * weight sum; desired tokens = decimal(temp_weight) × bigint budget
    * rounded in DECIMAL (a 6dp-weight × integer product CAN land on an
    * exact .5 — the double-rounding boundary, so the round must be
    * decimal half-up in both engines); served tokens likewise.
    *
    * Scale shape: one map-side per-source token agg over the scan;
    * budget and weight-sum are broadcast scalars; everything after is
    * 20-row arithmetic. */
  def epochAllocation(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("tokens"))
    val tot = per.agg(sum(col("tokens")).as("t_all"))
    val w = per.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"),
        round(col("tokens").cast("double") / col("t_all"), 6).as("share"),
        round(sqrt(col("tokens").cast("double") / col("t_all")), 6).as("w6"),
        (col("t_all") * 3L).as("budget"))
    val sw = w.agg(sum(col("w6").cast("decimal(18,6)")).as("sw"))
    w.crossJoin(broadcast(sw))
      .select(col("source"), col("tokens"), col("share"),
        round(col("w6") / col("sw").cast("double"), 6).as("temp_weight"),
        col("budget"))
      .withColumn("desired_tokens",
        round(col("temp_weight").cast("decimal(10,6)")
          * col("budget").cast("decimal(20,0)"), 0).cast("long"))
      .withColumn("epochs",
        round(col("desired_tokens").cast("double") / col("tokens"), 6))
      .withColumn("epochs_capped", least(col("epochs"), lit(4.0)))
      .withColumn("served_tokens",
        round(col("tokens").cast("decimal(20,0)")
          * col("epochs_capped").cast("decimal(10,6)"), 0).cast("long"))
      .withColumn("deficit", col("desired_tokens") - col("served_tokens"))
      .drop("budget")
  }

  /** Adjacent-symbol pair counts over a BPE vocab frame (sym =
    * symbols each wrapped in <...> sentinels). Pairs keep the
    * readable "a b" output form; only the stored representation is
    * wrapped. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val t = split(trim(col("sym"), "<>"), "><")
    vocab.select(col("freq"), t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => concat(element_at(col("t"), i), lit(" "),
            element_at(col("t"), i + 1)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
  }

  /** #183 BPE TRAINING LOOP — three full merge rounds of byte-pair-
    * encoding tokenizer training (the iterated form of #80's single
    * pair-count step): count weighted adjacent-symbol pairs, pick the
    * most frequent (lexicographic tie-break), APPLY the merge to every
    * word, repeat. Words are represented as symbol strings with each
    * symbol WRAPPED in sentinels ("<h><e><l><l><o>"), so applying a
    * merge is one `replace(sym, "<a><b>", "<ab>")` — string replace is
    * left-to-right non-overlapping in both engines, and because
    * adjacent matches share NO boundary characters under the wrapped
    * form, one pass IS greedy BPE merge order ("<b><b><b><b>" →
    * "<bb><bb>"; a space-separated form would share the boundary
    * space and miss every other merge in a run).
    *
    * Scale shape: the corpus is scanned ONCE into the word-frequency
    * table (the vocabulary — tiny relative to the corpus, which is
    * exactly why real BPE trainers count words first); each round is
    * one vocabulary-sized pair agg + a bounded top-1
    * (TakeOrderedAndProject) broadcast back; localCheckpoint truncates
    * the per-round lineage. All-integer counting — no float anywhere.
    *
    * Oracle replays the three rounds as chained CTEs. */
  def bpeTrain(s: SparkSession, dir: String): DataFrame =
    bpeLoop(bpeWordFreq(s, dir), rounds = 3)._1

  /** The trainable word-frequency table: lowercase-alphabetic words of
    * 2-20 chars (tokenizer pre-normalization), counted in ONE
    * map-side-combined agg over the corpus scan — the only stage that
    * ever touches the data. */
  private[graft] def bpeWordFreq(s: SparkSession, dir: String): DataFrame =
    bpeWordFreqOf(Tables.documents(s, dir))

  /** Frame-level (word, freq) vocabulary of an arbitrary document
    * frame — shared with the release pipeline's tokenizer stage. */
  private[graft] def bpeWordFreqOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")).between(2, 20))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** `rounds` BPE merge rounds over a (word, freq) table. Returns
    * (merges: merge_no/pair/merged/cnt, encoded vocab: word/sym/freq
    * AFTER all merges) — the merge list is the trained tokenizer, the
    * vocab its encoded training set. Each round is one vocab-sized
    * pair agg + a bounded top-1 broadcast back; localCheckpoint
    * truncates round lineage. */
  private[graft] def bpeLoop(words: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    var vocab = words.select(col("word"),
      regexp_replace(col("word"), "(.)", "<$1>").as("sym"),
      col("freq")).localCheckpoint()
    val picks = Seq.newBuilder[DataFrame]
    for (m <- 1 to rounds) {
      val best = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .select(lit(m.toLong).as("merge_no"), col("pair"),
          replace(col("pair"), lit(" "), lit("")).as("merged"), col("cnt"))
        .localCheckpoint()
      picks += best
      vocab = vocab.crossJoin(broadcast(best.select(col("pair").as("bp"))))
        .select(col("word"), replace(col("sym"),
          concat(lit("<"), replace(col("bp"), lit(" "), lit("><")), lit(">")),
          concat(lit("<"), replace(col("bp"), lit(" "), lit("")), lit(">")))
          .as("sym"),
          col("freq")).localCheckpoint()
    }
    (picks.result().reduce(_ unionByName _), vocab)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doremi_reweight"  -> doremiReweight _,
    "q_rejection_sample" -> rejectionSample _,
    "q_preference_pairs" -> preferencePairs _,
    "q_length_buckets"   -> lengthBuckets _,
    "q_epoch_allocation" -> epochAllocation _,
    "q_bpe_train"        -> bpeTrain _)

  /** The three BPE merge rounds replayed as chained CTEs. */
  private def bpeOracle: String = {
    val steps = (1 to 3).map { m =>
      val prev = s"s${m - 1}"
      s"""p$m AS (SELECT pair, SUM(freq) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(t)),
         |      i -> t[i] || ' ' || t[i+1])) AS pair
         |    FROM (SELECT string_split(trim(sym, '<>'), '><') AS t, freq
         |      FROM $prev)
         |    WHERE len(t) >= 2) GROUP BY 1),
         |b$m AS (SELECT pair, cnt FROM p$m ORDER BY cnt DESC, pair LIMIT 1),
         |s$m AS (SELECT replace(sym, '<'||replace(b.pair,' ','><')||'>',
         |    '<'||replace(b.pair,' ','')||'>') AS sym, freq
         |  FROM $prev, b$m b)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (SELECT word, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text,' ')) AS word FROM documents) t
       |  WHERE regexp_matches(word, '^[a-z]+$$') AND len(word) BETWEEN 2 AND 20
       |  GROUP BY 1),
       |s0 AS (SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS sym,
       |    freq FROM w),
       |$steps
       |SELECT CAST(1 AS BIGINT) AS merge_no, pair,
       |  replace(pair,' ','') AS merged, CAST(cnt AS BIGINT) AS cnt FROM b1
       |UNION ALL SELECT 2, pair, replace(pair,' ',''), CAST(cnt AS BIGINT)
       |  FROM b2
       |UNION ALL SELECT 3, pair, replace(pair,' ',''), CAST(cnt AS BIGINT)
       |  FROM b3""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_bpe_train" -> bpeOracle,
    "q_doremi_reweight" ->
      """WITH d AS (SELECT source,
        |    CAST(ROUND(ROUND(ln(1.0 +
        |      CAST(list_sum(list_transform(tk, t -> LEN(t))) AS DOUBLE)
        |      / LEN(tk)), 6) * 1000000, 0) AS BIGINT) AS l_u
        |  FROM (SELECT source, string_split(text, ' ') AS tk FROM documents)),
        |per AS (SELECT source, COUNT(*) AS n_docs, SUM(l_u) AS sl
        |  FROM d GROUP BY 1),
        |pm AS (SELECT source, n_docs, sl,
        |    (2*sl + n_docs) // (2*n_docs) AS ml_u FROM per),
        |o AS (SELECT (2*SUM(sl) + SUM(n_docs)) // (2*SUM(n_docs)) AS ol_u
        |  FROM per),
        |x AS (SELECT source, n_docs,
        |    CAST(ml_u AS DOUBLE) / 1000000 AS mean_loss,
        |    CAST(GREATEST(0, ml_u - ol_u) AS DOUBLE) / 1000000 AS excess
        |  FROM pm, o),
        |wr AS (SELECT source, n_docs, mean_loss, excess,
        |    ROUND(exp(1.0 * excess), 6) AS w_raw FROM x),
        |t AS (SELECT SUM(CAST(w_raw AS DECIMAL(18,6))) AS sw,
        |    COUNT(*) AS n_domains FROM wr)
        |SELECT source, n_docs, mean_loss, excess,
        |  CAST(ROUND(
        |    CAST(ROUND(w_raw / CAST(sw AS DOUBLE), 6) AS DECIMAL(10,6))
        |      * CAST(0.98 AS DECIMAL(4,2))
        |    + CAST(ROUND(0.02 / n_domains, 12) AS DECIMAL(16,12)),
        |  6) AS DOUBLE) AS weight
        |FROM wr, t""".stripMargin,
    "q_rejection_sample" ->
      """WITH r AS (SELECT doc_id % 64 AS prompt_id, doc_id,
        |    CAST(ROUND(ROUND(CAST(LEN(list_distinct(tk)) AS DOUBLE)
        |      / LEN(tk), 6) * 1000000, 0) AS BIGINT) AS rw_u
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)),
        |best AS (SELECT prompt_id, doc_id AS chosen_id, rw_u AS bu
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY prompt_id
        |      ORDER BY rw_u DESC, doc_id) AS rn FROM r) WHERE rn = 1),
        |m AS (SELECT prompt_id, COUNT(*) AS n_candidates, SUM(rw_u) AS sm
        |  FROM r GROUP BY 1),
        |j AS (SELECT m.prompt_id, n_candidates, chosen_id, bu,
        |    (2*sm + n_candidates) // (2*n_candidates) AS mu
        |  FROM m JOIN best ON m.prompt_id = best.prompt_id)
        |SELECT prompt_id, n_candidates, chosen_id,
        |  CAST(bu AS DOUBLE) / 1000000 AS best_reward,
        |  CAST(mu AS DOUBLE) / 1000000 AS mean_reward,
        |  CAST(bu - mu AS DOUBLE) / 1000000 AS reward_gap
        |FROM j""".stripMargin,
    "q_preference_pairs" ->
      """WITH r AS (SELECT doc_id % 64 AS prompt_id, doc_id,
        |    ROUND(CAST(LEN(list_distinct(tk)) AS DOUBLE) / LEN(tk), 6)
        |      AS reward
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)),
        |ch AS (SELECT prompt_id, doc_id AS chosen_id,
        |    reward AS chosen_reward
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY prompt_id
        |      ORDER BY reward DESC, doc_id) AS rn FROM r) WHERE rn = 1),
        |rj AS (SELECT prompt_id, doc_id AS rejected_id,
        |    reward AS rejected_reward
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY prompt_id
        |      ORDER BY reward, doc_id) AS rn FROM r) WHERE rn = 1)
        |SELECT ch.prompt_id, chosen_id, chosen_reward, rejected_id,
        |  rejected_reward,
        |  CAST(CAST(chosen_reward AS DECIMAL(10,6))
        |    - CAST(rejected_reward AS DECIMAL(10,6)) AS DOUBLE) AS margin
        |FROM ch JOIN rj ON ch.prompt_id = rj.prompt_id
        |WHERE CAST(chosen_reward AS DECIMAL(10,6))
        |    - CAST(rejected_reward AS DECIMAL(10,6)) >= 0.05""".stripMargin,
    "q_length_buckets" ->
      """WITH d AS (SELECT CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
        |      WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
        |      WHEN n <= 256 THEN 256 ELSE 512 END AS bucket_cap, n FROM d),
        |per AS (SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
        |    COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS tot_tokens,
        |    CAST(bucket_cap * COUNT(*) AS BIGINT) AS tot_padded
        |  FROM b GROUP BY bucket_cap),
        |g AS (SELECT MAX(bucket_cap) AS global_cap FROM per)
        |SELECT bucket_cap, n_docs, tot_tokens, tot_padded,
        |  CAST((2*(tot_padded - tot_tokens)*1000000 + tot_padded)
        |    // (2*tot_padded) AS DOUBLE) / 1000000 AS waste_ratio,
        |  CAST((2*(n_docs*global_cap - tot_tokens)*1000000 + n_docs*global_cap)
        |    // (2*n_docs*global_cap) AS DOUBLE) / 1000000
        |    AS global_waste_ratio
        |FROM per, g""".stripMargin,
    "q_epoch_allocation" ->
      """WITH per AS (SELECT source,
        |    CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT SUM(tokens) AS t_all FROM per),
        |w AS (SELECT source, tokens,
        |    ROUND(CAST(tokens AS DOUBLE) / t_all, 6) AS share,
        |    ROUND(sqrt(CAST(tokens AS DOUBLE) / t_all), 6) AS w6,
        |    CAST(t_all * 3 AS BIGINT) AS budget
        |  FROM per, t),
        |sw AS (SELECT SUM(CAST(w6 AS DECIMAL(18,6))) AS sw FROM w),
        |a AS (SELECT source, tokens, share,
        |    ROUND(w6 / CAST(sw AS DOUBLE), 6) AS temp_weight, budget
        |  FROM w, sw),
        |b AS (SELECT source, tokens, share, temp_weight,
        |    CAST(ROUND(CAST(temp_weight AS DECIMAL(10,6))
        |      * CAST(budget AS DECIMAL(20,0)), 0) AS BIGINT) AS desired_tokens
        |  FROM a),
        |c AS (SELECT *, ROUND(CAST(desired_tokens AS DOUBLE) / tokens, 6)
        |    AS epochs FROM b),
        |e AS (SELECT *, LEAST(epochs, 4.0) AS epochs_capped FROM c)
        |SELECT source, tokens, share, temp_weight, desired_tokens, epochs,
        |  epochs_capped,
        |  CAST(ROUND(CAST(tokens AS DECIMAL(20,0))
        |    * CAST(epochs_capped AS DECIMAL(10,6)), 0) AS BIGINT)
        |    AS served_tokens,
        |  desired_tokens - CAST(ROUND(CAST(tokens AS DECIMAL(20,0))
        |    * CAST(epochs_capped AS DECIMAL(10,6)), 0) AS BIGINT) AS deficit
        |FROM e""".stripMargin)
}
