package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.similarity.Embeddings

/** Third curation batch (SURVEY §2 #82-90): Gopher-style repetition
  * filtering, corpus-LM document scoring, winnowing fingerprints,
  * temperature-scaled domain mixture weights, a k-means Lloyd
  * iteration, tokenizer vocabulary coverage, per-source token entropy,
  * an IVF recall report, and the language-mixture composition table.
  */
object CurationB {

  private def tokenized(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))

  /** Adjacent-bigram array via the native codegen shingle kernel
    * (n=2) — identical semantics to the transform/element_at HOF
    * composition (incl. sub-2-token docs → empty array), and shingling
    * is the dominant scan-stage cost, so it must not fall out of
    * codegen. */
  private def bigrams(text: Column): Column =
    graft.plans.WordShingles(text, 2)

  /** Longest adjacent-equal run in a SORTED string array = the
    * multiplicity of its most frequent element, as a single
    * left-fold — the row-local replacement for explode + groupBy +
    * max(count). */
  private def maxMultiplicity(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") === x, acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** #82 REPETITION filter (Rae et al. 2021 "Gopher" §A1.1 repetition
    * rules, the half of quality filtering that #65 does not cover):
    * per document, the fraction of all adjacent bigrams taken by the
    * single most frequent bigram, and the fraction of non-overlapping
    * 8-token segments that occur more than once within the doc. Both
    * signals are PER-DOC properties, so they are computed entirely
    * ROW-LOCALLY: sort the bigram/segment arrays and read
    * multiplicities off adjacent runs — zero shuffles, the filter
    * rides the parquet scan (the explode + doc_id-keyed groupBy
    * formulation would shuffle the whole corpus twice for what a
    * per-row fold can answer). Thresholds (top bigram ≤ 0.2,
    * duplicated segments ≤ 0.2) mirror the published rule shape. */
  def repetitionFilter(s: SparkSession, dir: String): DataFrame = {
    // materialize the sorted arrays as COLUMNS before the run-length
    // sweeps: an expression referenced inside an HOF lambda is
    // re-evaluated per element (quadratic); an attribute is a row read
    val nSeg = ceil(size(col("toks")).cast("double") / 8).cast("int")
    val prepped = tokenized(s, dir).select(
      col("doc_id"),
      array_sort(bigrams(col("text"))).as("bg"),
      array_sort(transform(sequence(lit(0), nSeg - 1),
        i => array_join(slice(col("toks"), i * 8 + 1, lit(8)), " ")))
        .as("segs"))
    val nBg = size(col("bg"))
    val topFrac = when(nBg === 0, 0.0)
      .otherwise(round(maxMultiplicity(col("bg")).cast("double") / nBg, 6))
    val m = size(col("segs"))
    // a sorted element occurs exactly once iff it differs from both
    // neighbours; duplicated occurrences = m - singletons
    val segAt = (i: Column) => element_at(col("segs"), i)
    val singletons = size(filter(sequence(lit(1), m), i =>
      (i === 1 || segAt(i) =!= segAt(i - 1)) &&
        (i === m || segAt(i) =!= segAt(i + 1))))
    val dupFrac = round((m - singletons).cast("double") / m, 6)
    prepped
      .select(col("doc_id"),
        nBg.cast("long").as("n_bigrams"),
        topFrac.as("top_bigram_frac"),
        dupFrac.as("dup_seg_frac"))
      .withColumn("rep_pass",
        when(col("top_bigram_frac") <= 0.2 && col("dup_seg_frac") <= 0.2, 1L)
          .otherwise(0L))
  }

  /** #83 corpus-LM DOCUMENT SCORING (the CCNet-style "score every doc
    * with a language model trained on the corpus itself" step, with a
    * bigram LM like #78's count table): conditional log-prob
    * ln(C(w1,w2)/C(w1,·)) per bigram, averaged per document. NOTE the
    * denominator is the bigram-PREFIX count C(w1,·) — the standard
    * conditional-probability estimate whose per-w1 probabilities sum
    * to 1 — not #78's raw unigram count C(w1), which also counts
    * doc-final occurrences of w1; the two differ for any w1 that ends
    * a document. The bigram count table C2 is one map-side-combined
    * hash agg over the row-local bigram explode; C1 is DERIVED from
    * C2 (C(w1,·) = Σ_w2 C(w1,w2)) by re-aggregating the
    * vocabulary-sized count table, so the corpus is never exploded a
    * second time for the denominator. Every join (including the
    * keep-every-doc join-back, where both sides are corpus-sized at
    * 100 TB) is SHUFFLE_HASH so the corpus-derived LM never
    * broadcasts. Sub-2-token docs score 0 over 0 bigrams rather than
    * dropping. */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val docs = tokenized(s, dir)
    val bg = docs
      .select(col("doc_id"), explode(bigrams(col("text"))).as("bg"))
      .select(col("doc_id"), col("bg").as("bg2"))
    val c2 = bg.groupBy(col("bg2")).agg(count(lit(1)).as("c2"))
    val c1 = c2
      .groupBy(substring_index(col("bg2"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val lm = c2
      .withColumn("w1", substring_index(col("bg2"), " ", 1))
      .join(c1.hint("shuffle_hash"), "w1")
      .select(col("bg2"),
        log(col("c2").cast("double") / col("c1")).as("logp"))
    val scored = bg.join(lm.hint("shuffle_hash"), "bg2")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 6).as("avg_logp"))
    docs.select(col("doc_id"))
      .join(scored.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logp"), lit(0.0)).as("avg_logp"))
  }

  /** #84 WINNOWING fingerprints (Schleimer et al. 2003, the MOSS
    * local-fingerprinting scheme): md5 each 3-word shingle, slide a
    * window of 4 hashes, keep the window minimum, dedup — the
    * guarantee is that any shared run of ≥6 words between two docs
    * shares a fingerprint. Entirely ROW-LOCAL (shingle kernel +
    * transform/slice/array_min HOFs on the scan, zero shuffles), so
    * at 100 TB it rides the parquet read like #45. Docs shorter than
    * the window keep all their hashes. */
  def winnow(s: SparkSession, dir: String): DataFrame = {
    // materialize the hash array as a COLUMN before the windowed scan:
    // an expression referenced inside a higher-order-function lambda is
    // re-evaluated per element (here: the whole md5-transform, turning
    // the window sweep quadratic); an attribute reference is a row read
    val hashed = Tables.documents(s, dir)
      .select(col("doc_id"),
        transform(graft.plans.WordShingles(col("text"), 3), x => md5(x))
          .as("h"))
    val h = col("h")
    val fps = when(size(h) >= 4,
      array_distinct(transform(sequence(lit(1), size(h) - 3),
        i => array_min(slice(h, i, lit(4))))))
      .otherwise(array_distinct(h))
    hashed
      .select(col("doc_id"), fps.as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
  }

  /** #85 TEMPERATURE-scaled domain mixture (the multilingual /
    * multi-domain sampling rule p_d ∝ share_d^α, α=0.5, used to
    * up-weight small domains when building a training mix — the
    * companion knob to #67's absolute token targets): per-source
    * token share and the renormalized temperature weight. Two scalar
    * aggregates broadcast back over the tiny per-source frame; the
    * corpus is scanned once and never shuffled beyond the per-source
    * hash agg. */
  def domainTemperature(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).as("tokens"))
    val tot = per.agg(sum(col("tokens")).as("t_all"))
    val w = per.crossJoin(broadcast(tot))
      .withColumn("share", col("tokens").cast("double") / col("t_all"))
      .withColumn("w", pow(col("share"), 0.5))
    val wsum = w.agg(sum(col("w")).as("w_all"))
    w.crossJoin(broadcast(wsum))
      .select(col("source"), col("tokens"),
        round(col("share"), 6).as("share"),
        round(col("w") / col("w_all"), 6).as("temp_weight"))
  }

  /** #86 K-MEANS Lloyd ITERATION (the centroid-training step that
    * feeds #57's IVF index and #76's SemDeDup clustering): seed
    * centroids = vectors with vec_id < 8, assign every vector to its
    * max-cosine centroid, emit the recomputed means. The seed set is
    * BROADCAST against the corpus scan; assignment is a map-side
    * max_by hash agg with the (score desc, cid asc) tie-break of #57;
    * the mean recompute is [[graft.plans.VecSumAgg]] — one (sums, n)
    * row per centroid crosses the shuffle, never per-dimension rows.
    * Iterating = re-feeding the output as the next seed frame; one
    * iteration is gated here because the oracle replays it exactly. */
  def kmeansIter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
    val scored = e.crossJoin(broadcast(seeds))
      .withColumn("ccos", round(Embeddings.cosine(col("v"), col("cv")), 6))
    val assigned = scored
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("v")),
        struct(col("ccos"), negate(col("cid")))).as("a"))
      .select(col("a.cid").as("cid"), col("a.v").as("v"))
    assigned.as[(Int, Array[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.plans.VecSumAgg.toColumn)
      .flatMap { case (cid, acc) =>
        acc.sum.zipWithIndex.map { case (sm, i) =>
          (cid, (i + 1).toLong, sm / acc.n, acc.n)
        }
      }
      .toDF("cid", "dim", "centroid", "n_assigned")
      .withColumn("centroid", round(col("centroid"), 6))
  }

  /** #87 VOCABULARY COVERAGE (tokenizer-training prep): the term
    * frequency table ranked by count with the cumulative token
    * fraction each prefix of the vocabulary covers — the curve read
    * to size a vocab ("how many types cover 95% of the corpus").
    * The corpus-side work is one map-side-combined hash agg; the
    * top-100 selection is a distributed `TakeOrderedAndProject`
    * (each task ships at most 100 rows, the driver merges) — NEVER a
    * partition-less window over the full vocabulary, because a
    * web-crawl vocabulary at 100 TB (typo'd tokens, URLs, ids) is
    * billions of types and a global ordered window would sort all of
    * them in ONE task. The total-token denominator is a broadcast
    * scalar, and the rank/cumsum window runs over only the bounded
    * 100-row frame that survives the take. */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val tot = tf.agg(sum(col("cnt")).as("tot"))
    val top = tf.orderBy(col("cnt").desc, col("term")).limit(100)
    // the window input is the ≤100-row take output, not the vocabulary
    val w = Window.orderBy(col("cnt").desc, col("term"))
    top.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .select(col("term"), col("cnt"), col("rank"),
        round(col("cum").cast("double") / col("tot"), 6).as("cum_frac"))
  }

  /** #88 per-source TOKEN ENTROPY + type/token profile (the corpus
    * diversity diagnostic read next to #67/#85 when composing a
    * training mix): unigram Shannon entropy per source via the
    * one-pass identity H = ln T − (Σ c·ln c)/T, so the whole query is
    * two map-side-combined hash aggs — no per-term probabilities ever
    * materialize corpus-wide. */
  def tokenEntropy(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        round(log(col("n_tokens").cast("double")) -
          col("clnc") / col("n_tokens"), 6).as("entropy"))

  /** #89 IVF RECALL report (the index-quality evaluation an ANN owner
    * runs before trusting #57's bucketed search — the vector-index
    * counterpart of #36e's MinHash estimator check): per query,
    * recall@3 of the nprobe=2 IVF result against the exact
    * brute-force top-3. Reuses the production operators for both
    * sides ([[Embeddings.ivfTopK]], [[Embeddings.bruteForceTopK]]);
    * the comparison itself is one tiny join over (queries × k) rows,
    * so the evaluation costs no more than running the two searches. */
  def ivfRecall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
        Embeddings.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("n_id"),
      Embeddings.asDouble(col("embedding")).as("nv"))
    val truth = Embeddings.bruteForceTopK(q, c, 3)
      .select(col("q_id"), col("n_id"))
    val vecs = e.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val approx = Embeddings
      .ivfTopK(vecs, Extras.embeddingCentroids(s, dir),
        queryMaxId = 5L, k = 3, nprobe = 2)
      .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
    truth.join(approx, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall",
        round(col("n_hits").cast("double") / col("n_true"), 6))
  }

  /** #90 LANGUAGE MIXTURE report over the corpus's declared `lang`
    * column (the per-language composition table read next to #85/#88
    * when balancing a multilingual mix — declared metadata here,
    * where #43 infers it from text): per-language doc/token counts
    * and token share. One map-side hash agg + a broadcast scalar. */
  def langMix(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
    val tot = per.agg(sum(col("tokens")).as("t_all"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("t_all"), 6).as("share"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_repetition_filter" -> repetitionFilter _,
    "q_lm_score"          -> lmScore _,
    "q_winnow"            -> winnow _,
    "q_domain_temperature" -> domainTemperature _,
    "q_kmeans_iter"       -> kmeansIter _,
    "q_vocab_coverage"    -> vocabCoverage _,
    "q_token_entropy"     -> tokenEntropy _,
    "q_ivf_recall"        -> ivfRecall _,
    "q_lang_mix"          -> langMix _
  )

  val oracles: Map[String, String] = Map(
    "q_repetition_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bi AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END) AS bg FROM t),
        |bc AS (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2),
        |bf AS (SELECT doc_id, sum(c) AS n_bigrams,
        |  ROUND(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_bigram_frac
        |  FROM bc GROUP BY 1),
        |sg AS (SELECT doc_id, unnest(list_transform(
        |    range(0, CAST(ceil(len(toks) / 8.0) AS INT)),
        |    i -> array_to_string(toks[i*8+1:i*8+8], ' '))) AS seg FROM t),
        |sc AS (SELECT doc_id, seg, count(*) AS c FROM sg GROUP BY 1, 2),
        |sf AS (SELECT doc_id, sum(c) AS n_segs,
        |  ROUND(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c), 6)
        |    AS dup_seg_frac
        |  FROM sc GROUP BY 1)
        |SELECT t.doc_id,
        |  CAST(COALESCE(bf.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  COALESCE(bf.top_bigram_frac, 0.0) AS top_bigram_frac,
        |  COALESCE(sf.dup_seg_frac, 0.0) AS dup_seg_frac,
        |  CAST(CASE WHEN COALESCE(bf.top_bigram_frac, 0.0) <= 0.2
        |    AND COALESCE(sf.dup_seg_frac, 0.0) <= 0.2 THEN 1 ELSE 0 END AS BIGINT)
        |    AS rep_pass
        |FROM t LEFT JOIN bf ON t.doc_id = bf.doc_id
        |       LEFT JOIN sf ON t.doc_id = sf.doc_id""".stripMargin,
    "q_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bi AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END) AS bg FROM t),
        |b AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bi),
        |c2 AS (SELECT bg, count(*) AS c2 FROM b GROUP BY 1),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
        |lm AS (SELECT c2.bg, ln(CAST(c2.c2 AS DOUBLE) / c1.c1) AS logp
        |  FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1),
        |sc AS (SELECT b.doc_id, count(*) AS n_bigrams,
        |  ROUND(avg(lm.logp), 6) AS avg_logp
        |  FROM b JOIN lm ON b.bg = lm.bg GROUP BY 1)
        |SELECT t.doc_id,
        |  CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  COALESCE(sc.avg_logp, 0.0) AS avg_logp
        |FROM t LEFT JOIN sc ON t.doc_id = sc.doc_id""".stripMargin,
    "q_winnow" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks) - 1),
        |           i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |    ELSE CAST([] AS VARCHAR[]) END AS h FROM t),
        |f AS (SELECT doc_id, CASE WHEN len(h) >= 4
        |    THEN list_distinct(list_transform(range(1, len(h) - 2),
        |           i -> list_min(h[i:i+3])))
        |    ELSE list_distinct(h) END AS fps FROM s)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
        |  list_min(fps) AS min_fp, list_max(fps) AS max_fp
        |FROM f""".stripMargin,
    "q_lang_mix" ->
      """WITH per AS (SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, tokens,
        |  ROUND(CAST(tokens AS DOUBLE) / SUM(tokens) OVER (), 6) AS share
        |FROM per""".stripMargin,
    "q_ivf_recall" ->
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
        |  JOIN assigned c ON c.bucket = p.bucket AND c.vec_id <> p.q_id),
        |ivf AS (
        |  SELECT q_id, n_id FROM pairs
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) <= 3),
        |bf AS (
        |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |    ROUND(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
        |      / (sqrt(list_sum(list_transform(a.v, y -> y*y)))
        |         * sqrt(list_sum(list_transform(b.v, y -> y*y)))), 6) AS cos
        |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 5
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY cos DESC, b.vec_id) <= 3)
        |SELECT bf.q_id, COUNT(*) AS n_true,
        |  CAST(SUM(CASE WHEN i.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  ROUND(CAST(SUM(CASE WHEN i.n_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS recall
        |FROM bf LEFT JOIN ivf i ON bf.q_id = i.q_id AND bf.n_id = i.n_id
        |GROUP BY 1""".stripMargin,
    "q_kmeans_iter" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, e.v, c.cid,
        |    ROUND(list_sum(list_transform(range(1, 65), i -> e.v[i] * c.cv[i]))
        |      / (sqrt(list_sum(list_transform(e.v, y -> y*y)))
        |         * sqrt(list_sum(list_transform(c.cv, y -> y*y)))), 6) AS ccos
        |  FROM e, c),
        |assigned AS (
        |  SELECT vec_id, v, cid FROM scored
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
        |x AS (SELECT cid, CAST(i AS BIGINT) AS dim, v[i] AS val
        |  FROM assigned, UNNEST(range(1, 65)) AS t(i))
        |SELECT cid, dim, ROUND(AVG(val), 6) AS centroid,
        |  COUNT(*) AS n_assigned
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q_vocab_coverage" ->
      """WITH tf AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM tf GROUP BY 1),
        |r AS (SELECT term, cnt,
        |  ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank,
        |  SUM(cnt) OVER (ORDER BY cnt DESC, term) AS cum,
        |  SUM(cnt) OVER () AS tot FROM c)
        |SELECT term, cnt, CAST(rank AS BIGINT) AS rank,
        |  ROUND(CAST(cum AS DOUBLE) / tot, 6) AS cum_frac
        |FROM r WHERE rank <= 100""".stripMargin,
    "q_token_entropy" ->
      """WITH tc AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT source, term, count(*) AS c FROM tc GROUP BY 1, 2),
        |p AS (SELECT source, sum(c) AS n_tokens, count(*) AS vocab,
        |  sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
        |  FROM c GROUP BY 1)
        |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(vocab AS BIGINT) AS vocab,
        |  ROUND(ln(CAST(n_tokens AS DOUBLE)) - clnc / n_tokens, 6) AS entropy
        |FROM p""".stripMargin,
    "q_domain_temperature" ->
      """WITH per AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |    AS tokens FROM documents GROUP BY 1),
        |w AS (SELECT source, tokens,
        |  CAST(tokens AS DOUBLE) / sum(tokens) OVER () AS share,
        |  pow(CAST(tokens AS DOUBLE) / sum(tokens) OVER (), 0.5) AS w
        |  FROM per)
        |SELECT source, tokens, ROUND(share, 6) AS share,
        |  ROUND(w / sum(w) OVER (), 6) AS temp_weight
        |FROM w""".stripMargin
  )
}
