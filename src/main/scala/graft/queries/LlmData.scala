package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.dedup.TextDedup
import graft.similarity.Embeddings
import graft.multimodal.{BinaryDocs, SyntheticMedia}
import graft.functions.TextAnalysis

/** LLM-training-data operators (SURVEY §2 #35-47): dedup, similarity
  * search, text analysis, multimodal plumbing. */
object LlmData {

  /** #35 exact dedup via content-hash groupBy. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    TextDedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")

  /** #36 MinHash signature matrix (k=8 salted-md5 permutations over
    * word 3-gram shingles). LSH banding/bucketing over this matrix is
    * [[TextDedup.lshCandidates]], spec-tested on planted near-dups. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    TextDedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text")

  /** #37 32-bit SimHash per document. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    TextDedup.simhash(Tables.documents(s, dir), "doc_id", "text")

  /** #36b the flagship MinHash dedup path END-TO-END: signatures →
    * LSH band bucketing → distinct candidate pairs. Planted near-dups
    * (every doc unioned with a copy of itself plus a 3-token suffix)
    * guarantee the band join produces pairs to verify at any SF; the
    * oracle replays the identical union, signatures, band keys and
    * bucket self-join in SQL. */
  def dedupMinhashPairs(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val variants = base.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" near dup probe")).as("text"))
    val all = base.unionByName(variants)
    TextDedup.lshCandidates(
      TextDedup.minhashSignatures(all, "doc_id", "text"), "doc_id")
  }

  /** #36c the COMPLETE corpus-dedup pipeline as one query — what a
    * reference user actually runs over training data: MinHash
    * signatures → LSH band candidates → exact-Jaccard VERIFICATION of
    * candidates (row-local array_intersect) → connected-component
    * resolve → one canonical per cluster, every document labeled
    * keep/drop. Each stage is the scale shape: signatures row-local,
    * candidates bucket-local, verification bounded by the candidate
    * count, resolution a bounded fixpoint loop. */
  def dedupPipeline(s: SparkSession, dir: String): DataFrame =
    dedupLabelsOf(Tables.documents(s, dir))

  /** Frame-level #36c: the full MinHash→LSH→verify→resolve labeling of
    * an arbitrary (doc_id, text) frame — shared with the release
    * pipeline, which COMMITS this table as its `labels` artifact so
    * report queries can read the stored labeling instead of replaying
    * the pipeline. */
  private[graft] def dedupLabelsOf(docs: DataFrame): DataFrame = {
    val cand = TextDedup.lshCandidates(
      TextDedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
    val verified = TextDedup.verifyJaccard(cand, docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.2)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = graft.dedup.Resolve.connectedComponents(verified)
      .toDF("doc_id", "canonical_id")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
      .withColumn("keep", (col("doc_id") === col("canonical_id")).cast("int"))
  }

  /** #36d over an ALREADY-STORED labeling — the production shape: an
    * ops team reads the cluster-size histogram off the committed
    * `labels` artifact instead of re-executing the dedup pipeline. */
  private[graft] def dedupReportOf(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("canonical_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_dropped"))

  /** #36f over a stored labeling + token counts (see
    * [[dedupReportOf]]). */
  private[graft] def dedupSavingsOf(labels: DataFrame, tok: DataFrame): DataFrame =
    labels.join(tok, "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("kept_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(when(col("keep") === 1, col("n_tok")).otherwise(0L))
          .as("kept_tokens"))
      .select(col("n_docs"), col("kept_docs"),
        col("total_tokens"), col("kept_tokens"),
        round(lit(1.0) -
          col("kept_tokens").cast("double") / col("total_tokens"), 6)
          .as("token_savings"))

  /** #36f dedup SAVINGS report — the one-row summary a pipeline owner
    * quotes ("dedup drops X% of tokens"): document and token totals
    * before/after #36c's keep-one labeling. One corpus-keyed join
    * (both sides doc-sized, the label frame reuses the verified
    * pipeline) and a single global aggregate. */
  def dedupSavings(s: SparkSession, dir: String): DataFrame =
    dedupSavingsOf(dedupPipeline(s, dir),
      Tables.documents(s, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok")))

  /** #38 n-gram Jaccard near-dup pairs: top-20 most similar candidate
    * pairs from the shared-shingle inverted index (exact: df cap
    * explicitly off — this entry verifies the exact semantics). */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    TextDedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", maxDf = None)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)

  /** #38b the SCALE plan for n-gram Jaccard, itself oracle-verified:
    * document-frequency cap on candidate generation (stop-shingles
    * shared by more than maxDf docs are dropped before the
    * inverted-index self-join, bounding it at maxDf² pairs per
    * shingle). Cap of 4 bites at every test SF; pair counts still use
    * full per-doc sizes. */
  def dedupNgramJaccardCapped(s: SparkSession, dir: String): DataFrame =
    TextDedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", maxDf = Some(4))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)

  /** #39 embedding-cosine near-dup report: top-30 most similar pairs
    * over a bounded probe set (vec_id < 50). */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val a = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("a_id"), Embeddings.asDouble(col("embedding")).as("va"))
    val b = e.select(col("vec_id").as("b_id"), Embeddings.asDouble(col("embedding")).as("vb"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(Embeddings.cosine(col("va"), col("vb")), 6).as("cos"))
      .orderBy(col("cos").desc, col("a_id"), col("b_id"))
      .limit(30)
  }

  /** #40 brute-force cosine top-k ANN baseline (5 query vectors,
    * k=5). */
  def annTopk(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), Embeddings.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("n_id"), Embeddings.asDouble(col("embedding")).as("nv"))
    Embeddings.bruteForceTopK(q, c, 5)
  }

  /** #41 LSH-bucketed ANN scale path — a REAL neighbor query: sign-
    * bucket the corpus (4 hyperplane bits → 16 buckets), multi-probe
    * each query's home bucket plus its Hamming-1 neighbors (recall at
    * the hyperplane boundaries), and rank bucket-local candidates with
    * the bounded map-side [[graft.plans.TopKAgg]]. The tiny probe set
    * (queries × 5 probes) is BROADCAST; the corpus never moves — at
    * scale each query touches (bits+1)/2^bits of the data instead of
    * all of it. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bits = 4
    val b = Tables.embeddings(s, dir)
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
      .withColumn("bucket", Embeddings.signBucket(col("v"), bits))
    val probes = array((col("bucket") +:
      (1 to bits).map(i => Embeddings.flipBit(col("bucket"), i))): _*)
    val q = b.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), explode(probes).as("bucket"))
    val c = b.select(col("vec_id").as("n_id"), col("v").as("nv"), col("bucket"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"),
        round(Embeddings.cosine(col("qv"), col("nv")), 6).as("cos"), col("n_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(3).toColumn)
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case ((cs, n), i) => (qid, (i + 1).toLong, n, cs) }
      }
      .toDF("q_id", "rank", "n_id", "cos")
  }

  /** #42 text quality scoring: length / stopword ratios + gate. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_measured"),
      TextAnalysis.countIn(toks, TextAnalysis.Stopwords).as("stop_cnt"),
      round(TextAnalysis.countIn(toks, TextAnalysis.Stopwords) / size(toks), 6).as("stop_ratio"),
      when(size(toks) >= 20 &&
        (TextAnalysis.countIn(toks, TextAnalysis.Stopwords) / size(toks)) > 0.02, 1L)
        .otherwise(0L).as("quality_pass"))
  }

  /** #43 language ID via marker-word scores (n-gram heuristic). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val en = TextAnalysis.countIn(toks, Seq("the", "is", "and", "of", "to"))
    val es = TextAnalysis.countIn(toks, Seq("el", "la", "de", "que", "los"))
    val de = TextAnalysis.countIn(toks, Seq("der", "die", "das", "und", "ist"))
    val fr = TextAnalysis.countIn(toks, Seq("le", "les", "des", "est", "une"))
    Tables.documents(s, dir)
      .select(col("lang"),
        when(en >= es && en >= de && en >= fr, "en")
          .when(es >= de && es >= fr, "es")
          .when(de >= fr, "de")
          .otherwise("fr").as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  /** #44 token counting: whitespace + BPE-ish regex runs. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("ws_tokens"),
      TextAnalysis.bpeTokenCount(col("text")).as("bpe_tokens"))

  /** #45 document fingerprint: content hash + min-shingle-hash. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val sh = TextAnalysis.shinglesOfText(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      md5(col("text")).as("content_hash"),
      array_min(transform(sh, x => md5(x))).as("minhash_fp"))
  }

  /** #46 vector stats via aggregate/zip_with higher-order fns. */
  def embeddingStats(s: SparkSession, dir: String): DataFrame = {
    val v = Embeddings.asDouble(col("embedding"))
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      round(Embeddings.norm(v), 6).as("norm"),
      round(aggregate(v, lit(0.0), _ + _) / size(col("embedding")), 6).as("mean"),
      round(array_min(v), 6).as("vmin"),
      round(array_max(v), 6).as("vmax"))
  }

  /** #47 multimodal metadata extraction over binary media columns
    * (decode stubbed; plumbing real — see [[BinaryDocs]]). */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    BinaryDocs.extractMeta(
      BinaryDocs.toBinary(Tables.documents(s, dir), "doc_id", "text"))

  /** #164 VIDEO FRAME-DECODE metadata, oracle-gated end-to-end: each
    * doc plants a deterministic animated GIF ([[SyntheticMedia]] — the
    * #70/#79 planted-probe pattern applied to media), the REAL
    * [[VideoDecode]] path decodes every frame partition-wise, and the
    * per-doc rollup (frame count, dims, per-primary frame counts from
    * the exact solid-color channel means) is replayed ARITHMETICALLY
    * by DuckDB from doc_id — so the GIF container walk, frame order,
    * palette handling and pixel stats all sit behind an exact-hash
    * gate, not just specs. Integer-only output: no tolerance.
    *
    * Scale shape: generation stands in for the binaryFile source;
    * decode + stats are partition-wise row-local, then ONE
    * map-side-combined hash agg to the per-doc frame. */
  def videoMeta(s: SparkSession, dir: String): DataFrame =
    BinaryDocs.decodeVideo(
        SyntheticMedia.plantGifs(Tables.documents(s, dir).select(col("doc_id"))))
      .filter(col("decoded"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(col("width")).as("width"),
        max(col("height")).as("height"),
        sum(when(col("mean_r") === 255.0, 1L).otherwise(0L)).as("red_frames"),
        sum(when(col("mean_g") === 255.0, 1L).otherwise(0L)).as("green_frames"),
        sum(when(col("mean_b") === 255.0, 1L).otherwise(0L)).as("blue_frames"))

  /** #65 rule-based quality FILTER (Gopher-style): the per-document
    * heuristic gates a pretraining pipeline applies before dedup —
    * token-count floor, mean-word-length band, symbol-to-word ratio
    * cap, repeated-bigram-fraction cap. Entirely row-local (scan-stage
    * only, no shuffle), with the bigram set from the native
    * [[graft.plans.WordShingles]] codegen kernel — at 100 TB this
    * whole filter rides the first scan for free. */
  def qualityFilter(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      round(TextAnalysis.meanWordLen(toks), 6).as("mean_word_len"),
      round(TextAnalysis.symbolRatio(col("text"), toks), 6).as("symbol_ratio"),
      round(TextAnalysis.repRatio(col("text")), 6).as("rep_ratio"),
      when(TextAnalysis.qualityPass(col("text")), 1L).otherwise(0L)
        .as("quality_pass"))
  }

  /** #66 fixed-size context chunking: each document split into
    * 32-token chunks (the "pack documents into training sequences"
    * prep step). Chunk enumeration is a row-local array transform +
    * posexplode — the only row-count growth is the output itself, and
    * chunk text is reduced to a hash so the operator emits O(tokens/32)
    * small rows, not duplicated text. */
  def docChunks(s: SparkSession, dir: String): DataFrame = {
    val W = 32
    // toks materialized as a column: referenced inside the chunk lambda,
    // an expression would be re-split per chunk (quadratic in doc length)
    val toks = col("toks")
    val nChunks = ceil(size(toks).cast("double") / W).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * W + 1, lit(W)), " "))
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(chunks))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        size(split(col("col"), " ")).cast("long").as("n_chunk_tokens"),
        md5(col("col")).as("chunk_hash"))
  }

  /** #67 domain-mixture resampling to TOKEN-share targets: given a
    * target weight per source domain, derive each domain's sampling
    * rate from the measured token counts (rate = min(1, w·T/S)) and
    * keep a deterministic md5-bucketed subset — the "epoch mixture"
    * step of corpus curation. Two tiny aggregates (map-side combined)
    * broadcast back over one scan; the bucket is a uniform 16-bit
    * value from 4 md5 hex digits, so kept fractions track the computed
    * rate to 1/65536 and are bit-reproducible across engines. */
  def domainMix(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curate
    val docs = Tables.documents(s, dir).select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    Curate.mixtureResample(docs, Curate.defaultWeight, "doc_id")
      .groupBy(col("source"), col("thresh"))
      .agg(count(lit(1)).as("kept_docs"),
        sum(col("ntok")).as("kept_tokens"))
      .select(col("source"), col("thresh"), col("kept_docs"), col("kept_tokens"))
  }

  /** #68 training-sequence PACKING (budget-bin approximation): docs in
    * a deterministic order are laid into contiguous 2048-token bins
    * via one window cumulative sum; a doc starts the bin its running
    * prefix falls into. Partitioned by (source, shard) so packing
    * parallelism scales with shard count instead of serializing per
    * source — the window never sees more than one shard's rows. */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(
      col("doc_id"), col("source"),
      pmod(col("doc_id"), lit(8)).cast("long").as("shard"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    graft.operators.Curate.packBins(docs, "doc_id", 2048)
  }

  /** #69 int8 scalar QUANTIZATION of embeddings + reconstruction
    * error — the storage/serving compression step of an embedding
    * pipeline. Row-local higher-order functions only; the round is
    * floor(x+0.5) so both engines take the same half-up tie path. */
  def embeddingQuant(s: SparkSession, dir: String): DataFrame = {
    val v = Embeddings.asDouble(col("embedding"))
    val scale = greatest(array_max(transform(v, x => abs(x))), lit(1e-9)) / 127.0
    // internal column is scale_raw, NOT scale: the output alias
    // `round(...) AS scale` would otherwise shadow it via lateral
    // column alias resolution and recon_err would use the 6-digit
    // rounded scale — a real 2e-3 relative error vs the oracle
    val q = transform(v, x => floor(x / col("scale_raw") + 0.5).cast("long"))
    val err = sqrt(aggregate(
      zip_with(v, col("q"), (x, qi) => {
        val d = x - qi.cast("double") * col("scale_raw"); d * d
      }),
      lit(0.0), _ + _))
    Tables.embeddings(s, dir)
      .withColumn("scale_raw", scale)
      .withColumn("q", q)
      .select(
        col("vec_id"),
        round(col("scale_raw"), 6).as("scale"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        round(err, 6).as("recon_err"))
  }

  /** #70 PII SCRUB: regex redaction of emails and IPv4 addresses with
    * per-doc match counts. The corpus carries no PII, so — like the
    * planted near-dup probes of #36b — each doc gets deterministic
    * planted PII derived from its id, and the oracle replays the same
    * plant + scrub. Row-local regexes on the scan; no shuffle. */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val ipRe = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com from "),
      pmod(col("doc_id"), lit(256)).cast("string"), lit("."),
      pmod(col("doc_id"), lit(100)).cast("string"), lit(".0.1 today"))
    Tables.documents(s, dir)
      .withColumn("planted", planted)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("planted"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("planted"), lit(ipRe), lit(0)))
          .cast("long").as("n_ips"),
        md5(regexp_replace(
          regexp_replace(col("planted"), emailRe, "<EMAIL>"),
          ipRe, "<IP>")).as("scrubbed_hash"))
  }

  /** #72 INCREMENTAL dedup — the daily-ingest shape: a new batch
    * (every 10th doc, re-texted with a near-dup suffix) is signed and
    * matched against the full corpus's stored band index plus itself.
    * Daily cost scales with the batch, not the corpus; see
    * [[TextDedup.lshCandidatesIncremental]]. The batch construction
    * guarantees matches at any SF (each batch doc is a near-dup of
    * its corpus original). */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val batch = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" near dup probe")).as("text"))
    TextDedup.lshCandidatesIncremental(
      TextDedup.minhashSignatures(corpus, "doc_id", "text"),
      TextDedup.minhashSignatures(batch, "doc_id", "text"), "doc_id")
  }

  /** #71 the COMPLETE curation pipeline as one query — what a corpus
    * job actually runs end-to-end: quality gate → exact dedup
    * (keep-one per content hash) → domain-mixture resampling →
    * sequence packing into 2048-token bins. Each stage is the scale
    * shape proven by its standalone query: the gate rides the scan,
    * dedup is one hash shuffle, mix is two tiny broadcast aggregates,
    * packing is one sharded window. Companion of `q_dedup_pipeline`
    * (#36c) for the curation half of the surface. */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curate
    val kept0 = Tables.documents(s, dir)
      .filter(TextAnalysis.qualityPass(col("text")))
    val deduped = Curate.dedupKeepOne(kept0, "doc_id", "text")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
    val mixed = Curate.mixtureResample(deduped, Curate.defaultWeight, "doc_id")
      .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("long"))
    Curate.packBins(mixed, "doc_id", 2048)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact"         -> dedupExact _,
    "q_dedup_minhash"       -> dedupMinhash _,
    "q_dedup_minhash_pairs" -> dedupMinhashPairs _,
    "q_dedup_pipeline"      -> dedupPipeline _,
    "q_dedup_simhash"       -> dedupSimhash _,
    "q_dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "q_dedup_ngram_jaccard_capped" -> dedupNgramJaccardCapped _,
    "q_dedup_embedding"     -> dedupEmbedding _,
    "q_ann_topk"            -> annTopk _,
    "q_ann_lsh"             -> annLsh _,
    "q_text_stats"          -> textStats _,
    "q_lang_id"             -> langId _,
    "q_token_count"         -> tokenCount _,
    "q_fingerprint"         -> fingerprint _,
    "q_embedding_stats"     -> embeddingStats _,
    "q_multimodal_meta"     -> multimodalMeta _,
    "q_video_meta"          -> videoMeta _,
    "q_quality_filter"      -> qualityFilter _,
    "q_doc_chunks"          -> docChunks _,
    "q_domain_mix"          -> domainMix _,
    "q_pack_sequences"      -> packSequences _,
    "q_embedding_quant"     -> embeddingQuant _,
    "q_pii_scrub"           -> piiScrub _,
    "q_curation_pipeline"   -> curationPipeline _,
    "q_dedup_incremental"   -> dedupIncremental _,
    "q_dedup_report"        -> dedupReport _,
    "q_dedup_savings"       -> dedupSavings _,
    "q_minhash_accuracy"    -> minhashAccuracy _
  )

  /** #36e MinHash ESTIMATOR ACCURACY — the evaluation a pipeline
    * owner runs before trusting LSH thresholds: for every candidate
    * pair of the planted #36b corpus, the signature-agreement Jaccard
    * estimate (agreeing slots / k) next to the EXACT shingle Jaccard
    * and the absolute error. Signature agreement is row-local on the
    * joined pair; the exact side reuses [[TextDedup.verifyJaccard]]
    * (row-local array_intersect). Null signature slots (sub-shingle
    * docs) count as disagreement in both engines. */
  def minhashAccuracy(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val variants = base.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" near dup probe")).as("text"))
    val all = base.unionByName(variants)
    val sigs = TextDedup.minhashSignatures(all, "doc_id", "text")
    val cand = TextDedup.lshCandidates(sigs, "doc_id")
    val agree = (0 until 8).map(h =>
      when(col(s"sa.sig_$h") === col(s"sb.sig_$h"), 1).otherwise(0))
      .reduce(_ + _)
    val est = cand
      .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.as("sb").hint("shuffle_hash"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), round(agree / 8.0, 6).as("est"))
    val exact = TextDedup.verifyJaccard(cand, all, "doc_id", "text")
    est.join(exact, Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("est"), col("jaccard"),
        round(abs(col("est") - col("jaccard")), 6).as("abs_err"))
  }

  /** #36d the DEDUP REPORT — the profile an ops team reads after a
    * dedup run: cluster-size histogram of the full pipeline's output
    * (how many clusters of each size, how many documents they hold,
    * how many would be dropped). Composes the oracle-verified #36c
    * labeling with two tiny hash aggs; the histogram is at most
    * max-cluster-size rows. */
  def dedupReport(s: SparkSession, dir: String): DataFrame =
    dedupReportOf(dedupPipeline(s, dir))

  private val shingleCte =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, text, toks,
      |  CASE WHEN len(toks) >= 3
      |    THEN list_transform(range(1, len(toks) - 1),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |    ELSE CAST([] AS VARCHAR[]) END AS sh
      |  FROM t)
      |""".stripMargin

  private def simhashOracle: String = {
    val bits = (1 to 32).map { i =>
      s"""CASE WHEN list_sum(list_transform(toks, tk ->
         |  CASE WHEN substr(md5(tk), $i, 1) IN ('8','9','a','b','c','d','e','f')
         |  THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id, $bits AS simhash FROM t""".stripMargin
  }

  private val cosSql =
    """list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
      |  / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
      |     * sqrt(list_sum(list_transform(b.v, x -> x*x))))""".stripMargin

  private def cosSqlFor(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
       |  / (sqrt(list_sum(list_transform($a, x -> x*x)))
       |     * sqrt(list_sum(list_transform($b, x -> x*x))))""".stripMargin

  /** Shared by q_dedup_pipeline and q_dedup_report (which wraps it). */
  private def dedupPipelineOracle: String =
    ("""WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id,
       |  CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(1, len(toks) - 1),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |    ELSE CAST([] AS VARCHAR[]) END AS sh
       |  FROM t),
       |sig AS (SELECT doc_id, """.stripMargin +
      (0 until 8).map(h =>
        s"list_min(list_transform(sh, x -> md5('$h:' || x))) AS sig_$h").mkString(", ") +
      """ FROM s),
        |bands AS (
        |  SELECT doc_id, 0 AS band, sig_0 || '|' || sig_1 AS bucket FROM sig
        |  UNION ALL SELECT doc_id, 1, sig_2 || '|' || sig_3 FROM sig
        |  UNION ALL SELECT doc_id, 2, sig_4 || '|' || sig_5 FROM sig
        |  UNION ALL SELECT doc_id, 3, sig_6 || '|' || sig_7 FROM sig),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |shd AS (SELECT doc_id, list_distinct(sh) AS shs FROM s),
        |verified AS (
        |  SELECT doc_a, doc_b FROM cand
        |  JOIN shd sa ON sa.doc_id = doc_a
        |  JOIN shd sb ON sb.doc_id = doc_b
        |  WHERE ROUND(len(list_intersect(sa.shs, sb.shs)) /
        |    (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))), 6) >= 0.2),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM verified
        |  UNION ALL
        |  SELECT doc_b AS src, doc_a AS dst FROM verified),
        |reach(doc_id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT reach.doc_id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        |labels AS (SELECT doc_id, MIN(r) AS canonical_id FROM reach GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(l.canonical_id, d.doc_id) AS canonical_id,
        |  CAST(CASE WHEN COALESCE(l.canonical_id, d.doc_id) = d.doc_id
        |    THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id""".stripMargin)

  val oracles: Map[String, String] = Map(
    "q_minhash_accuracy" ->
      ("""WITH t0 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' near dup probe' FROM documents),
         |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM t0),
         |s AS (SELECT doc_id,
         |  CASE WHEN len(toks) >= 3
         |    THEN list_transform(range(1, len(toks) - 1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |    ELSE CAST([] AS VARCHAR[]) END AS sh
         |  FROM t),
         |sig AS (SELECT doc_id, """.stripMargin +
        (0 until 8).map(h =>
          s"list_min(list_transform(sh, x -> md5('$h:' || x))) AS sig_$h").mkString(", ") +
        """ FROM s),
          |bands AS (
          |  SELECT doc_id, 0 AS band, sig_0 || '|' || sig_1 AS bucket FROM sig
          |  UNION ALL SELECT doc_id, 1, sig_2 || '|' || sig_3 FROM sig
          |  UNION ALL SELECT doc_id, 2, sig_4 || '|' || sig_5 FROM sig
          |  UNION ALL SELECT doc_id, 3, sig_6 || '|' || sig_7 FROM sig),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bands a JOIN bands b
          |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
          |shd AS (SELECT doc_id, list_distinct(sh) AS shs FROM s),
          |j AS (
          |  SELECT doc_a, doc_b,
          |    ROUND((""".stripMargin +
        (0 until 8).map(h =>
          s"CASE WHEN sa.sig_$h = sb.sig_$h THEN 1 ELSE 0 END").mkString(" + ") +
        """) / 8.0, 6) AS est,
          |    ROUND(len(list_intersect(sa2.shs, sb2.shs)) /
          |      (len(sa2.shs) + len(sb2.shs) - len(list_intersect(sa2.shs, sb2.shs))),
          |      6) AS jaccard
          |  FROM cand
          |  JOIN sig sa ON sa.doc_id = doc_a
          |  JOIN sig sb ON sb.doc_id = doc_b
          |  JOIN shd sa2 ON sa2.doc_id = doc_a
          |  JOIN shd sb2 ON sb2.doc_id = doc_b)
          |SELECT doc_a, doc_b, est, jaccard,
          |  ROUND(ABS(est - jaccard), 6) AS abs_err
          |FROM j""".stripMargin),
    "q_dedup_savings" ->
      (s"WITH labeled AS (\n$dedupPipelineOracle\n)\n" +
        """, tok AS (SELECT doc_id,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          |  FROM documents)
          |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(CASE WHEN l.doc_id = l.canonical_id THEN 1 ELSE 0 END)
          |    AS BIGINT) AS kept_docs,
          |  CAST(SUM(t.n_tok) AS BIGINT) AS total_tokens,
          |  CAST(SUM(CASE WHEN l.doc_id = l.canonical_id THEN t.n_tok ELSE 0 END)
          |    AS BIGINT) AS kept_tokens,
          |  ROUND(1.0 - CAST(SUM(CASE WHEN l.doc_id = l.canonical_id
          |      THEN t.n_tok ELSE 0 END) AS DOUBLE) / SUM(t.n_tok), 6)
          |    AS token_savings
          |FROM labeled l JOIN tok t ON l.doc_id = t.doc_id""".stripMargin),
    "q_dedup_report" ->
      (s"WITH labeled AS (\n$dedupPipelineOracle\n)\n" +
        """, cs AS (SELECT canonical_id, COUNT(*) AS cluster_size
          |  FROM labeled GROUP BY 1)
          |SELECT cluster_size, COUNT(*) AS n_clusters,
          |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
          |  CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_dropped
          |FROM cs GROUP BY 1""".stripMargin),
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, COUNT(*) AS dup_count,
        |  MIN(doc_id) AS canonical_id
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_minhash" ->
      (shingleCte +
        "SELECT doc_id, " +
        (0 until 8).map(h =>
          s"list_min(list_transform(sh, x -> md5('$h:' || x))) AS sig_$h").mkString(", ") +
        " FROM s"),
    "q_dedup_simhash" -> simhashOracle,
    "q_dedup_minhash_pairs" ->
      ("""WITH t0 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' near dup probe' FROM documents),
         |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM t0),
         |s AS (SELECT doc_id,
         |  CASE WHEN len(toks) >= 3
         |    THEN list_transform(range(1, len(toks) - 1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |    ELSE CAST([] AS VARCHAR[]) END AS sh
         |  FROM t),
         |sig AS (SELECT doc_id, """.stripMargin +
        (0 until 8).map(h =>
          s"list_min(list_transform(sh, x -> md5('$h:' || x))) AS sig_$h").mkString(", ") +
        """ FROM s),
          |bands AS (
          |  SELECT doc_id, 0 AS band, sig_0 || '|' || sig_1 AS bucket FROM sig
          |  UNION ALL SELECT doc_id, 1, sig_2 || '|' || sig_3 FROM sig
          |  UNION ALL SELECT doc_id, 2, sig_4 || '|' || sig_5 FROM sig
          |  UNION ALL SELECT doc_id, 3, sig_6 || '|' || sig_7 FROM sig)
          |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |FROM bands a JOIN bands b
          |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin),
    "q_dedup_pipeline" ->
      ("""WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  CASE WHEN len(toks) >= 3
         |    THEN list_transform(range(1, len(toks) - 1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |    ELSE CAST([] AS VARCHAR[]) END AS sh
         |  FROM t),
         |sig AS (SELECT doc_id, """.stripMargin +
        (0 until 8).map(h =>
          s"list_min(list_transform(sh, x -> md5('$h:' || x))) AS sig_$h").mkString(", ") +
        """ FROM s),
          |bands AS (
          |  SELECT doc_id, 0 AS band, sig_0 || '|' || sig_1 AS bucket FROM sig
          |  UNION ALL SELECT doc_id, 1, sig_2 || '|' || sig_3 FROM sig
          |  UNION ALL SELECT doc_id, 2, sig_4 || '|' || sig_5 FROM sig
          |  UNION ALL SELECT doc_id, 3, sig_6 || '|' || sig_7 FROM sig),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bands a JOIN bands b
          |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
          |shd AS (SELECT doc_id, list_distinct(sh) AS shs FROM s),
          |verified AS (
          |  SELECT doc_a, doc_b FROM cand
          |  JOIN shd sa ON sa.doc_id = doc_a
          |  JOIN shd sb ON sb.doc_id = doc_b
          |  WHERE ROUND(len(list_intersect(sa.shs, sb.shs)) /
          |    (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))), 6) >= 0.2),
          |edges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM verified
          |  UNION ALL
          |  SELECT doc_b AS src, doc_a AS dst FROM verified),
          |reach(doc_id, r) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT reach.doc_id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
          |labels AS (SELECT doc_id, MIN(r) AS canonical_id FROM reach GROUP BY 1)
          |SELECT d.doc_id,
          |  COALESCE(l.canonical_id, d.doc_id) AS canonical_id,
          |  CAST(CASE WHEN COALESCE(l.canonical_id, d.doc_id) = d.doc_id
          |    THEN 1 ELSE 0 END AS INTEGER) AS keep
          |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id""".stripMargin),
    "q_dedup_ngram_jaccard_capped" ->
      (shingleCte +
        """, ex AS (SELECT DISTINCT doc_id, unnest(sh) AS sh FROM s),
          |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY 1),
          |dfok AS (SELECT sh FROM ex GROUP BY sh HAVING COUNT(*) <= 4),
          |exc AS (SELECT ex.doc_id, ex.sh FROM ex JOIN dfok USING (sh)),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          |  FROM exc a JOIN exc b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT doc_a, doc_b, inter,
          |  ROUND(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
          |FROM inter
          |JOIN sizes sa ON sa.doc_id = doc_a
          |JOIN sizes sb ON sb.doc_id = doc_b
          |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin),
    "q_dedup_ngram_jaccard" ->
      (shingleCte +
        """, ex AS (SELECT DISTINCT doc_id, unnest(sh) AS sh FROM s),
          |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY 1),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT doc_a, doc_b, inter,
          |  ROUND(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
          |FROM inter
          |JOIN sizes sa ON sa.doc_id = doc_a
          |JOIN sizes sb ON sb.doc_id = doc_b
          |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin),
    "q_dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id, ROUND($cosSql, 6) AS cos
         |FROM e a, e b
         |WHERE a.vec_id < 50 AND a.vec_id < b.vec_id
         |ORDER BY cos DESC, a_id, b_id LIMIT 30""".stripMargin,
    "q_ann_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |scored AS (
         |  SELECT a.vec_id AS q_id, b.vec_id AS n_id, ROUND($cosSql, 6) AS cos
         |  FROM e a, e b WHERE a.vec_id < 5 AND a.vec_id <> b.vec_id)
         |SELECT q_id,
         |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank,
         |  n_id, cos
         |FROM scored
         |QUALIFY rank <= 5""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v,
         |  (CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END) ||
         |  (CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END) ||
         |  (CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END) ||
         |  (CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END) AS bucket
         |FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 5),
         |probes AS (
         |  SELECT q_id, qv, bucket AS probe FROM q
         |  UNION ALL SELECT q_id, qv,
         |    (CASE WHEN substr(bucket,1,1)='1' THEN '0' ELSE '1' END) || substr(bucket,2) FROM q
         |  UNION ALL SELECT q_id, qv,
         |    substr(bucket,1,1) || (CASE WHEN substr(bucket,2,1)='1' THEN '0' ELSE '1' END) || substr(bucket,3) FROM q
         |  UNION ALL SELECT q_id, qv,
         |    substr(bucket,1,2) || (CASE WHEN substr(bucket,3,1)='1' THEN '0' ELSE '1' END) || substr(bucket,4) FROM q
         |  UNION ALL SELECT q_id, qv,
         |    substr(bucket,1,3) || (CASE WHEN substr(bucket,4,1)='1' THEN '0' ELSE '1' END) FROM q),
         |scored AS (
         |  SELECT p.q_id, c.vec_id AS n_id,
         |    ROUND(${cosSqlFor("p.qv", "c.v")}, 6) AS cos
         |  FROM probes p JOIN b c ON c.bucket = p.probe AND c.vec_id <> p.q_id)
         |SELECT q_id,
         |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank,
         |  n_id, cos
         |FROM scored
         |QUALIFY rank <= 3""".stripMargin,
    "q_text_stats" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, text, toks,
        |  len(list_filter(toks, tk -> tk IN ('the','a','of','to','and','in','is','it','on','for'))) AS stop_cnt
        |  FROM t)
        |SELECT doc_id, len(toks) AS n_tokens,
        |  LENGTH(text) AS n_chars_measured, stop_cnt,
        |  ROUND(stop_cnt / len(toks), 6) AS stop_ratio,
        |  CASE WHEN len(toks) >= 20 AND stop_cnt / len(toks) > 0.02
        |    THEN 1 ELSE 0 END AS quality_pass
        |FROM c""".stripMargin,
    "q_lang_id" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
        |sc AS (SELECT lang,
        |  len(list_filter(toks, tk -> tk IN ('the','is','and','of','to'))) AS s_en,
        |  len(list_filter(toks, tk -> tk IN ('el','la','de','que','los'))) AS s_es,
        |  len(list_filter(toks, tk -> tk IN ('der','die','das','und','ist'))) AS s_de,
        |  len(list_filter(toks, tk -> tk IN ('le','les','des','est','une'))) AS s_fr
        |  FROM t)
        |SELECT lang,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de'
        |       ELSE 'fr' END AS predicted,
        |  COUNT(*) AS n
        |FROM sc GROUP BY 1, 2""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens
        |FROM documents""".stripMargin,
    "q_fingerprint" ->
      (shingleCte +
        """SELECT doc_id, md5(text) AS content_hash,
          |  list_min(list_transform(sh, x -> md5(x))) AS minhash_fp
          |FROM s""".stripMargin),
    "q_embedding_stats" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT vec_id, len(v) AS dim,
        |  ROUND(sqrt(list_sum(list_transform(v, x -> x*x))), 6) AS norm,
        |  ROUND(list_sum(v) / len(v), 6) AS mean,
        |  ROUND(list_min(v), 6) AS vmin,
        |  ROUND(list_max(v), 6) AS vmax
        |FROM e""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  lower(substr(hex(encode(text)), 1, 8)) AS magic_hex,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height
        |FROM documents""".stripMargin,
    // arithmetic replay of the planted GIFs: frame i of doc d is solid
    // primary (d+i)%3, dims (4+d%5)×(3+d%4), 1+d%3 frames — if the
    // Spark side's REAL decode disagrees anywhere, the hash gate fails
    "q_video_meta" ->
      """WITH f AS (SELECT doc_id, 1 + doc_id % 3 AS nf, 4 + doc_id % 5 AS w,
        |    3 + doc_id % 4 AS h FROM documents),
        |fr AS (SELECT doc_id, w, h, unnest(range(nf)) AS i FROM f)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(MAX(w) AS BIGINT) AS width, CAST(MAX(h) AS BIGINT) AS height,
        |  CAST(SUM(CASE WHEN (doc_id + i) % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS red_frames,
        |  CAST(SUM(CASE WHEN (doc_id + i) % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS green_frames,
        |  CAST(SUM(CASE WHEN (doc_id + i) % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS blue_frames
        |FROM fr GROUP BY doc_id""".stripMargin,
    "q_quality_filter" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, len(toks) AS n,
        |  CAST(list_sum(list_transform(toks, tk -> CAST(len(tk) AS BIGINT)))
        |    AS DOUBLE) / len(toks) AS mean_wl,
        |  CAST(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
        |    / len(toks) AS sym_ratio,
        |  CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)),
        |           i -> toks[i] || ' ' || toks[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END AS bi
        |  FROM t),
        |r AS (SELECT doc_id, n, mean_wl, sym_ratio,
        |  CASE WHEN len(bi) > 0
        |    THEN 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi)
        |    ELSE 0.0 END AS rep_ratio
        |  FROM c)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  ROUND(mean_wl, 6) AS mean_word_len,
        |  ROUND(sym_ratio, 6) AS symbol_ratio,
        |  ROUND(rep_ratio, 6) AS rep_ratio,
        |  CAST(CASE WHEN n >= 10 AND mean_wl >= 3.0 AND mean_wl <= 10.0
        |    AND sym_ratio <= 0.1 AND rep_ratio <= 0.5
        |    THEN 1 ELSE 0 END AS BIGINT) AS quality_pass
        |FROM r""".stripMargin,
    "q_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |  unnest(range(0, CAST(ceil(len(toks) / 32.0) AS BIGINT))) AS chunk_idx
        |  FROM t),
        |x AS (SELECT doc_id, chunk_idx,
        |  array_to_string(toks[(chunk_idx*32 + 1):((chunk_idx+1)*32)], ' ') AS chunk_text
        |  FROM c)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  len(string_split(chunk_text, ' ')) AS n_chunk_tokens,
        |  md5(chunk_text) AS chunk_hash
        |FROM x""".stripMargin,
    "q_domain_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok FROM documents),
        |s AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS src_tokens FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total FROM s),
        |r AS (SELECT source,
        |  CAST(floor(least(1.0,
        |    CAST(CASE source WHEN 'src0' THEN 0.20 WHEN 'src1' THEN 0.04
        |      WHEN 'src2' THEN 0.025 ELSE 0.015 END AS DOUBLE)
        |    * CAST(t.total AS DOUBLE) / CAST(src_tokens AS DOUBLE)) * 65536)
        |    AS BIGINT) AS thresh
        |  FROM s, t),
        |k AS (SELECT d.source, r.thresh, d.ntok,
        |  (strpos('0123456789abcdef',
        |     substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef',
        |     substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 2, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef',
        |     substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 3, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef',
        |     substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 4, 1)) - 1) AS bucket
        |  FROM d JOIN r ON d.source = r.source)
        |SELECT source, thresh, COUNT(*) AS kept_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS kept_tokens
        |FROM k WHERE bucket < thresh GROUP BY 1, 2""".stripMargin,
    "q_pack_sequences" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(doc_id % 8 AS BIGINT) AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok FROM documents),
        |c AS (SELECT doc_id, source, shard, ntok,
        |  SUM(ntok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT source, shard,
        |  CAST(floor((cum - ntok) / 2048.0) AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS bin_tokens,
        |  ROUND(CAST(SUM(ntok) AS DOUBLE) / 2048, 6) AS fill_ratio
        |FROM c GROUP BY 1, 2, 3""".stripMargin,
    "q_embedding_quant" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |  greatest(list_max(list_transform(v, x -> abs(x))), 1e-9) / 127.0 AS scale
        |  FROM e),
        |q AS (SELECT vec_id, v, scale,
        |  list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
        |  FROM s)
        |SELECT vec_id, ROUND(scale, 6) AS scale,
        |  list_min(qv) AS q_min, list_max(qv) AS q_max,
        |  ROUND(sqrt(list_sum(list_transform(range(1, len(v) + 1),
        |    i -> (v[i] - qv[i] * scale) * (v[i] - qv[i] * scale)))), 6) AS recon_err
        |FROM q""".stripMargin,
    "q_pii_scrub" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com from ' || CAST(doc_id % 256 AS VARCHAR)
        |    || '.' || CAST(doc_id % 100 AS VARCHAR) || '.0.1 today' AS planted
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(planted,
        |    '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(planted,
        |    '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(
        |    regexp_replace(planted, '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g')) AS scrubbed_hash
        |FROM p""".stripMargin,
    "q_curation_pipeline" ->
      """WITH g AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM documents),
        |f AS (
        |  SELECT doc_id, source, text FROM g
        |  WHERE len(toks) >= 10
        |    AND CAST(list_sum(list_transform(toks, tk -> CAST(len(tk) AS BIGINT)))
        |      AS DOUBLE) / len(toks) BETWEEN 3.0 AND 10.0
        |    AND CAST(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
        |      / len(toks) <= 0.1
        |    AND (CASE WHEN len(toks) >= 2
        |      THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)),
        |             i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
        |           / (len(toks) - 1)
        |      ELSE 0.0 END) <= 0.5),
        |dd AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM (SELECT doc_id, source, text,
        |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM f)
        |  WHERE rn = 1),
        |s AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS src_tokens FROM dd GROUP BY 1),
        |t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total FROM s),
        |r AS (SELECT source,
        |  CAST(floor(least(1.0,
        |    CAST(CASE source WHEN 'src0' THEN 0.20 WHEN 'src1' THEN 0.04
        |      WHEN 'src2' THEN 0.025 ELSE 0.015 END AS DOUBLE)
        |    * CAST(t.total AS DOUBLE) / CAST(src_tokens AS DOUBLE)) * 65536)
        |    AS BIGINT) AS thresh
        |  FROM s, t),
        |k AS (SELECT dd.doc_id, dd.source, dd.ntok,
        |  CAST(dd.doc_id % 8 AS BIGINT) AS shard
        |  FROM dd JOIN r ON dd.source = r.source
        |  WHERE (strpos('0123456789abcdef',
        |      substr(md5(CAST(dd.doc_id AS VARCHAR) || ':mix'), 1, 1)) - 1) * 4096
        |    + (strpos('0123456789abcdef',
        |      substr(md5(CAST(dd.doc_id AS VARCHAR) || ':mix'), 2, 1)) - 1) * 256
        |    + (strpos('0123456789abcdef',
        |      substr(md5(CAST(dd.doc_id AS VARCHAR) || ':mix'), 3, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef',
        |      substr(md5(CAST(dd.doc_id AS VARCHAR) || ':mix'), 4, 1)) - 1) < r.thresh),
        |c AS (SELECT source, shard, ntok,
        |  SUM(ntok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM k)
        |SELECT source, shard,
        |  CAST(floor((cum - ntok) / 2048.0) AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS bin_tokens,
        |  ROUND(CAST(SUM(ntok) AS DOUBLE) / 2048, 6) AS fill_ratio
        |FROM c GROUP BY 1, 2, 3""".stripMargin,
    "q_dedup_incremental" ->
      ("""WITH corpus AS (SELECT doc_id, text FROM documents),
         |batch AS (
         |  SELECT doc_id + 1000000 AS doc_id, text || ' near dup probe' AS text
         |  FROM documents WHERE doc_id % 10 = 0),
         |tc AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
         |scp AS (SELECT doc_id,
         |  CASE WHEN len(toks) >= 3
         |    THEN list_transform(range(1, len(toks) - 1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |    ELSE CAST([] AS VARCHAR[]) END AS sh
         |  FROM tc),
         |tn AS (SELECT doc_id, string_split(text, ' ') AS toks FROM batch),
         |snw AS (SELECT doc_id,
         |  CASE WHEN len(toks) >= 3
         |    THEN list_transform(range(1, len(toks) - 1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |    ELSE CAST([] AS VARCHAR[]) END AS sh
         |  FROM tn),
         |sigc AS (SELECT doc_id, """.stripMargin +
        (0 until 8).map(h =>
          s"list_min(list_transform(sh, x -> md5('$h:' || x))) AS sig_$h").mkString(", ") +
        " FROM scp),\nsign AS (SELECT doc_id, " +
        (0 until 8).map(h =>
          s"list_min(list_transform(sh, x -> md5('$h:' || x))) AS sig_$h").mkString(", ") +
        """ FROM snw),
          |bandc AS (
          |  SELECT doc_id, 0 AS band, sig_0 || '|' || sig_1 AS bucket FROM sigc
          |  UNION ALL SELECT doc_id, 1, sig_2 || '|' || sig_3 FROM sigc
          |  UNION ALL SELECT doc_id, 2, sig_4 || '|' || sig_5 FROM sigc
          |  UNION ALL SELECT doc_id, 3, sig_6 || '|' || sig_7 FROM sigc),
          |bandn AS (
          |  SELECT doc_id, 0 AS band, sig_0 || '|' || sig_1 AS bucket FROM sign
          |  UNION ALL SELECT doc_id, 1, sig_2 || '|' || sig_3 FROM sign
          |  UNION ALL SELECT doc_id, 2, sig_4 || '|' || sig_5 FROM sign
          |  UNION ALL SELECT doc_id, 3, sig_6 || '|' || sig_7 FROM sign)
          |SELECT DISTINCT new_id, match_id FROM (
          |  SELECT n.doc_id AS new_id, i.doc_id AS match_id
          |  FROM bandn n JOIN bandc i
          |    ON n.band = i.band AND n.bucket = i.bucket
          |  UNION ALL
          |  SELECT b.doc_id, a.doc_id
          |  FROM bandn a JOIN bandn b
          |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)""".stripMargin)
  )
}
