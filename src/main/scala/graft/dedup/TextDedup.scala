package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Document deduplication: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard.
  *
  * Scale design: signatures (MinHash, SimHash) are computed ROW-LOCALLY
  * with higher-order array functions — they never shuffle; only the
  * tiny (doc_id, signature) frame moves. Candidate generation is
  * bucket-local (LSH bands / shared-shingle inverted index), never an
  * all-pairs cross join.
  */
object TextDedup {

  /** Default document-frequency cap for [[jaccardPairs]] candidate
    * generation — bounds the inverted-index self-join at maxDf² pairs
    * per shingle. */
  val DefaultMaxDf = 100

  /** Exact dedup via content hash: one group per distinct text
    * (hash-groupBy — the baseline dedup at any scale). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(md5(col(textCol)).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("canonical_id"))

  /** MinHash signature matrix: k salted-md5 min-hashes over word
    * 3-gram shingles. md5 with a per-permutation salt is a public,
    * engine-portable stand-in for a universal hash family. Native
    * one-pass kernel ([[graft.plans.MinHashSigs]]).
    */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String, k: Int = 8,
      carry: Seq[String] = Seq.empty): DataFrame = {
    val sigs = graft.plans.MinHashSigs(col(textCol), k)
    docs.select((col(idCol) +: carry.map(col)) ++
      (0 until k).map(h => element_at(sigs, h + 1).as(s"sig_$h")): _*)
  }

  /** Higher-order reference implementation of [[minhashSignatures]]
    * (bit-equal; kept for parity testing). */
  def minhashSignaturesHof(
      docs: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val sh = TextAnalysis.shinglesOfText(col(textCol))
    val sigs = (0 until k).map { h =>
      array_min(transform(sh, s => md5(concat(lit(s"$h:"), s)))).as(s"sig_$h")
    }
    docs.select((col(idCol) +: sigs): _*)
  }

  /** LSH candidate pairs: band the signature matrix, bucket by band
    * value, self-join bucket-locally. With k=8, bands of rows=2 →
    * 4 bands. Returns distinct (a, b) candidate pairs, a < b. */
  /** Band keys of a signature frame: ONE pass, exploding a band
    * array — NOT a union of per-band selects, which would recompute
    * the signature subplan once per band per join side. concat is
    * null-PROPAGATING (unlike concat_ws): a doc too short to shingle
    * has null signature slots and must not collide with other
    * null-signature docs — DuckDB `||` propagates null the same way. */
  def bandKeys(sigs: DataFrame, idCol: String, k: Int = 8, rowsPerBand: Int = 2,
      carry: Seq[String] = Seq.empty): DataFrame = {
    // a remainder would silently drop the trailing signature columns
    // from every band — the caller would run lower-k LSH (less
    // recall) with no error
    require(k % rowsPerBand == 0,
      s"k ($k) must be a multiple of rowsPerBand ($rowsPerBand)")
    val bandStructs = (0 until k / rowsPerBand).map { b =>
      val key = concat(
        (0 until rowsPerBand).flatMap(r =>
          Seq(lit("|"), col(s"sig_${b * rowsPerBand + r}"))).drop(1): _*)
      struct(lit(b).as("band"), key.as("bucket"))
    }
    // `carry` rides along row-locally (streaming callers thread the
    // event-time and shingle columns through the explode)
    sigs
      .select(col(idCol) +: carry.map(col) :+
        explode(array(bandStructs: _*)).as("bb"): _*)
      .select(col(idCol) +: carry.map(col) :+
        col("bb.band").as("band") :+ col("bb.bucket").as("bucket"): _*)
  }

  def lshCandidates(sigs: DataFrame, idCol: String, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val bands = bandKeys(sigs, idCol, k, rowsPerBand)
    // SHUFFLE_HASH, not broadcast: a band index is corpus-sized at
    // scale; identical shuffled subplans also let the planner reuse
    // one exchange for both sides of the self-join
    val l = bands.as("l"); val r = bands.as("r").hint("shuffle_hash")
    l.join(r,
        col(s"l.band") === col(s"r.band") && col(s"l.bucket") === col(s"r.bucket") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("doc_a"), col(s"r.$idCol").as("doc_b"))
      .distinct()
  }

  /** INCREMENTAL LSH dedup: candidate matches of a NEW ingest batch
    * against an already-signed corpus index, plus within-batch pairs.
    * This is the production shape at 100 TB — the corpus band index
    * is computed once and stored (it's just [[bandKeys]] of the stored
    * signatures); a daily batch signs only itself and runs two
    * bucket-local joins, so daily cost scales with the batch, not the
    * corpus. The corpus side stays SHUFFLE_HASH (never broadcast);
    * the batch side is the small probe side of both joins. Returns
    * distinct (new_id, match_id) with match_id from the corpus or a
    * smaller-id batch doc. */
  def lshCandidatesIncremental(
      indexSigs: DataFrame, newSigs: DataFrame, idCol: String,
      k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val idx = bandKeys(indexSigs, idCol, k, rowsPerBand)
    val nw  = bandKeys(newSigs, idCol, k, rowsPerBand)
    val vsCorpus = nw.as("n")
      .join(idx.as("i").hint("shuffle_hash"),
        col("n.band") === col("i.band") && col("n.bucket") === col("i.bucket") &&
          col(s"n.$idCol") =!= col(s"i.$idCol")) // a batch doc already indexed must not self-match
      .select(col(s"n.$idCol").as("new_id"), col(s"i.$idCol").as("match_id"))
    // within-batch pairs keep the SMALLER id as match_id (the
    // dedupKeepOne lowest-id-wins convention; the larger id is the
    // "new" duplicate a downstream keep-filter drops)
    val within = nw.as("a")
      .join(nw.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"b.$idCol").as("new_id"), col(s"a.$idCol").as("match_id"))
    vsCorpus.unionByName(within).distinct()
  }

  /** Exact Jaccard VERIFICATION of candidate pairs: joins each
    * (doc_a, doc_b) with both documents' distinct shingle sets and
    * computes the exact similarity ROW-LOCALLY (array_intersect on
    * the two arrays — no shingle explosion, no extra aggregation).
    * This is the verify step after LSH candidate generation: the
    * candidate set is tiny relative to the corpus, so two hash joins
    * against the (doc_id, shingles) frame is the whole cost. */
  def verifyJaccard(
      pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // sets are 64-bit shingle hashes (Broder shingling): the
    // intersect is a type-specialized long-array op and the join
    // ships ~4× fewer bytes than string sets; a cross-doc collision
    // (p ≈ 2⁻⁴⁸ corpus-wide) could perturb one count by 1 — the
    // string-exact DuckDB oracles stay the gate
    verifyJaccardSets(pairs,
      docs.select(col(idCol).as("__id"),
        array_distinct(transform(TextAnalysis.shinglesOfText(col(textCol)),
          s => xxhash64(s))).as("__shs")))

  /** [[verifyJaccard]] against a PRECOMPUTED (__id, __shs) shingle-set
    * frame — callers that already materialized the projection (the
    * prefix-filter path) avoid re-running the shingle kernel for each
    * join side. The intersect is evaluated ONCE per pair (named
    * column), not re-derived in the denominator. */
  def verifyJaccardSets(pairs: DataFrame, sh: DataFrame): DataFrame =
    // SHUFFLE_HASH: the shingle-set frame is corpus-sized — never
    // broadcast-size at scale (same rule as the pair-join sides)
    pairs
      .join(sh.withColumnRenamed("__id", "doc_a").withColumnRenamed("__shs", "sa")
        .hint("shuffle_hash"), Seq("doc_a"))
      .join(sh.withColumnRenamed("__id", "doc_b").withColumnRenamed("__shs", "sb")
        .hint("shuffle_hash"), Seq("doc_b"))
      .withColumn("__inter", size(array_intersect(col("sa"), col("sb"))))
      .select(col("doc_a"), col("doc_b"),
        round(col("__inter") /
          (size(col("sa")) + size(col("sb")) - col("__inter")), 6).as("jaccard"))

  /** 32-bit SimHash from md5-nibble bit votes over tokens (term
    * frequency weighting falls out of voting per occurrence).
    * Row-local; native one-digest-per-token kernel
    * ([[graft.plans.SimHashBits]]). */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame =
    docs.select(col(idCol), graft.plans.SimHashBits(col(textCol), bits).as("simhash"))

  /** Higher-order reference implementation of [[simhash]] (bit-equal;
    * evaluates md5 once per bit per token — kept for parity testing). */
  def simhashHof(docs: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f").map(lit(_))
    val bitCols = (1 to bits).map { i =>
      val vote = aggregate(
        toks,
        lit(0),
        (acc, t) => acc + when(substring(md5(t), i, 1).isin(hi: _*), 1).otherwise(-1))
      when(vote > 0, "1").otherwise("0")
    }
    docs.select(col(idCol), concat(bitCols: _*).as("simhash"))
  }

  /** n-gram Jaccard similarity for candidate pairs that share at least
    * one shingle (inverted-index join — pair generation is
    * shingle-local, not all-pairs).
    *
    * @param maxDf document-frequency cap: shingles appearing in more
    *              than `maxDf` docs are dropped BEFORE the self-join,
    *              which affects BOTH candidate generation and the
    *              intersection count (denominator sizes stay full
    *              per-doc) — a pair sharing capped shingles scores
    *              LOWER than its true Jaccard, by design the price of
    *              the capped plan (the capped oracle replays the same
    *              cap; exact callers pass `None`). A shingle shared
    *              by m docs contributes
    *              O(m²) pairs — at corpus scale a handful of stop-
    *              shingles would otherwise dominate the join; capping
    *              df bounds the blowup at maxDf² per shingle. ON by
    *              default ([[DefaultMaxDf]]) — the uncapped plan is a
    *              scale hazard a caller must opt into with `None`
    *              (exact semantics, used by the exact-oracle entries).
    */
  def jaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame = {
    // per-doc dedup and size are ROW-LOCAL (array_distinct + size on
    // the shingle array) — no global distinct shuffle, no window; the
    // only exchanges left are the inverted-index join on `sh` and the
    // pair aggregation
    val shAll = docs
      .select(col(idCol), array_distinct(TextAnalysis.shinglesOfText(col(textCol))).as("shs"))
      .select(col(idCol), size(col("shs")).cast("long").as("sz"), explode(col("shs")).as("sh"))
    val sh = maxDf match {
      case Some(cap) =>
        // df via groupBy (map-side partial agg — a stop-shingle's count
        // combines before the shuffle, so the df computation itself
        // doesn't skew the way a count-over-window partitioned by `sh`
        // would), then an inner join against the SURVIVING shingles
        // only: capped-out keys vanish from the join's build side
        val dfOk = shAll.groupBy(col("sh"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap)
        shAll.join(dfOk.hint("shuffle_hash"), "sh").drop("__df")
      case None => shAll
    }
    // SHUFFLE_HASH (not broadcast): a shingle index is never broadcast-
    // size at scale; identical shuffled subplans also let the planner
    // reuse one exchange for both sides
    sh.as("a")
      .join(sh.as("b").hint("shuffle_hash"),
        col("a.sh") === col("b.sh") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("inter"), max(col("a.sz")).as("sz_a"), max(col("b.sz")).as("sz_b"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
  }

  /** EXACT Jaccard-threshold pairs via PREFIX FILTERING (Bayardo et
    * al. 2007 "Scaling Up All Pairs Similarity Search"; the SSJoin
    * prefix-filter principle): each doc's shingle set is sorted by a
    * GLOBAL (df, shingle) order and only its first
    * |A| − ⌈t·|A|⌉ + 1 shingles are indexed — two sets with
    * Jaccard ≥ t MUST share an element inside their prefixes under a
    * common order, so the prefix index is provably COMPLETE.
    * Candidates are verified with the exact row-local Jaccard.
    *
    * Unlike the df-cap ([[jaccardPairs]] default), this is exact at
    * any threshold: completeness is a theorem, not a trade. The
    * rarest-first order also makes the index skew-FREE by
    * construction — a stop-shingle sorts last and lands in almost no
    * prefix, so the hot keys that force the cap in the plain inverted
    * index never reach this join. Shapes: one df agg + join-back
    * (SHUFFLE_HASH, exchange reuse), per-doc sort is row-local, the
    * pair join carries only prefix entries.
    *
    * Candidates are pruned BEFORE the (array-carrying, so expensive)
    * verify join by the two standard sound filters:
    *  - SIZE filter: Jaccard ≥ t forces t·|B| ≤ |A| ≤ |B|/t — a
    *    cheap int predicate inside the pair join;
    *  - ACCUMULATED POSITIONAL filter (PPJoin, Xiao et al. 2008, in
    *    its per-pair accumulated form): both lists share ONE global
    *    sort order, so (a) every common element ≤ the LAST
    *    prefix-prefix match is itself a prefix-prefix match — the
    *    per-pair match count `o_p` counts the early overlap EXACTLY —
    *    and (b) every other common element lies strictly after that
    *    last match in BOTH lists, so the tail contributes at most
    *    min(|A|−pa_last, |B|−pb_last). A qualifying pair needs
    *    overlap ≥ ⌈t/(1+t)·(|A|+|B|)⌉ against the bound
    *    o_p + min(|A|−pa_last, |B|−pb_last) — provably ≤ the
    *    first-match row bound 1 + min(|A|−pa₁, |B|−pb₁) (positions
    *    strictly increase, so |A|−pa_last ≤ |A|−pa₁−o_p+1), i.e.
    *    strictly tighter whenever a pair shares >1 prefix element.
    *    The aggregation rides the same exchange the old
    *    keep-if-any-row `distinct` already paid (count/max are
    *    map-side combinable).
    * PPJoin+'s recursive SUFFIX probe is deliberately NOT here: it
    * needs both suffix arrays co-located per candidate, which
    * re-introduces the array shuffle this pre-filter exists to
    * avoid — the accumulated bound rides the existing exchange for
    * free. Measured at sf0.1, t = 0.6 (the gate's config): 193,148
    * prefix-join pairs → 66,259 verified (the first-match row form
    * kept 68,594), identical output. */
  def prefixFilterPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    // the shingle kernel is the dominant row-local cost and THREE
    // consumers need its output (the index path and both verify join
    // sides): stage the (id, shingles) projection once instead of
    // recomputing it from the text per consumer — the compute-side
    // analogue of writing the projection to a staging table
    // the whole pipeline moves 64-BIT SHINGLE HASHES, never shingle
    // text (Broder's shingles ARE hashes; xxhash64 here): the index
    // path compares longs, and verify intersects long arrays — ~4×
    // less shuffle volume and a type-specialized intersect vs string
    // sets. A cross-doc collision (p ≈ 2⁻⁴⁸ corpus-wide) could
    // perturb one overlap count by 1; the string-exact DuckDB oracle
    // gate would flag it.
    // persist, NOT localCheckpoint: the cached blocks are a
    // best-effort compute-once (evicted or executor-lost blocks
    // recompute from lineage), where a checkpoint's unreplicated
    // blocks would fail the whole job on one executor loss
    val base = docs.select(col(idCol).as("__id"),
      array_distinct(transform(TextAnalysis.shinglesOfText(col(textCol)),
        s => xxhash64(s))).as("__shs"))
      .persist()
    val ex = base.select(col("__id"), explode(col("__shs")).as("h"))
    val dfTab = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val ordered = ex.join(dfTab.hint("shuffle_hash"), "h")
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"))
    val n = size(col("ord"))
    val prefixLen = (n - ceil(lit(threshold) * n) + 1).cast("int")
    // prefix entries carry (set size, 1-based position) for the filters
    val prefix = ordered.select(col("__id"), n.as("n"),
      posexplode(transform(slice(col("ord"), lit(1), prefixLen),
        s => s.getField("h"))))
      .select(col("__id"), col("n"), (col("pos") + 1).as("p"), col("col").as("h"))
    // one row per matched prefix entry; the pair-level aggregation
    // BELOW subsumes the old per-row positional test (no row may be
    // dropped here — it would undercount o_p and break soundness)
    val cand = prefix.as("a")
      .join(prefix.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.__id") < col("b.__id") &&
          col("a.n") >= ceil(lit(threshold) * col("b.n")) &&
          col("b.n") >= ceil(lit(threshold) * col("a.n")))
      .groupBy(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .agg(count(lit(1)).as("o_p"),
        max(col("a.p")).as("pa_last"), max(col("b.p")).as("pb_last"),
        max(col("a.n")).as("n_a"), max(col("b.n")).as("n_b"))
      // (pa_last, pb_last) belong to the SAME element: prefix matches
      // appear in the same relative order in both lists (one global
      // order), so the per-column max picks one element's positions
      .filter(col("o_p") +
        least(col("n_a") - col("pa_last"), col("n_b") - col("pb_last"))
        >= ceil(lit(threshold / (1 + threshold)) * (col("n_a") + col("n_b"))))
      .select(col("doc_a"), col("doc_b"))
    verifyJaccardSets(cand, base)
      .filter(col("jaccard") >= threshold)
  }
}
