package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.LshIndex
import graft.similarity.{Embeddings, VectorIndex}
import graft.sources.Tables

/** Stored-vector-index queries (SURVEY §2 #168-169): IVF search over
  * the persisted [[VectorIndex]] artifacts, and the recall report for
  * TRAINED (multi-round Lloyd) centroids against the label-seeded
  * baseline — the two operators that close the r4 verdict's "the
  * vector index recomputes per run" gap.
  */
object Indexing {

  /** Shared DuckDB Lloyd chain: `rounds` k-means iterations starting
    * from a `c0(cid, cv)` CTE over `e(vec_id, v)` — the SQL replay of
    * [[Embeddings.lloyd]] (assignment score rounded 6dp, tie-break
    * lowest cid, means rounded 6dp per round, so the two engines
    * re-sync at every iteration boundary). */
  private def lloydChain(rounds: Int): String = (1 to rounds).map { r =>
    s"""s$r AS (
       |  SELECT e.vec_id, e.v, c.cid,
       |    ROUND(list_sum(list_transform(range(1, 65), i -> e.v[i] * c.cv[i]))
       |      / (sqrt(list_sum(list_transform(e.v, y -> y*y)))
       |         * sqrt(list_sum(list_transform(c.cv, y -> y*y)))), 6) AS ccos
       |  FROM e, c${r - 1} c),
       |a$r AS (SELECT vec_id, v, cid FROM s$r
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
       |x$r AS (SELECT cid, CAST(i AS BIGINT) AS dim, v[i] AS val
       |  FROM a$r, UNNEST(range(1, 65)) AS t(i)),
       |g$r AS (SELECT cid, dim, ROUND(AVG(val), 6) AS centroid FROM x$r GROUP BY 1, 2),
       |c$r AS (SELECT cid, list(centroid ORDER BY dim) AS cv FROM g$r GROUP BY 1)""".stripMargin
  }.mkString(",\n")

  /** #168 IVF ANN over the STORED index ([[VectorIndex]]): builds the
    * index once per corpus (idempotent — keyed on a content
    * fingerprint, a retried run never retrains), then answers the
    * query purely from the persisted artifacts: centroids load from
    * their KB-scale snapshot and the assignments scan is pruned to
    * the probed `bucket=` partition directories. Same search
    * semantics as `q_ann_ivf` but with TRAINED centroids (2 Lloyd
    * rounds from id-seeds) and per-query cost that is
    * probe-bucket-sized instead of retrain-the-quantizer-sized. */
  def annIvfStored(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val vecs = raw.select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
    val root = VectorIndex.defaultRoot(raw, seedK = 8, iters = 2)
    VectorIndex.buildIfAbsent(vecs, root, seedK = 8, iters = 2)
    val queries = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    VectorIndex.ivfTopKStored(s, root, queries, k = 3, nprobe = 2)
  }

  /** #169 recall@3 of IVF with TRAINED centroids (5 Lloyd rounds
    * seeded from the per-label means) — the trained counterpart of
    * `q_ivf_recall`'s label-seeded report, demonstrating the recall
    * the training iterations buy (at sf0.1: 0.733 trained vs 0.667
    * label-seeded, same nprobe). Reuses the production operators for
    * every side ([[Embeddings.lloyd]], [[Embeddings.ivfTopK]],
    * [[Embeddings.bruteForceTopK]]). */
  def ivfRecallTrained(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val vecs = e.select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
    val seeds = Extras.embeddingCentroids(s, dir)
      .groupBy(col("label").as("cid"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        x => x.getField("centroid")).as("cv"))
    val trained = Embeddings.lloyd(vecs, seeds, iters = 5)
    val trainedLong = trained.select(col("cid").as("label"),
        posexplode(col("cv")).as(Seq("pos", "centroid")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"), col("centroid"))
    val q = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = vecs.select(col("vec_id").as("n_id"), col("v").as("nv"))
    val truth = Embeddings.bruteForceTopK(q, c, 3)
      .select(col("q_id"), col("n_id"))
    val approx = Embeddings
      .ivfTopK(vecs, trainedLong, queryMaxId = 5L, k = 3, nprobe = 2)
      .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
    truth.join(approx, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall",
        round(col("n_hits").cast("double") / col("n_true"), 6))
  }

  /** #203 INCREMENTAL index maintenance (`q_ann_ivf_incremental`) —
    * the daily-ingest shape applied to the stored vector index: the
    * corpus is split into a BASE (vec_id % 10 ≠ 7, which trains and
    * builds the index) and a planted NEW BATCH (vec_id % 10 = 7,
    * which arrives later); the batch is absorbed via
    * [[VectorIndex.assignBatch]] — scored row-locally against the
    * PERSISTED centroids and appended to the `bucket=` partitions as
    * a delta commit, cost ∝ batch, no retrain, no corpus rewrite —
    * and the query then searches the POST-APPEND index, proving batch
    * members are retrievable alongside base members. The oracle
    * replays assign-and-union: since build assigns base vectors and
    * assignBatch assigns batch vectors against the SAME base-trained
    * centroids with the same 6dp/tie-break rule, the unioned stored
    * table equals "assign ALL vectors against base-trained
    * centroids". Idempotent per batchId — a driver re-run never
    * re-appends. */
  def annIvfIncremental(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val isBatch = pmod(col("vec_id"), lit(10)) === 7
    def vecs(df: DataFrame) = df.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val baseRaw = raw.filter(!isBatch)
    val root = VectorIndex.defaultRoot(baseRaw, seedK = 8, iters = 2)
    VectorIndex.buildIfAbsent(vecs(baseRaw), root, seedK = 8, iters = 2)
    VectorIndex.assignBatch(s, root, vecs(raw.filter(isBatch)), batchId = 0L)
    val queries = vecs(baseRaw).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    VectorIndex.ivfTopKStored(s, root, queries, k = 3, nprobe = 2)
  }

  /** #204 PQ ADC RECALL, trained vs seeded (`q_pq_recall_trained`) —
    * what multi-round codebook training buys the product quantizer:
    * for rounds ∈ {1, 3} of [[VectorIndex.trainPqCodebook]] (Lloyd
    * iterated independently per subspace, per-round 6dp-rounded means
    * so the oracle replays the chain), the corpus is encoded and each
    * probe's ADC top-3 is compared against the EXACT squared-L2 top-3
    * — recall isolates quantization error, so truth uses the same
    * metric ADC approximates. All rankings on 6dp-rounded distances
    * with id tie-break; candidate ranking via the bounded map-side
    * TopKAgg (k rows per query reach the shuffle). */
  def pqRecallTrained(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
      .localCheckpoint()
    val sub = VectorIndex.subVectors(vecs).localCheckpoint()
    val q = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def topkByDist(scored: DataFrame): DataFrame = scored
      .select(col("q_id"), negate(col("d")).as("score"), col("n_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(3).toColumn)
      .flatMap { case (qid, top) => top.map { case (_, n) => (qid, n) } }
      .toDF("q_id", "n_id")
    // exact squared-L2 truth: 5 queries × corpus, row-local distance,
    // bounded top-k — the corpus never shuffles
    val truth = topkByDist(
      q.crossJoin(vecs.select(col("vec_id").as("n_id"), col("v").as("nv")))
        .filter(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          round(VectorIndex.dist2(col("qv"), col("nv")), 6).as("d")))
      .localCheckpoint()
    // ONE deterministic training chain, tapped after rounds 1 and 3
    // (round 1's codebook is the identical prefix state of round 3's
    // chain — fixed seeds, 6dp-rounded means), instead of re-training
    // the shared prefix per sweep point; both taps also reuse this
    // query's already-staged `sub` rather than re-deriving it
    val cb1 = VectorIndex.trainPqMore(sub, VectorIndex.pqSeedCodebook _, 1)
    val cb3 = VectorIndex.trainPqMore(sub, _ => cb1, 2)
    Seq((1, cb1), (3, cb3)).map { case (rounds, cb) =>
      val codes = VectorIndex.encodePq(sub, cb)
      val dtab = sub.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("m"), col("sv"))
        .join(broadcast(cb), "m")
        .select(col("q_id"), col("m"), col("c"),
          VectorIndex.dist2(col("sv"), col("cv")).as("d"))
      val approx = topkByDist(
        codes.join(broadcast(dtab), Seq("m", "c"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("vec_id").as("n_id"))
          .agg(round(sum(col("d")), 6).as("d")))
        .withColumn("hit", lit(1L))
      truth.join(approx, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(lit(rounds.toLong).as("rounds"), col("q_id"),
          col("n_true"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_true"), 6).as("recall"))
    }.reduce(_ unionByName _)
  }

  /** #206 INCREMENTAL near-dup dedup over the STORED LSH index
    * (`q_dedup_lsh_incremental`) — the text-side member of the
    * incremental-index family (#203 is the vector side): the corpus
    * is MinHash-signed once by [[graft.dedup.LshIndex.buildIfAbsent]]
    * and persisted (band keys in `bmod=` hash-partition dirs, shingle
    * sets in `dmod=` dirs); the planted daily batch (#72's shape —
    * every doc_id % 10 = 0 doc re-arrives with a 3-token suffix and a
    * shifted id) then signs ONLY ITSELF, probes the stored band
    * partitions its buckets hash into (PartitionFilters prune the
    * rest), verifies candidates against the pruned stored shingle
    * sets, and is delta-absorbed so the next batch sees it —
    * O(batch + candidates) per day where #72 still re-signs the
    * corpus. Output: verified (new_id, match_id, jaccard ≥ 0.2). The
    * oracle replays sign-everything + band-join + exact string
    * Jaccard; idempotent per batchId (replays return the same match
    * set without re-appending). */
  def dedupLshIncremental(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val batch = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + Plants.Shift1).as("doc_id"),
        concat(col("text"), lit(" near dup probe")).as("text"))
    val root = LshIndex.defaultRoot(corpus)
    LshIndex.buildIfAbsent(corpus, root)
    LshIndex.absorbBatch(s, root, batch, batchId = 0L)
  }

  /** #207 INDEX DRIFT REPORT (`q_index_drift`) — the retrain signal
    * of the incremental family: #203 absorbs batches forever, but
    * appending is only sound while new data still resembles the
    * corpus the centroids were trained on. [[VectorIndex.assignDrift]]
    * scores the planted batch against the PERSISTED centroids
    * (row-local argmax, no training aggregate in the plan) and
    * compares its mean assignment cosine to the build-time baseline
    * from the stored `stats` artifact: one row (n_batch,
    * mean_ccos_batch, mean_ccos_build, drift), where a positive
    * drift says the batch sits farther from the centroids than the
    * corpus did — schedule a retrain instead of appending. The
    * oracle replays the 2-round Lloyd train and BOTH means. */
  def indexDrift(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val isBatch = pmod(col("vec_id"), lit(10)) === 7
    def vecs(df: DataFrame) = df.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val baseRaw = raw.filter(!isBatch)
    val root = VectorIndex.defaultRoot(baseRaw, seedK = 8, iters = 2)
    VectorIndex.buildIfAbsent(vecs(baseRaw), root, seedK = 8, iters = 2)
    VectorIndex.assignDrift(s, root, vecs(raw.filter(isBatch)))
  }

  /** #208 INCREMENTAL PQ ABSORB + ADC SEARCH (`q_ann_pq_incremental`)
    * — the quantized leg of the #203/#206 daily-ingest family: the
    * BASE corpus (vec_id % 10 ≠ 7) trains and stores the PQ codebook
    * + codes; the planted batch is encoded against the PERSISTED
    * codebook ([[VectorIndex.encodeBatchPq]] — broadcast KB-scale
    * codebook, batch-sized shuffle only) and delta-appended; the ADC
    * search then answers over the post-append codes, proving batch
    * members rank as first-class candidates. The oracle replays
    * train-on-base + encode-ALL-against-base-codebook (≡ build ∪
    * absorb, since both encode against the same stored codebook) +
    * ADC. Idempotent per batchId. */
  def annPqIncremental(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val isBatch = pmod(col("vec_id"), lit(10)) === 7
    def vecs(df: DataFrame) = df.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val baseRaw = raw.filter(!isBatch)
    val root = VectorIndex.defaultRoot(baseRaw, seedK = 8, iters = 2)
    VectorIndex.buildPqIfAbsent(vecs(baseRaw), root)
    VectorIndex.encodeBatchPq(s, root, vecs(raw.filter(isBatch)), batchId = 0L)
    val queries = vecs(baseRaw).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v"))
    VectorIndex.adcTopKStored(s, root, queries, k = 3)
  }

  /** #209 MARGIN-BASED BITEXT MINING (`q_bitext_mine`) — the
    * parallel-corpus mining step of a multilingual training pipeline
    * (the ratio-margin criterion of Artetxe & Schwenk 2019, the
    * public method behind CCMatrix-style mining): for a bounded probe
    * slice of English documents, each candidate German pair is scored
    * by cos(x, y) normalized by the mean of both endpoints' k-NN
    * similarity neighborhoods — the correction that suppresses
    * hubness false positives a raw-cosine cut keeps. Top-20 pairs by
    * (margin, ids).
    *
    * Scale shape: both directions are bounded-probe brute-force scans
    * (probes × corpus row-local cosine, bounded map-side TopKAgg — k
    * rows per probe cross the shuffle); the reverse direction scores
    * only the ≤ probes×k DISTINCT forward candidates. The margin
    * arithmetic runs on the tiny candidate frame. At production scale
    * the two scans swap in the stored IVF index
    * ([[VectorIndex.ivfTopKStored]]) unchanged — the margin layer is
    * representation-agnostic. */
  def bitextMine(s: SparkSession, dir: String): DataFrame = {
    val langOf = Tables.documents(s, dir)
      .select(col("doc_id").as("vec_id"), col("lang"))
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
      .join(langOf, "vec_id")
      .localCheckpoint()
    val en = vecs.filter(col("lang") === "en")
    val de = vecs.filter(col("lang") === "de")
    val k = 4
    val q = en.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val fwd = Embeddings.bruteForceTopK(q,
        de.select(col("vec_id").as("n_id"), col("v").as("nv")), k)
      .localCheckpoint()
    val xm = fwd.groupBy(col("q_id")).agg(round(avg(col("cos")), 6).as("xm"))
    // reverse neighborhoods of the bounded candidate set, over the
    // FULL English side (the margin must see y's true neighborhood)
    val ys = fwd.select(col("n_id")).distinct()
      .join(de, col("n_id") === col("vec_id"))
      .select(col("n_id").as("q_id"), col("v").as("qv"))
    val ym = Embeddings.bruteForceTopK(ys,
        en.select(col("vec_id").as("n_id"), col("v").as("nv")), k)
      .groupBy(col("q_id").as("n_id"))
      .agg(round(avg(col("cos")), 6).as("ym"))
    fwd.join(xm, "q_id").join(ym, "n_id")
      .select(col("q_id").as("en_id"), col("n_id").as("de_id"), col("cos"),
        round(col("cos") / ((col("xm") + col("ym")) / 2.0), 6)
          .as("margin_score"))
      .orderBy(col("margin_score").desc, col("en_id"), col("de_id"))
      .limit(20)
  }

  /** #210 DELTA-CHAIN COMPACTION (`q_ann_ivf_compacted`) — the
    * maintenance half of the append contract, gated end-to-end: after
    * #203's build + batch absorb leaves the assignments table as a
    * full-snapshot + delta chain, [[graft.sources.Snapshots.compact]]
    * rewrites the chain as ONE full version (readers touch one dir
    * again; older versions stay time-travelable until vacuumed), and
    * the search over the COMPACTED index must return exactly what the
    * chained index returned — the oracle is #203's, unchanged,
    * because compaction must be invisible to every reader. Compact is
    * idempotent (latest already full → no-op), so driver re-runs are
    * stable. */
  def annIvfCompacted(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val isBatch = pmod(col("vec_id"), lit(10)) === 7
    def vecs(df: DataFrame) = df.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val baseRaw = raw.filter(!isBatch)
    val root = VectorIndex.defaultRoot(baseRaw, seedK = 8, iters = 2)
    VectorIndex.buildIfAbsent(vecs(baseRaw), root, seedK = 8, iters = 2)
    VectorIndex.assignBatch(s, root, vecs(raw.filter(isBatch)), batchId = 0L)
    graft.sources.Snapshots.compact(s,
      VectorIndex.assignmentsRoot(root), Seq("bucket"))
    val queries = vecs(baseRaw).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    VectorIndex.ivfTopKStored(s, root, queries, k = 3, nprobe = 2)
  }

  /** #211 TWO-DAY CHAINED INGEST over the stored LSH index
    * (`q_dedup_lsh_chained`) — gates what the LshIndexSpec chain test
    * proves, against the ORACLE: day-1's batch is absorbed (delta 1),
    * then day-2's batch — variants of day-1's docs under a different
    * suffix — probes the index and must find its matches THROUGH
    * day-1's delta-appended rows (a chain read across full + delta
    * dirs), plus the originals in the base snapshot. Own index root
    * (fingerprint + "-chain") so #206's single-batch result stays
    * order-independent. Idempotent per batchId as ever. */
  def dedupLshChained(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def planted(shift: Long, suffix: String) = corpus
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + shift).as("doc_id"),
        concat(col("text"), lit(suffix)).as("text"))
    val root = LshIndex.defaultRoot(corpus) + "-chain"
    LshIndex.buildIfAbsent(corpus, root)
    LshIndex.absorbBatch(s, root, planted(Plants.Shift1, " near dup probe"),
      batchId = 0L)
    LshIndex.absorbBatch(s, root, planted(Plants.Shift2, " near dup probe again"),
      batchId = 1L)
  }

  /** #214 BITEXT MINING OVER THE STORED INDEX
    * (`q_bitext_mine_indexed`) — the production composition #209 only
    * claimed: both margin arms answered by
    * [[VectorIndex.ivfTopKStored]] probes instead of brute-force
    * scans. The realistic shape is ONE multilingual index: every
    * embedding is assigned once, with its `lang` tag STORED IN THE
    * INDEX ROWS as a payload column ([[VectorIndex.assignRowLocal]]
    * carries extra columns — the FAISS/vector-DB payload pattern,
    * because at 100 TB the metadata cannot be a corpus-sized join at
    * query time), and each arm applies a language CANDIDATE FILTER
    * inside the probe (`candFilter` — filtered ANN composed with the
    * stored index, which #94 only did inline). Forward: en probe
    * slice → top-4 de candidates in the probed buckets; reverse: the
    * distinct forward candidates → top-4 en; margin = cos over the
    * mean of both neighborhood means (Artetxe & Schwenk 2019), top-20
    * by (margin, ids). Per-arm cost is probe-bucket-sized with the
    * lang predicate pushed into the pruned parquet scan; rankings via
    * the bounded map-side TopKAgg. Own `-ml` root: the payload-
    * carrying artifact must never collide with the plain #168/#213
    * indexes at the same fingerprint. */
  def bitextMineIndexed(s: SparkSession, dir: String): DataFrame = {
    val langOf = Tables.documents(s, dir)
      .select(col("doc_id").as("vec_id"), col("lang"))
    val raw = Tables.embeddings(s, dir)
    val vecs = raw
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
      .join(langOf, "vec_id")
      .localCheckpoint()
    val root = VectorIndex.defaultRoot(raw, seedK = 8, iters = 2) + "-ml"
    VectorIndex.buildIfAbsent(vecs, root, seedK = 8, iters = 2)
    val k = 4
    val q = vecs.filter(col("lang") === "en" && col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val fwd = VectorIndex.ivfTopKStored(s, root, q, k, nprobe = 2,
        candFilter = col("lang") === "de")
      .localCheckpoint()
    val xm = fwd.groupBy(col("q_id")).agg(round(avg(col("cos")), 6).as("xm"))
    val ys = fwd.select(col("n_id")).distinct()
      .join(vecs, col("n_id") === col("vec_id"))
      .select(col("n_id").as("q_id"), col("v").as("qv"))
    val ym = VectorIndex.ivfTopKStored(s, root, ys, k, nprobe = 2,
        candFilter = col("lang") === "en")
      .groupBy(col("q_id").as("n_id"))
      .agg(round(avg(col("cos")), 6).as("ym"))
    fwd.join(xm, "q_id").join(ym, "n_id")
      .select(col("q_id").as("en_id"), col("n_id").as("de_id"), col("cos"),
        round(col("cos") / ((col("xm") + col("ym")) / 2.0), 6)
          .as("margin_score"))
      .orderBy(col("margin_score").desc, col("en_id"), col("de_id"))
      .limit(20)
  }

  /** #213 RETRAIN-AND-SWAP (`q_index_retrain_swap`) — the operational
    * response to #207's drift signal, closing the loop the incremental
    * family left open: absorbing forever degrades once data drifts, so
    * the nightly job REBUILDS the index from the full corpus under a
    * NEW content-fingerprint root ([[VectorIndex.retrainSwap]] — a
    * retried job re-trains nothing) and atomically repoints the
    * family's `_current` pointer (one ATOMIC_MOVE over one small
    * file). Readers resolve the pointer ONCE and read every artifact
    * under that single root, so a mid-swap reader sees the old index
    * or the new index, never new centroids over old assignments
    * (VectorIndexSpec pins in-flight-reader consistency and old-root
    * time travel). The gate: base-corpus index built and installed,
    * then retrain-on-ALL + swap; the post-swap search must answer the
    * train-on-all stored-IVF oracle (#168's SQL) exactly. */
  def indexRetrainSwap(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val isBatch = pmod(col("vec_id"), lit(10)) === 7
    def vecs(df: DataFrame) = df.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val baseRaw = raw.filter(!isBatch)
    val root1 = VectorIndex.defaultRoot(baseRaw, seedK = 8, iters = 2)
    val root2 = VectorIndex.defaultRoot(raw, seedK = 8, iters = 2)
    val family = root2 + "-family"
    // day 0: the base corpus trains the live index
    VectorIndex.buildIfAbsent(vecs(baseRaw), root1, seedK = 8, iters = 2)
    if (VectorIndex.currentRoot(family).isEmpty)
      VectorIndex.swapTo(family, root1)
    // drift response: retrain on the FULL corpus, atomic repoint
    VectorIndex.retrainSwap(vecs(raw), root2, family, seedK = 8, iters = 2)
    val resolved = VectorIndex.currentRoot(family).get
    val queries = vecs(raw).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    VectorIndex.ivfTopKStored(s, resolved, queries, k = 3, nprobe = 2)
  }

  /** #212 TEXT-INDEX DELTA-CHAIN COMPACTION (`q_dedup_lsh_compacted`)
    * — #210's maintenance gate applied to the STORED LSH text index,
    * closing the asymmetry where only the vector side had compaction
    * under oracle: a daily absorb loop grows the band/shingle
    * artifacts one delta dir per batch forever (a week of absorbs = a
    * 7-dir chain read per probe), so the nightly job compacts both
    * chains back to ONE full snapshot each. The gate: build + day-1
    * absorb, COMPACT both artifacts, then day-2's probe must answer
    * the `q_dedup_lsh_chained` oracle UNCHANGED — compaction is
    * invisible to every reader, including the replay watermark
    * ([[graft.sources.Snapshots.compact]] carries the chain's
    * maxBatchId forward, so a re-delivered day-1 batch still no-ops
    * after compaction — LshIndexSpec pins that). Own root suffix so
    * sibling gates stay order-independent. */
  def dedupLshCompacted(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def planted(shift: Long, suffix: String) = corpus
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + shift).as("doc_id"),
        concat(col("text"), lit(suffix)).as("text"))
    val root = LshIndex.defaultRoot(corpus) + "-compacted"
    LshIndex.buildIfAbsent(corpus, root)
    LshIndex.absorbBatch(s, root, planted(Plants.Shift1, " near dup probe"),
      batchId = 0L)
    graft.sources.Snapshots.compact(s, LshIndex.bandsRoot(root), Seq("bmod"))
    graft.sources.Snapshots.compact(s, LshIndex.shinglesRoot(root), Seq("dmod"))
    LshIndex.absorbBatch(s, root, planted(Plants.Shift2, " near dup probe again"),
      batchId = 1L)
  }

  /** #215 PQ-CODES DELTA-CHAIN COMPACTION (`q_ann_pq_compacted`) —
    * the last asymmetric cell in the maintenance matrix (#210 gated
    * the IVF assignments chain, #212 the LSH text chains; #208's
    * daily `encodeBatchPq` deltas grew the codes chain forever with
    * no gate): build the PQ index on the BASE corpus, delta-absorb
    * the planted batch, run [[graft.similarity.VectorIndex.nightly]]
    * — the vector families' maintenance entry point, which compacts
    * the codes chain back to ONE full snapshot and vacuums — and the
    * ADC search over the COMPACTED codes must answer #208's oracle
    * UNCHANGED (compaction invisible to every reader, including the
    * replay watermark: [[graft.sources.Snapshots.compact]] carries
    * maxBatchId, VectorIndexSpec pins the re-delivered batch
    * no-oping post-compaction). Own root suffix so sibling gates stay
    * order-independent. */
  def annPqCompacted(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val isBatch = pmod(col("vec_id"), lit(10)) === 7
    def vecs(df: DataFrame) = df.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val baseRaw = raw.filter(!isBatch)
    val root = VectorIndex.defaultRoot(baseRaw, seedK = 8, iters = 2) + "-pqcompact"
    VectorIndex.buildPqIfAbsent(vecs(baseRaw), root)
    VectorIndex.encodeBatchPq(s, root, vecs(raw.filter(isBatch)), batchId = 0L)
    VectorIndex.nightly(s, root)
    val queries = vecs(baseRaw).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v"))
    VectorIndex.adcTopKStored(s, root, queries, k = 3)
  }

  /** #216 TARGETED DELETE THROUGH THE STORED INDEX
    * (`q_corpus_delete`) — the right-to-be-forgotten path every
    * production corpus eventually needs, gated end-to-end: build the
    * LSH index on the corpus, absorb day-1's planted batch, then
    * DELETE a slice of the day-1 copies (every doc_id % 30 == 0
    * plant) AND a slice of the ORIGINAL corpus (every
    * doc_id % 40 == 0 — exercising tombstones over both the delta
    * dirs and the full base snapshot), via
    * [[graft.dedup.LshIndex.delete]] — O(keys) tombstone commits on
    * both artifacts, no corpus rewrite. Day-2's probe then CANNOT
    * match any deleted document: its verified match set equals the
    * oracle computed over "corpus minus deletions" as if the deleted
    * docs had never been indexed, while pre-delete versions stay
    * time-travelable (SnapshotsSpec/LshIndexSpec pin time travel,
    * re-add-after-delete, physical forget via compact + vacuum, and
    * replay idempotence on the shared monotone clock: absorb 0,
    * delete 1, absorb 2). Own root suffix keeps sibling gates
    * order-independent. */
  def corpusDelete(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def planted(shift: Long, suffix: String) = corpus
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + shift).as("doc_id"),
        concat(col("text"), lit(suffix)).as("text"))
    val root = LshIndex.defaultRoot(corpus) + "-del"
    LshIndex.buildIfAbsent(corpus, root)
    LshIndex.absorbBatch(s, root, planted(Plants.Shift1, " near dup probe"),
      batchId = 0L)
    val deleteIds = corpus
      .filter(pmod(col("doc_id"), lit(30)) === 0)
      .select((col("doc_id") + Plants.Shift1).as("doc_id"))
      .unionByName(corpus.filter(pmod(col("doc_id"), lit(40)) === 0)
        .select(col("doc_id")))
    LshIndex.delete(s, root, deleteIds, batchId = Some(1L))
    LshIndex.absorbBatch(s, root, planted(Plants.Shift2, " near dup probe again"),
      batchId = 2L)
  }

  /** #217 TEXT-INDEX RETRAIN-AND-SWAP (`q_lsh_retrain_swap`) — #213's
    * family-pointer treatment applied to the stored LSH index, making
    * #194's banding-parameter sweep ACTIONABLE: the sweep says a
    * different (bands, rows) trades recall for precision, and until
    * now nothing could act on it. Day 0 installs the corpus index
    * under the original banding (rows-per-band 2); the tuning
    * decision then re-signs the corpus under rows-per-band 4 at a NEW
    * content-fingerprint root ([[graft.dedup.LshIndex.retrainSwap]] —
    * a retried job re-signs nothing) and atomically repoints the
    * family. Probes resolve the pointer once and sign their batch
    * with the ROOT'S stored `_params` ([[graft.dedup.LshIndex
    * .rowsPerBandOf]]), so a mid-swap probe runs old-bands-old-params
    * or new-bands-new-params, never a mix (LshIndexSpec pins it). The
    * gate: the post-swap probe's verified matches answer the
    * incremental oracle REPLAYED UNDER THE NEW BANDING — 2 bands of 4
    * signature rows, a strictly tighter candidate rule whose result
    * provably differs from the 4×2 index's. */
  def lshRetrainSwap(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexPointer
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def planted(shift: Long, suffix: String) = corpus
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + shift).as("doc_id"),
        concat(col("text"), lit(suffix)).as("text"))
    val root1 = LshIndex.defaultRoot(corpus, rowsPerBand = 2) + "-swap"
    val root2 = LshIndex.defaultRoot(corpus, rowsPerBand = 4) + "-swap"
    val family = root2 + "-family"
    // day 0: the original banding serves the family
    LshIndex.buildIfAbsent(corpus, root1, rowsPerBand = 2)
    if (IndexPointer.current(family).isEmpty)
      IndexPointer.swapTo(family, root1)
    // the sweep's verdict: re-band to 2 bands × 4 rows, atomic repoint
    LshIndex.retrainSwap(corpus, root2, family, rowsPerBand = 4)
    val resolved = IndexPointer.current(family).get
    LshIndex.absorbBatch(s, resolved,
      planted(Plants.Shift1, " near dup probe"), batchId = 0L)
  }

  /** #218 TEXT-INDEX DRIFT REPORT (`q_lsh_drift`) — #207's retrain
    * signal re-expressed for the LSH side, closing the last
    * asymmetric diagnostic cell: the build stores the corpus's
    * band-collision baseline in a `stats` artifact (fraction of docs
    * sharing a (band, bucket) with another doc), and
    * [[graft.dedup.LshIndex.absorbDrift]] probes a batch — signed
    * row-locally, probe-ONLY so the report is replay-stable — against
    * the pruned stored bands and reports its collision rate against
    * that baseline. The planted batch here is pure near-dups, so
    * coll_frac_batch ≈ 1 and the drift is strongly positive — the
    * "mirror flood" shape whose absorb cost is about to surge. One
    * row: (n_batch, coll_frac_batch, coll_frac_build, drift); the
    * oracle replays the signing, both collision fractions, and the
    * subtraction. */
  def lshDrift(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val batch = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + Plants.Shift1).as("doc_id"),
        concat(col("text"), lit(" near dup probe")).as("text"))
    val root = LshIndex.defaultRoot(corpus) + "-drift"
    LshIndex.buildIfAbsent(corpus, root)
    LshIndex.absorbDrift(s, root, batch)
  }

  /** One synthetic ingest day for the week gate (#219): near-dups of
    * the corpus slice doc_id % 10 == d (shift (d+1)e6), FRESH docs —
    * reversed-token variants of the % 20 == d slice (shift 10e6+d·1e6;
    * reversed trigram shingles don't collide with the originals') —
    * and, from day 1 on, CROSS-DAY dups: yesterday's fresh text with a
    * suffix (shift 20e6+d·1e6), which can only be caught THROUGH the
    * index's absorbed day-(d-1) rows. */
  private[graft] def weekBatch(corpus: DataFrame, d: Int): DataFrame = {
    val dups = corpus.filter(pmod(col("doc_id"), lit(10)) === d)
      .select((col("doc_id") + (d + 1) * 1000000L).as("doc_id"),
        concat(col("text"), lit(" week probe")).as("text"))
    val rev = array_join(reverse(split(col("text"), " ")), " ")
    val fresh = corpus.filter(pmod(col("doc_id"), lit(20)) === d)
      .select((col("doc_id") + (10000000L + d * 1000000L)).as("doc_id"),
        rev.as("text"))
    val out = dups.unionByName(fresh)
    if (d == 0) out
    else out.unionByName(
      corpus.filter(pmod(col("doc_id"), lit(20)) === (d - 1))
        .select((col("doc_id") + (20000000L + d * 1000000L)).as("doc_id"),
          concat(rev, lit(" again")).as("text")))
  }

  /** #219 WEEK-SCALE OPERATIONAL GATE (`q_curation_week`) — the #211
    * two-day chain generalized to the real operational cadence, gating
    * the COMPOSITION the pipeline objects already implement: 7 chained
    * [[graft.pipelines.CurationJob.absorbDaily]] days (quality gate →
    * stored-LSH near-dup check → curated delta append, batchId = day)
    * with [[graft.pipelines.CurationJob.nightly]] BETWEEN every day
    * (compaction + keep-3 vacuum on all three chains — so the gate
    * also proves a week of maintenance never perturbs ingest), then
    * the final curated corpus is answered against a DIRECT
    * all-at-once oracle that replays the whole week: per day, the
    * quality-passed batch probes corpus ∪ every EARLIER day's
    * quality-passed docs (absorbed survivors AND dropped dups both
    * enter the index — absorbBatch signs all candidates), survivors
    * append. Cross-day plants ([[weekBatch]]) make day d's matches
    * depend on day d-1's absorbed rows, so a watermark or compaction
    * bug anywhere in the chain shifts the final corpus. Output:
    * (doc_id, content_hash) of the end-of-week curated snapshot.
    * Re-running replays every day as a no-op and returns the same
    * corpus. */
  def curationWeek(s: SparkSession, dir: String): DataFrame = {
    import graft.pipelines.CurationJob
    import graft.sources.Snapshots
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val base = LshIndex.defaultRoot(corpus) + "-week"
    val (curatedRoot, lshRoot) = (s"$base/curated", s"$base/lsh")
    if (Snapshots.latestVersion(curatedRoot).isEmpty)
      Snapshots.commit(corpus, curatedRoot)
    LshIndex.buildIfAbsent(corpus, lshRoot)
    for (d <- 0 until 7) {
      CurationJob.absorbDaily(weekBatch(corpus, d), curatedRoot, lshRoot,
        batchId = d.toLong)
      CurationJob.nightly(s, curatedRoot, lshRoot, keep = 3)
    }
    Snapshots.read(s, curatedRoot)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
  }

  /** #231 CONTENDED WEEK GATE (`q_curation_week_contended`) — #219's
    * 7-day composition with the OPERATIONAL RACE left in: each day,
    * [[graft.pipelines.CurationJob.absorbDaily]] and
    * [[graft.pipelines.CurationJob.nightly]] run CONCURRENTLY on the
    * same roots (latch-started threads, joined before the next day) —
    * the deployment shape where the maintenance window overlaps a late
    * ingest. The primitives are individually raced in SnapshotsSpec /
    * CrossProcessLockSpec; this gates the COMPOSED job: the final
    * curated corpus must equal the uncontended week's exactly (same
    * DuckDB oracle as #219), because ingest outcomes depend only on
    * INDEX CONTENT — compaction is an invisible rewrite, a
    * mid-rewrite append makes compact's pin guard refuse-and-defer,
    * and the replay watermark serializes under the commit lock. Any
    * interleaving that loses a delta, double-appends a batch, or
    * compacts away a mid-flight day shifts the corpus and fails the
    * hash. Re-running replays every day as a no-op against the played
    * root. */
  def curationWeekContended(s: SparkSession, dir: String): DataFrame = {
    import graft.pipelines.CurationJob
    import graft.sources.Snapshots
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val base = LshIndex.defaultRoot(corpus) + "-weekc"
    val (curatedRoot, lshRoot) = (s"$base/curated", s"$base/lsh")
    if (Snapshots.latestVersion(curatedRoot).isEmpty)
      Snapshots.commit(corpus, curatedRoot)
    LshIndex.buildIfAbsent(corpus, lshRoot)
    for (d <- 0 until 7) {
      val start = new java.util.concurrent.CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def racer(name: String)(body: => Unit) = {
        val t = new Thread(() => {
          start.await()
          try body catch { case e: Throwable => errs.add(e) }
        }, name)
        t.start(); t
      }
      val ingest = racer(s"weekc-ingest-$d") {
        CurationJob.absorbDaily(weekBatch(corpus, d), curatedRoot, lshRoot,
          batchId = d.toLong)
      }
      val maint = racer(s"weekc-nightly-$d") {
        CurationJob.nightly(s, curatedRoot, lshRoot, keep = 3)
      }
      start.countDown()
      ingest.join(); maint.join()
      if (!errs.isEmpty) throw errs.peek()
    }
    Snapshots.read(s, curatedRoot)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
  }

  /** #220 TARGETED DELETE THROUGH THE VECTOR INDEX (`q_ann_delete`) —
    * #216's right-to-be-forgotten gate for the embedding side: build
    * the IVF index on the full corpus, tombstone every
    * vec_id % 10 == 3 vector out of the stored assignments
    * ([[graft.similarity.VectorIndex.delete]] — O(keys), the
    * corpus-sized artifact is never rewritten), and the stored-index
    * search must answer AS IF the deleted vectors had never been
    * indexed: the oracle assigns all vectors against the same trained
    * centroids and simply excludes the deleted ids from the candidate
    * side (centroids are statistics, not memberships — they keep
    * serving until the next retrain, exactly the engine's contract).
    * Deleted ids can never be returned at any rank; survivors that
    * were previously shadowed by a deleted better neighbor surface.
    * Own root suffix keeps #168's sibling gates order-independent;
    * idempotent — the tombstone replays as a no-op per batchId. */
  def annDelete(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val vecs = raw.select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
    val root = VectorIndex.defaultRoot(raw, seedK = 8, iters = 2) + "-del"
    VectorIndex.buildIfAbsent(vecs, root, seedK = 8, iters = 2)
    VectorIndex.delete(s, root,
      vecs.filter(pmod(col("vec_id"), lit(10)) === 3).select(col("vec_id")),
      batchId = Some(0L))
    val queries = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    VectorIndex.ivfTopKStored(s, root, queries, k = 3, nprobe = 2)
  }

  /** #221 INCREMENTAL SEMANTIC DEDUP over the stored IVF index
    * (`q_semdedup_incremental`) — the embedding-side member of the
    * incremental-dedup family (#206 is the text twin; #76's SemDeDup
    * is the inline batch form): the base corpus (vec_id % 10 ≠ 7)
    * trains and stores the index; the arriving batch — the natural
    * % 10 == 7 slice plus PLANTED verbatim copies of % 10 == 2
    * vectors under shifted ids, whose cosine with their originals is
    * exactly 1.0 — is assigned row-locally, probes ONLY its own
    * buckets of the stored assignments for matches with cos ≥ 0.95
    * (plus within-batch pairs, smaller id kept), and is delta-absorbed
    * ([[graft.similarity.VectorIndex.semProbeBatch]]). The oracle
    * replays base-trained Lloyd, both assignment sides, and the
    * bucket-local threshold join. Own `-sem` root keeps the
    * assignment-absorbing siblings order-independent; idempotent and
    * replay-stable per batchId. */
  def semdedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    def vecs(df: DataFrame) = df.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val baseRaw = raw.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val root = VectorIndex.defaultRoot(baseRaw, seedK = 8, iters = 2) + "-sem"
    VectorIndex.buildIfAbsent(vecs(baseRaw), root, seedK = 8, iters = 2)
    val batch = vecs(raw.filter(pmod(col("vec_id"), lit(10)) === 7))
      .unionByName(vecs(raw.filter(pmod(col("vec_id"), lit(10)) === 2))
        .select((col("vec_id") + Plants.Shift1).as("vec_id"), col("v")))
    VectorIndex.semProbeBatch(s, root, batch, tau = 0.95, batchId = 0L)
  }

  /** #222 INCREMENTAL GRID-SPAN DEDUP over a STORED span index
    * (`q_substring_dedup_incremental`) — the last index family to
    * gain an incremental member (LSH text #206, IVF #203, PQ #208,
    * and now exact substrings): the corpus's 16-token grid span
    * hashes are persisted once in `smod=` hash-partition dirs
    * ([[graft.dedup.SpanIndex]]); the daily batch — verbatim copies
    * of the % 10 == 0 docs (every full span duplicated against the
    * corpus) plus reversed-token fresh docs of the % 20 == 5 slice —
    * enumerates only its own spans row-locally, probes the pruned
    * stored artifact semi-restricted to the batch's hash set, and
    * reports #73's per-doc statistics over corpus ∪ batch before
    * being delta-absorbed. The oracle replays grid spans of corpus +
    * batch and the df > 1 rule restricted to batch docs. Idempotent
    * and replay-stable per batchId. */
  def substringDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SpanIndex
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val root = SpanIndex.defaultRoot(corpus)
    SpanIndex.buildIfAbsent(corpus, root)
    val rev = array_join(reverse(split(col("text"), " ")), " ")
    val batch = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + Plants.Shift1).as("doc_id"), col("text"))
      .unionByName(corpus.filter(pmod(col("doc_id"), lit(20)) === 5)
        .select((col("doc_id") + Plants.Shift2).as("doc_id"), rev.as("text")))
    SpanIndex.absorbBatch(s, root, batch, batchId = 0L)
  }

  /** #223 SPAN-CHAIN COMPACTION (`q_span_compacted`) — #212/#215's
    * maintenance treatment applied to the STORED grid-span index,
    * bringing the youngest index family into the ops matrix: day 1
    * absorbs a batch of REVERSED-token plants of the % 10 == 0 slice
    * (fresh vs the corpus — their grid spans share nothing with the
    * originals'), [[graft.dedup.SpanIndex.nightly]] then compacts the
    * `smod=` chain back to ONE full snapshot (carrying the replay
    * watermark — [[graft.sources.Snapshots.compact]]'s maxBatchId,
    * SpanIndexSpec pins a re-delivered day-1 batch no-oping
    * afterwards), and day 2's probe — verbatim copies of DAY-1 docs
    * (every span duplicated, reachable ONLY through the compacted
    * day-1 rows) plus verbatim copies of the % 20 == 5 corpus slice
    * (duplicated against the base snapshot) — must answer the 2-day
    * oracle UNCHANGED: compaction invisible to every reader. Own
    * `-compact` root suffix keeps #222 order-independent. */
  def spanCompacted(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SpanIndex
    val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val root = SpanIndex.defaultRoot(corpus) + "-compact"
    SpanIndex.buildIfAbsent(corpus, root)
    val rev = array_join(reverse(split(col("text"), " ")), " ")
    val b1 = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + Plants.Shift1).as("doc_id"), rev.as("text"))
    SpanIndex.absorbBatch(s, root, b1, batchId = 0L)
    SpanIndex.nightly(s, root)
    val b2 = b1.select((col("doc_id") + Plants.Shift1).as("doc_id"), col("text"))
      .unionByName(corpus.filter(pmod(col("doc_id"), lit(20)) === 5)
        .select((col("doc_id") + Plants.Shift3).as("doc_id"), col("text")))
    SpanIndex.absorbBatch(s, root, b2, batchId = 1L)
  }

  /** #224 SCALED-K SEMANTIC DEDUP (`q_semdedup_scaled`) — the
    * measured closure of #221's one weakness: SemDeDup's probe is
    * bucket-local quadratic, so under a GROWING corpus the centroid
    * count must grow ∝ N to keep per-bucket occupancy — and with it
    * the probe cost — flat ([[graft.similarity.VectorIndex
    * .semProbeBatch]]'s cost model). The gate runs the operational
    * recipe end-to-end at 4x: the corpus is replicated 4x under
    * shifted ids (identical vectors — the replica marker convention
    * for embeddings), the index is retrained at seedK 8 → 32 via
    * [[graft.similarity.VectorIndex.retrainSwap]] (content-fingerprint
    * root, atomic family repoint — a retried job re-trains nothing),
    * and the incremental batch (the replicated % 10 == 7 slice plus
    * planted verbatim copies of the % 10 == 2 replicas) probes the
    * scaled index. The oracle replays the 32-seed Lloyd chain over the
    * replicated base and the bucket-local cos ≥ 0.95 join — proving
    * the scaled-k index answers exactly, while ScaleProbe's
    * `semdedup_scaled` row measures the flat cost curve the recipe
    * buys. */
  def semdedupScaled(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(s, dir)
    val rep = (0 until 4).map(r => raw.select(
        (col("vec_id") + r * 10000000L).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    def vecs(df: DataFrame) = df.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val baseRaw = rep.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val root = VectorIndex.defaultRoot(baseRaw, seedK = 32, iters = 2) + "-scaled"
    val family = root + "-family"
    VectorIndex.retrainSwap(vecs(baseRaw), root, family, seedK = 32, iters = 2)
    val resolved = VectorIndex.currentRoot(family).get
    val batch = vecs(rep.filter(pmod(col("vec_id"), lit(10)) === 7))
      .unionByName(vecs(rep.filter(pmod(col("vec_id"), lit(10)) === 2))
        .select((col("vec_id") + Plants.Shift1).as("vec_id"), col("v")))
    VectorIndex.semProbeBatch(s, resolved, batch, tau = 0.95, batchId = 0L)
  }

  /** #225 WEEK-SCALE VECTOR-SIDE OPERATIONAL GATE
    * (`q_embedding_week`) — #219's 7-day composition applied to the
    * EMBEDDING ingest deployment, the side where the r8
    * watermark-poisoning bug class lived: the base corpus
    * (vec_id % 20 < 13) trains and stores the IVF index AND the PQ
    * codebook; then 7 chained days each (1) semantically probe+absorb
    * their batch ([[graft.similarity.VectorIndex.semProbeBatch]],
    * batchId = day) — the day's verified pairs landed EXACTLY-ONCE
    * into a matches snapshot on the same monotone clock (the
    * [[graft.streaming.DocsStream.absorbNearDups]] landing pattern, so
    * a replayed day cannot re-derive pairs against future days'
    * absorbed rows) — (2) encode the batch into the stored PQ codes
    * ([[graft.similarity.VectorIndex.encodeBatchPq]]), and (3) run
    * FULL nightly maintenance ([[graft.similarity.VectorIndex
    * .nightly]] + matches-chain compaction) BETWEEN every day. Day
    * d's batch is its natural % 20 == 13+d slice plus planted verbatim
    * copies of day d-1's slice — matchable ONLY through day d-1's
    * absorbed-and-since-compacted rows. Output: the week's landed
    * pair ledger ∪ the end-of-week stored IVF search ∪ the
    * end-of-week ADC search over the absorbed codes, all answered by
    * ONE all-at-once oracle (assign/encode everything against the
    * base-trained artifacts, day-ordered pair rule). Re-running
    * replays every day as a no-op and returns the same frame. */
  def embeddingWeek(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Snapshots
    val raw = Tables.embeddings(s, dir)
    def vecs(df: DataFrame) = df.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val all = vecs(raw).localCheckpoint()
    val baseRaw = raw.filter(pmod(col("vec_id"), lit(20)) < 13)
    val base = all.filter(pmod(col("vec_id"), lit(20)) < 13)
    val root = VectorIndex.defaultRoot(baseRaw, seedK = 8, iters = 2) + "-week"
    val mroot = s"$root/sem_matches"
    VectorIndex.buildIfAbsent(base, root, seedK = 8, iters = 2)
    VectorIndex.buildPqIfAbsent(base, root)
    def natural(d: Int) = all.filter(pmod(col("vec_id"), lit(20)) === 13 + d)
    for (d <- 0 until 7) {
      val batch = if (d == 0) natural(0)
        else natural(d).unionByName(natural(d - 1)
          .select((col("vec_id") + Plants.Shift1).as("vec_id"), col("v")))
      val p = VectorIndex.semProbeBatch(s, root, batch, tau = 0.95,
          batchId = d.toLong)
        .select(lit(d.toLong).as("d"), col("new_id").as("a"),
          col("match_id").as("b"), col("cos").as("score"))
      // exactly-once landing on the day clock: a replayed day's probe
      // (which would now see LATER days' absorbed rows) never rewrites
      // the ledger — the committed week is the week as it happened
      Snapshots.landBatch(p, mroot, d.toLong)
      VectorIndex.encodeBatchPq(s, root, batch, batchId = d.toLong)
      VectorIndex.nightly(s, root)
      Snapshots.maintain(s, Seq(mroot -> Seq.empty))
    }
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v"))
    val pairs = Snapshots.read(s, mroot)
      .select(lit("pair").as("fam"), col("d"), col("a"), col("b"), col("score"))
    val ivf = VectorIndex.ivfTopKStored(s, root,
        queries.withColumnRenamed("v", "qv"), k = 3, nprobe = 2)
      .select(lit("ivf").as("fam"), col("rank").as("d"), col("q_id").as("a"),
        col("n_id").as("b"), col("cos").as("score"))
    val adc = VectorIndex.adcTopKStored(s, root, queries, k = 3)
      .select(lit("adc").as("fam"), col("rank").as("d"), col("q_id").as("a"),
        col("n_id").as("b"), col("adist").as("score"))
    pairs.unionByName(ivf).unionByName(adc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_ivf_stored"      -> annIvfStored _,
    "q_ivf_recall_trained"  -> ivfRecallTrained _,
    "q_ann_ivf_incremental" -> annIvfIncremental _,
    "q_pq_recall_trained"   -> pqRecallTrained _,
    "q_dedup_lsh_incremental" -> dedupLshIncremental _,
    "q_index_drift"           -> indexDrift _,
    "q_ann_pq_incremental"    -> annPqIncremental _,
    "q_bitext_mine"           -> bitextMine _,
    "q_ann_ivf_compacted"     -> annIvfCompacted _,
    "q_dedup_lsh_chained"     -> dedupLshChained _,
    "q_dedup_lsh_compacted"   -> dedupLshCompacted _,
    "q_index_retrain_swap"    -> indexRetrainSwap _,
    "q_bitext_mine_indexed"   -> bitextMineIndexed _,
    "q_ann_pq_compacted"      -> annPqCompacted _,
    "q_corpus_delete"         -> corpusDelete _,
    "q_lsh_retrain_swap"      -> lshRetrainSwap _,
    "q_lsh_drift"             -> lshDrift _,
    "q_curation_week"         -> curationWeek _,
    "q_curation_week_contended" -> curationWeekContended _,
    "q_ann_delete"            -> annDelete _,
    "q_semdedup_incremental"  -> semdedupIncremental _,
    "q_substring_dedup_incremental" -> substringDedupIncremental _,
    "q_span_compacted"        -> spanCompacted _,
    "q_semdedup_scaled"       -> semdedupScaled _,
    "q_embedding_week"        -> embeddingWeek _
  )

  private val cosSql =
    (a: String, b: String) =>
      s"""ROUND(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
         |      / (sqrt(list_sum(list_transform($a, y -> y*y)))
         |         * sqrt(list_sum(list_transform($b, y -> y*y)))), 6)""".stripMargin

  /** Sub-vector squared L2 in DuckDB — the PQ distance kernel. */
  private def subDistSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 9), j -> ($a[j] - $b[j]) * ($a[j] - $b[j])))"

  /** DuckDB replay of [[VectorIndex.trainPqCodebook]]: `rounds`
    * subspace-Lloyd iterations from the id-seed codebook `p0` over
    * `sub(vec_id, m, sv)`, per-round means ROUNDED 6dp so the engines
    * re-sync at every iteration boundary (the lloydChain convention
    * applied per subspace). */
  private def pqChain(rounds: Int): String = (1 to rounds).map { r =>
    s"""pa$r AS (SELECT vec_id, m, c FROM (
       |    SELECT s.vec_id, s.m, p.c, ROW_NUMBER() OVER (
       |      PARTITION BY s.vec_id, s.m
       |      ORDER BY ${subDistSql("s.sv", "p.cv")}, p.c) AS rn
       |    FROM sub s JOIN p${r - 1} p USING (m)) WHERE rn = 1),
       |pl$r AS (SELECT m, c, j, ROUND(AVG(sv[j]), 6) AS mv
       |  FROM sub JOIN pa$r USING (vec_id, m),
       |    (SELECT unnest(range(1, 9)) AS j)
       |  GROUP BY 1, 2, 3),
       |p$r AS (SELECT m, c, list(mv ORDER BY j) AS cv FROM pl$r GROUP BY 1, 2)""".stripMargin
  }.mkString(",\n")

  private lazy val annIvfIncrementalSql: String =
      s"""WITH ea AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |e AS (SELECT * FROM ea WHERE vec_id % 10 <> 7),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
         |${lloydChain(2)},
         |sf AS (
         |  SELECT ea.vec_id, ea.v, c.cid,
         |    ${cosSql("ea.v", "c.cv")} AS ccos
         |  FROM ea, c2 c),
         |asg AS (SELECT vec_id, v, cid AS bucket FROM sf
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
         |probes AS (SELECT vec_id AS q_id, cid AS bucket FROM sf WHERE vec_id < 5
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) <= 2),
         |pairs AS (
         |  SELECT p.q_id, c.vec_id AS n_id,
         |    ${cosSql("qe.v", "c.v")} AS cos
         |  FROM probes p
         |  JOIN ea qe ON qe.vec_id = p.q_id
         |  JOIN asg c ON c.bucket = p.bucket AND c.vec_id <> p.q_id)
         |SELECT q_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank,
         |  n_id, cos
         |FROM pairs
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) <= 3""".stripMargin

  /** Band CTE body for `src`'s 8 signature columns under a given
    * rows-per-band (the SQL twin of TextDedup.bandKeys' banding):
    * 8/r bands, bucket = the band's sigs joined with `|`. */
  private def bandUnionSql(src: String, rowsPerBand: Int): String = {
    val nb = 8 / rowsPerBand
    (0 until nb).map { b =>
      val expr = (0 until rowsPerBand)
        .map(i => s"sig_${b * rowsPerBand + i}").mkString(" || '|' || ")
      if (b == 0) s"SELECT doc_id, 0 AS band, $expr AS bucket FROM $src"
      else s"  UNION ALL SELECT doc_id, $b, $expr FROM $src"
    }.mkString("\n")
  }

  /** DuckDB replay of the stored-LSH incremental dedup (#206/#211):
    * sign corpus + batch, band-join candidates (batch vs index, plus
    * within-batch), verify exact string-shingle Jaccard >= 0.2. The
    * corpus/batch CTE bodies are parameters so the chained variant
    * replays a two-day ingest with the SAME machinery; `rowsPerBand`
    * parametrizes the banding so the retrain-swap gate replays the
    * RE-BANDED index (#194's sweep made actionable). */
  private def lshIncrementalOracle(corpusSql: String, batchSql: String,
      rowsPerBand: Int = 2): String =
    s"WITH corpus AS ($corpusSql),\nbatch AS ($batchSql),\n" +
      ("""tc AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
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
        s""" FROM snw),
          |bandc AS (
          |  ${bandUnionSql("sigc", rowsPerBand)}),
          |bandn AS (
          |  ${bandUnionSql("sign", rowsPerBand)}),""".stripMargin +
        """
          |cand AS (SELECT DISTINCT new_id, match_id FROM (
          |  SELECT n.doc_id AS new_id, i.doc_id AS match_id
          |  FROM bandn n JOIN bandc i
          |    ON n.band = i.band AND n.bucket = i.bucket
          |  UNION ALL
          |  SELECT b.doc_id, a.doc_id
          |  FROM bandn a JOIN bandn b
          |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)),
          |shdc AS (SELECT doc_id, list_distinct(sh) AS shs FROM scp
          |  UNION ALL SELECT doc_id, list_distinct(sh) FROM snw)
          |SELECT new_id, match_id,
          |  ROUND(len(list_intersect(sa.shs, sb.shs)) /
          |    (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))), 6)
          |    AS jaccard
          |FROM cand
          |JOIN shdc sb ON sb.doc_id = match_id
          |JOIN (SELECT doc_id, list_distinct(sh) AS shs FROM snw) sa
          |  ON sa.doc_id = new_id
          |WHERE ROUND(len(list_intersect(sa.shs, sb.shs)) /
          |    (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))), 6)
          |  >= 0.2""".stripMargin)

  /** DuckDB replay of the 7-day ingest week (#219), all at once: for
    * each day, the quality-passed batch band-joins against corpus ∪
    * every EARLIER day's quality-passed docs (plus within-day pairs),
    * verified matches at Jaccard ≥ 0.2 drop the doc, survivors append
    * to the curated corpus. Each doc set is signed ONCE and reused as
    * band CTEs (no per-day re-signing), mirroring the engine's stored
    * index. */
  private lazy val curationWeekOracleSql: String = {
    val days = 0 until 7
    def daySql(d: Int): String = {
      val rev = "array_to_string(list_reverse(string_split(text, ' ')), ' ')"
      val cross =
        if (d == 0) ""
        else s"""
           |  UNION ALL SELECT doc_id + ${20000000L + d * 1000000L}, $rev || ' again'
           |  FROM documents WHERE doc_id % 20 = ${d - 1}"""
      s"""day$d AS (
         |  SELECT doc_id + ${(d + 1) * 1000000L} AS doc_id,
         |    text || ' week probe' AS text
         |  FROM documents WHERE doc_id % 10 = $d
         |  UNION ALL SELECT doc_id + ${10000000L + d * 1000000L}, $rev
         |  FROM documents WHERE doc_id % 20 = $d$cross)""".stripMargin
    }
    // the quality gate of TextAnalysis.qualityPass, verbatim
    def qpSql(d: Int): String =
      s"""qp$d AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text, string_split(text, ' ') AS toks FROM day$d)
         |  WHERE len(toks) >= 10
         |    AND CAST(list_sum(list_transform(toks, tk -> CAST(len(tk) AS BIGINT)))
         |      AS DOUBLE) / len(toks) BETWEEN 3.0 AND 10.0
         |    AND CAST(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
         |      / len(toks) <= 0.1
         |    AND (CASE WHEN len(toks) >= 2
         |      THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)),
         |             i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) / (len(toks) - 1)
         |      ELSE 0.0 END) <= 0.5)""".stripMargin
    def shSql(name: String, src: String): String =
      s"""$name AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) >= 3
         |      THEN list_distinct(list_transform(range(1, len(toks) - 1),
         |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         |      ELSE CAST([] AS VARCHAR[]) END AS shs
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src))""".stripMargin
    val sigCols = (0 until 8).map(h =>
      "list_min(list_transform(" +
        "CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) " +
        s"ELSE CAST([] AS VARCHAR[]) END, x -> md5('$h:' || x))) AS sig_$h")
      .mkString(",\n    ")
    def sigSql(name: String, src: String): String =
      s"""$name AS (
         |  SELECT doc_id,
         |    $sigCols
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src))""".stripMargin
    def candSql(d: Int): String = {
      val idx = ("SELECT * FROM bandc" +:
        (0 until d).map(e => s"SELECT * FROM bq$e")).mkString(" UNION ALL ")
      s"""cand$d AS (SELECT DISTINCT new_id, match_id FROM (
         |  SELECT n.doc_id AS new_id, i.doc_id AS match_id
         |  FROM bq$d n JOIN ($idx) i
         |    ON n.band = i.band AND n.bucket = i.bucket AND n.doc_id <> i.doc_id
         |  UNION ALL
         |  SELECT b.doc_id, a.doc_id
         |  FROM bq$d a JOIN bq$d b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)),
         |matched$d AS (SELECT DISTINCT c.new_id FROM cand$d c
         |  JOIN shall sa ON sa.doc_id = c.new_id
         |  JOIN shall sb ON sb.doc_id = c.match_id
         |  WHERE ROUND(CAST(len(list_intersect(sa.shs, sb.shs)) AS DOUBLE) /
         |    (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))), 6)
         |    >= 0.2),
         |kept$d AS (SELECT q.doc_id, q.text FROM qp$d q
         |  LEFT JOIN matched$d m ON q.doc_id = m.new_id
         |  WHERE m.new_id IS NULL)""".stripMargin
    }
    val shAll = ("SELECT * FROM shc" +:
      days.map(d => s"SELECT * FROM shq$d")).mkString(" UNION ALL ")
    val keptAll = ("SELECT doc_id, text FROM corpus" +:
      days.map(d => s"SELECT doc_id, text FROM kept$d")).mkString(" UNION ALL ")
    (Seq("corpus AS (SELECT doc_id, text FROM documents)") ++
      days.map(daySql) ++ days.map(qpSql) ++
      Seq(shSql("shc", "corpus")) ++ days.map(d => shSql(s"shq$d", s"qp$d")) ++
      Seq(s"shall AS ($shAll)") ++
      Seq(sigSql("sigc", "corpus")) ++ days.map(d => sigSql(s"sigq$d", s"qp$d")) ++
      Seq(s"bandc AS (\n  ${bandUnionSql("sigc", 2)})") ++
      days.map(d => s"bq$d AS (\n  ${bandUnionSql(s"sigq$d", 2)})") ++
      days.map(candSql))
      .mkString("WITH ", ",\n", "\n") +
      s"SELECT doc_id, md5(text) AS content_hash FROM ($keptAll)"
  }

  /** DuckDB replay of the LSH drift report (#218): sign corpus and
    * batch (default 4×2 banding), build-side collision fraction =
    * corpus docs sharing a (band, bucket) with ANOTHER corpus doc
    * over all corpus docs; batch-side = batch docs sharing one with
    * any corpus doc over all batch docs; drift = their difference.
    * Null buckets (docs too short to shingle) never join — exactly
    * the engine's semantics. */
  private def lshDriftOracle(corpusSql: String, batchSql: String): String =
    s"WITH corpus AS ($corpusSql),\nbatch AS ($batchSql),\n" +
      ("""tc AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
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
        s""" FROM snw),
           |bandc AS (
           |  ${bandUnionSql("sigc", 2)}),
           |bandn AS (
           |  ${bandUnionSql("sign", 2)}),""".stripMargin +
        """
          |collc AS (SELECT COUNT(DISTINCT a.doc_id) AS n_coll
          |  FROM bandc a JOIN bandc b
          |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id <> b.doc_id),
          |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM corpus),
          |colln AS (SELECT COUNT(DISTINCT n.doc_id) AS n_coll
          |  FROM bandn n JOIN bandc i
          |    ON n.band = i.band AND n.bucket = i.bucket AND n.doc_id <> i.doc_id),
          |nb AS (SELECT COUNT(DISTINCT doc_id) AS n_batch FROM batch),
          |fr AS (SELECT nb.n_batch,
          |    ROUND(CAST(colln.n_coll AS DOUBLE) / nb.n_batch, 6) AS coll_frac_batch,
          |    ROUND(CAST(collc.n_coll AS DOUBLE) / nd.n_docs, 6) AS coll_frac_build
          |  FROM nb, colln, collc, nd)
          |SELECT n_batch, coll_frac_batch, coll_frac_build,
          |  ROUND(coll_frac_batch - coll_frac_build, 6) AS drift
          |FROM fr""".stripMargin)

  /** DuckDB replay of train-on-ALL + stored-IVF search (#168's gate;
    * also the post-swap answer #213 must reproduce, since a retrain on
    * the full corpus IS a train-on-all build). */
  private lazy val annIvfStoredSql: String =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
         |${lloydChain(2)},
         |sf AS (
         |  SELECT e.vec_id, e.v, c.cid,
         |    ${cosSql("e.v", "c.cv")} AS ccos
         |  FROM e, c2 c),
         |asg AS (SELECT vec_id, v, cid AS bucket FROM sf
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
         |probes AS (SELECT vec_id AS q_id, cid AS bucket FROM sf WHERE vec_id < 5
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) <= 2),
         |pairs AS (
         |  SELECT p.q_id, c.vec_id AS n_id,
         |    ${cosSql("qe.v", "c.v")} AS cos
         |  FROM probes p
         |  JOIN e qe ON qe.vec_id = p.q_id
         |  JOIN asg c ON c.bucket = p.bucket AND c.vec_id <> p.q_id)
         |SELECT q_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank,
         |  n_id, cos
         |FROM pairs
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) <= 3""".stripMargin

  /** DuckDB replay of #214: train-on-all Lloyd, lang-payload
    * assignment, probe-pruned lang-filtered top-4 both directions,
    * margin over neighborhood means, top-20. */
  private lazy val bitextIndexedSql: String =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
         |${lloydChain(2)},
         |lg AS (SELECT e.vec_id, e.v, d.lang FROM e
         |  JOIN documents d ON e.vec_id = d.doc_id),
         |sf AS (SELECT e.vec_id, e.v, c.cid,
         |    ${cosSql("e.v", "c.cv")} AS ccos
         |  FROM e, c2 c),
         |asg AS (SELECT s.vec_id, s.v, s.cid AS bucket, l.lang
         |  FROM sf s JOIN lg l ON s.vec_id = l.vec_id
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id
         |    ORDER BY s.ccos DESC, s.cid) = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM lg
         |  WHERE lang = 'en' AND vec_id < 50),
         |qp AS (SELECT q.q_id, q.qv, c.cid AS bucket,
         |    ${cosSql("q.qv", "c.cv")} AS ccos
         |  FROM q, c2 c
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q.q_id
         |    ORDER BY ccos DESC, c.cid) <= 2),
         |fwd AS (SELECT p.q_id, a.vec_id AS n_id,
         |    ${cosSql("p.qv", "a.v")} AS cos
         |  FROM qp p JOIN asg a
         |    ON a.bucket = p.bucket AND a.lang = 'de' AND a.vec_id <> p.q_id
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY p.q_id
         |    ORDER BY cos DESC, n_id) <= 4),
         |xm AS (SELECT q_id, ROUND(AVG(cos), 6) AS xm FROM fwd GROUP BY 1),
         |yq AS (SELECT DISTINCT f.n_id AS q_id, l.v AS qv
         |  FROM fwd f JOIN lg l ON l.vec_id = f.n_id),
         |yp AS (SELECT y.q_id, y.qv, c.cid AS bucket,
         |    ${cosSql("y.qv", "c.cv")} AS ccos
         |  FROM yq y, c2 c
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY y.q_id
         |    ORDER BY ccos DESC, c.cid) <= 2),
         |rev AS (SELECT p.q_id, a.vec_id AS n_id,
         |    ${cosSql("p.qv", "a.v")} AS cos
         |  FROM yp p JOIN asg a
         |    ON a.bucket = p.bucket AND a.lang = 'en' AND a.vec_id <> p.q_id
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY p.q_id
         |    ORDER BY cos DESC, n_id) <= 4),
         |ym AS (SELECT q_id AS n_id, ROUND(AVG(cos), 6) AS ym FROM rev GROUP BY 1)
         |SELECT f.q_id AS en_id, f.n_id AS de_id, f.cos,
         |  ROUND(f.cos / ((x.xm + y.ym) / 2.0), 6) AS margin_score
         |FROM fwd f JOIN xm x ON f.q_id = x.q_id JOIN ym y ON f.n_id = y.n_id
         |ORDER BY margin_score DESC, en_id, de_id LIMIT 20""".stripMargin

  /** DuckDB replay of #220: train-on-all Lloyd (deletion does not
    * retrain — centroids are statistics, not memberships), assign all,
    * then EXCLUDE the deleted ids from the candidate side only. */
  private lazy val annDeleteSql: String =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
         |${lloydChain(2)},
         |sf AS (
         |  SELECT e.vec_id, e.v, c.cid,
         |    ${cosSql("e.v", "c.cv")} AS ccos
         |  FROM e, c2 c),
         |asg AS (SELECT vec_id, v, cid AS bucket FROM sf
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
         |probes AS (SELECT vec_id AS q_id, cid AS bucket FROM sf WHERE vec_id < 5
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) <= 2),
         |pairs AS (
         |  SELECT p.q_id, c.vec_id AS n_id,
         |    ${cosSql("qe.v", "c.v")} AS cos
         |  FROM probes p
         |  JOIN e qe ON qe.vec_id = p.q_id
         |  JOIN asg c ON c.bucket = p.bucket AND c.vec_id <> p.q_id
         |    AND c.vec_id % 10 <> 3)
         |SELECT q_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank,
         |  n_id, cos
         |FROM pairs
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) <= 3""".stripMargin

  /** DuckDB replay of #221: base-trained Lloyd, both sides assigned
    * with the 6dp/lowest-cid rule, bucket-local cos ≥ 0.95 join of
    * batch vs base plus within-batch (smaller id kept). */
  private lazy val semdedupIncrementalSql: String =
      s"""WITH ea AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |e AS (SELECT * FROM ea WHERE vec_id % 10 <> 7),
         |batch AS (SELECT vec_id, v FROM ea WHERE vec_id % 10 = 7
         |  UNION ALL SELECT vec_id + 1000000, v FROM ea WHERE vec_id % 10 = 2),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
         |${lloydChain(2)},
         |sb AS (SELECT e.vec_id, e.v, c.cid,
         |    ${cosSql("e.v", "c.cv")} AS ccos
         |  FROM e, c2 c),
         |asgb AS (SELECT vec_id, v, cid AS bucket FROM sb
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
         |sn AS (SELECT b.vec_id, b.v, c.cid,
         |    ${cosSql("b.v", "c.cv")} AS ccos
         |  FROM batch b, c2 c),
         |asgn AS (SELECT vec_id, v, cid AS bucket FROM sn
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
         |vsc AS (SELECT n.vec_id AS new_id, b.vec_id AS match_id,
         |    ${cosSql("n.v", "b.v")} AS cos
         |  FROM asgn n JOIN asgb b ON n.bucket = b.bucket
         |  WHERE n.vec_id <> b.vec_id),
         |wib AS (SELECT b.vec_id AS new_id, a.vec_id AS match_id,
         |    ${cosSql("a.v", "b.v")} AS cos
         |  FROM asgn a JOIN asgn b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT new_id, match_id, cos FROM vsc WHERE cos >= 0.95
         |UNION ALL SELECT new_id, match_id, cos FROM wib WHERE cos >= 0.95""".stripMargin

  /** DuckDB replay of #224: the corpus replicated 4x under shifted
    * ids, the 32-seed Lloyd chain over the replicated base (k ∝ N —
    * the SemDeDup recipe at corpus growth), both sides assigned with
    * the 6dp/lowest-cid rule, bucket-local cos ≥ 0.95 join of batch vs
    * base plus within-batch (smaller id kept). */
  private lazy val semdedupScaledSql: String =
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |ea AS (SELECT vec_id + r * 10000000 AS vec_id, v
         |  FROM e0, (SELECT unnest(range(0, 4)) AS r)),
         |e AS (SELECT * FROM ea WHERE vec_id % 10 <> 7),
         |batch AS (SELECT vec_id, v FROM ea WHERE vec_id % 10 = 7
         |  UNION ALL SELECT vec_id + 1000000, v FROM ea WHERE vec_id % 10 = 2),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 32),
         |${lloydChain(2)},
         |sb AS (SELECT e.vec_id, e.v, c.cid,
         |    ${cosSql("e.v", "c.cv")} AS ccos
         |  FROM e, c2 c),
         |asgb AS (SELECT vec_id, v, cid AS bucket FROM sb
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
         |sn AS (SELECT b.vec_id, b.v, c.cid,
         |    ${cosSql("b.v", "c.cv")} AS ccos
         |  FROM batch b, c2 c),
         |asgn AS (SELECT vec_id, v, cid AS bucket FROM sn
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
         |vsc AS (SELECT n.vec_id AS new_id, b.vec_id AS match_id,
         |    ${cosSql("n.v", "b.v")} AS cos
         |  FROM asgn n JOIN asgb b ON n.bucket = b.bucket
         |  WHERE n.vec_id <> b.vec_id),
         |wib AS (SELECT b.vec_id AS new_id, a.vec_id AS match_id,
         |    ${cosSql("a.v", "b.v")} AS cos
         |  FROM asgn a JOIN asgn b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT new_id, match_id, cos FROM vsc WHERE cos >= 0.95
         |UNION ALL SELECT new_id, match_id, cos FROM wib WHERE cos >= 0.95""".stripMargin

  /** DuckDB replay of #225, all at once: tag every vector with its
    * ingest day (base = -1, natural slice % 20 == 13+d = day d, the
    * planted copy of day d-1's slice = day d under a +1e6 id), assign
    * everything against the base-trained Lloyd centroids, and replay
    * the three output families — the day-ordered pair ledger (a day's
    * vector pairs with base or any EARLIER day, or a same-day
    * smaller id, never a later day: exactly what the engine's
    * exactly-once landing pins), the end-of-week stored-IVF top-3,
    * and the end-of-week ADC top-3 over codes encoded against the
    * base-trained PQ codebook. */
  private lazy val embeddingWeekSql: String =
      s"""WITH ea AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |e AS (SELECT * FROM ea WHERE vec_id % 20 < 13),
         |tagged AS (
         |  SELECT vec_id, v, CAST(-1 AS BIGINT) AS day FROM e
         |  UNION ALL
         |  SELECT vec_id, v, CAST(vec_id % 20 - 13 AS BIGINT) FROM ea
         |  WHERE vec_id % 20 >= 13
         |  UNION ALL
         |  SELECT vec_id + 1000000, v, CAST(vec_id % 20 - 12 AS BIGINT) FROM ea
         |  WHERE vec_id % 20 BETWEEN 13 AND 18),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
         |${lloydChain(2)},
         |sall AS (SELECT t.vec_id, t.v, t.day, c.cid,
         |    ${cosSql("t.v", "c.cv")} AS ccos
         |  FROM tagged t, c2 c),
         |asg AS (SELECT vec_id, v, day, cid AS bucket FROM sall
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
         |prs AS (SELECT n.day AS d, n.vec_id AS a, m.vec_id AS b,
         |    ${cosSql("n.v", "m.v")} AS score
         |  FROM asg n JOIN asg m ON n.bucket = m.bucket
         |  WHERE n.day >= 0
         |    AND (m.day < n.day OR (m.day = n.day AND m.vec_id < n.vec_id))),
         |probes AS (SELECT vec_id AS q_id, cid AS bucket FROM sall
         |  WHERE day = -1 AND vec_id < 5
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) <= 2),
         |ipairs AS (SELECT p.q_id, c.vec_id AS n_id,
         |    ${cosSql("qe.v", "c.v")} AS cos
         |  FROM probes p
         |  JOIN e qe ON qe.vec_id = p.q_id
         |  JOIN asg c ON c.bucket = p.bucket AND c.vec_id <> p.q_id),
         |ivf AS (SELECT q_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank,
         |    n_id, cos
         |  FROM ipairs
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) <= 3),
         |sub AS (SELECT vec_id, day, m, v[(m*8 + 1):(m*8 + 8)] AS sv
         |  FROM tagged, (SELECT unnest(range(0, 8)) AS m)),
         |bsub AS (SELECT * FROM sub WHERE day = -1),
         |seeds AS (SELECT m, CAST(vec_id AS INT) AS c, sv AS cv
         |  FROM bsub WHERE vec_id < 16),
         |pqa0 AS (SELECT vec_id, m, c, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id, m
         |    ORDER BY ${subDistSql("sv", "cv")}, c) AS rn
         |  FROM bsub JOIN seeds USING (m)),
         |pqasg AS (SELECT vec_id, m, c FROM pqa0 WHERE rn = 1),
         |cbl AS (SELECT m, c, j, AVG(sv[j]) AS mv
         |  FROM bsub JOIN pqasg USING (vec_id, m),
         |    (SELECT unnest(range(1, 9)) AS j)
         |  GROUP BY 1, 2, 3),
         |cb AS (SELECT m, c, list(mv ORDER BY j) AS cv FROM cbl GROUP BY 1, 2),
         |enc0 AS (SELECT vec_id, m, c, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id, m
         |    ORDER BY ${subDistSql("sv", "cv")}, c) AS rn
         |  FROM sub JOIN cb USING (m)),
         |codes AS (SELECT vec_id, m, c FROM enc0 WHERE rn = 1),
         |dtab AS (SELECT s.vec_id AS q_id, s.m, cb.c,
         |    ${subDistSql("s.sv", "cb.cv")} AS dd
         |  FROM bsub s JOIN cb USING (m) WHERE s.vec_id < 5),
         |ad AS (SELECT dtab.q_id, codes.vec_id AS n_id, ROUND(SUM(dtab.dd), 6) AS adist
         |  FROM codes JOIN dtab ON codes.m = dtab.m AND codes.c = dtab.c
         |  WHERE codes.vec_id <> dtab.q_id
         |  GROUP BY 1, 2),
         |adctop AS (SELECT q_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS BIGINT) AS rank,
         |    n_id, adist
         |  FROM ad
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, n_id) <= 3)
         |SELECT 'pair' AS fam, d, a, b, score FROM prs WHERE score >= 0.95
         |UNION ALL SELECT 'ivf', rank, q_id, n_id, cos FROM ivf
         |UNION ALL SELECT 'adc', rank, q_id, n_id, adist FROM adctop""".stripMargin

  /** DuckDB replay of the stored-span incremental probe (#222, and
    * #212's treatment in `q_span_compacted` which composes a 2-day
    * chain): grid spans of corpus + batch, df over the union (batch's
    * own stored copies excluded by construction — the corpus CTE is
    * the pre-absorb indexed state), #73's per-doc stats restricted to
    * batch docs. The corpus/batch CTE bodies are parameters so the
    * compacted variant replays a two-day ingest with the SAME
    * machinery (the [[lshIncrementalOracle]] convention). */
  private def spanIncrementalOracle(corpusSql: String, batchSql: String): String =
      s"""WITH corpus AS ($corpusSql),
        |batch AS ($batchSql),
        |tc AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
        |xc AS (SELECT doc_id,
        |    md5(array_to_string(toks[(i*16 + 1):((i+1)*16)], ' ')) AS h
        |  FROM (SELECT doc_id, toks,
        |    unnest(range(0, CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS i FROM tc)),
        |tn AS (SELECT doc_id, string_split(text, ' ') AS toks FROM batch),
        |xn AS (SELECT doc_id,
        |    md5(array_to_string(toks[(i*16 + 1):((i+1)*16)], ' ')) AS h
        |  FROM (SELECT doc_id, toks,
        |    unnest(range(0, CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS i FROM tn)),
        |d AS (SELECT h, COUNT(*) AS df FROM
        |  (SELECT h FROM xc UNION ALL SELECT h FROM xn) GROUP BY 1)
        |SELECT xn.doc_id, COUNT(*) AS n_spans,
        |  CAST(SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        |  ROUND(CAST(SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS dup_frac
        |FROM xn JOIN d USING (h) GROUP BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_semdedup_incremental" -> semdedupIncrementalSql,
    "q_semdedup_scaled" -> semdedupScaledSql,
    "q_embedding_week" -> embeddingWeekSql,
    "q_substring_dedup_incremental" -> spanIncrementalOracle(
      "SELECT doc_id, text FROM documents",
      """SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    array_to_string(list_reverse(string_split(text, ' ')), ' ')
        |  FROM documents WHERE doc_id % 20 = 5""".stripMargin),
    // day-2 probe over the COMPACTED span chain: the indexed state is
    // corpus ∪ day-1 (the reversed plants), the batch is day-2 —
    // compaction must be invisible to the probe
    "q_span_compacted" -> spanIncrementalOracle(
      """SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string(list_reverse(string_split(text, ' ')), ' ')
        |  FROM documents WHERE doc_id % 10 = 0""".stripMargin,
      """SELECT doc_id + 2000000 AS doc_id,
        |    array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 20 = 5""".stripMargin),
    "q_ann_delete" -> annDeleteSql,
    "q_ann_ivf_stored" -> annIvfStoredSql,
    "q_bitext_mine_indexed" -> bitextIndexedSql,
    // the post-swap index IS a train-on-all build — same oracle
    "q_index_retrain_swap" -> annIvfStoredSql,
    "q_ann_ivf_incremental" -> annIvfIncrementalSql,
    // compaction must be invisible to readers: the compacted index
    // answers the SAME oracle as the chained one (#210 == #203's SQL)
    "q_ann_ivf_compacted" -> annIvfIncrementalSql,
    "q_pq_recall_trained" -> {
      def variant(rounds: Int): String =
        s"""codes$rounds AS (SELECT vec_id, m, c FROM (
           |    SELECT s.vec_id, s.m, p.c, ROW_NUMBER() OVER (
           |      PARTITION BY s.vec_id, s.m
           |      ORDER BY ${subDistSql("s.sv", "p.cv")}, p.c) AS rn
           |    FROM sub s JOIN p$rounds p USING (m)) WHERE rn = 1),
           |dtab$rounds AS (SELECT s.vec_id AS q_id, s.m, p.c,
           |    ${subDistSql("s.sv", "p.cv")} AS d
           |  FROM sub s JOIN p$rounds p USING (m) WHERE s.vec_id < 5),
           |ad$rounds AS (SELECT t.q_id, k.vec_id AS n_id, ROUND(SUM(t.d), 6) AS adist
           |  FROM codes$rounds k JOIN dtab$rounds t ON k.m = t.m AND k.c = t.c
           |  WHERE k.vec_id <> t.q_id GROUP BY 1, 2),
           |top$rounds AS (SELECT q_id, n_id FROM ad$rounds
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, n_id) <= 3),
           |r$rounds AS (SELECT CAST($rounds AS BIGINT) AS rounds, bf.q_id,
           |    COUNT(*) AS n_true,
           |    CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           |    ROUND(CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           |      / COUNT(*), 6) AS recall
           |  FROM bf LEFT JOIN top$rounds t ON bf.q_id = t.q_id AND bf.n_id = t.n_id
           |  GROUP BY 2)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sub AS (SELECT vec_id, m, v[(m*8 + 1):(m*8 + 8)] AS sv
         |  FROM e, (SELECT unnest(range(0, 8)) AS m)),
         |p0 AS (SELECT m, CAST(vec_id AS INT) AS c, sv AS cv
         |  FROM sub WHERE vec_id < 16),
         |${pqChain(3)},
         |bf AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id
         |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 5
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |    ORDER BY ROUND(list_sum(list_transform(range(1, 65),
         |      i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))), 6), b.vec_id) <= 3),
         |${variant(1)},
         |${variant(3)}
         |SELECT * FROM r1 UNION ALL SELECT * FROM r3""".stripMargin
    },
    "q_ivf_recall_trained" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |x0 AS (SELECT label AS cid, CAST(i AS BIGINT) AS dim, v[i] AS val
         |  FROM e, UNNEST(range(1, 65)) AS t(i)),
         |g0 AS (SELECT cid, dim, ROUND(AVG(val), 6) AS centroid FROM x0 GROUP BY 1, 2),
         |c0 AS (SELECT cid, list(centroid ORDER BY dim) AS cv FROM g0 GROUP BY 1),
         |${lloydChain(5)},
         |scored AS (
         |  SELECT e.vec_id, e.v, c.cid,
         |    ${cosSql("e.v", "c.cv")} AS ccos
         |  FROM e, c5 c),
         |assigned AS (
         |  SELECT vec_id, v, cid AS bucket FROM scored
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, cid AS bucket FROM scored
         |  WHERE vec_id < 5
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) <= 2),
         |pairs AS (
         |  SELECT p.q_id, c.vec_id AS n_id,
         |    ${cosSql("qe.v", "c.v")} AS cos
         |  FROM probes p
         |  JOIN e qe ON qe.vec_id = p.q_id
         |  JOIN assigned c ON c.bucket = p.bucket AND c.vec_id <> p.q_id),
         |ivf AS (
         |  SELECT q_id, n_id FROM pairs
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) <= 3),
         |bf AS (
         |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         |    ${cosSql("a.v", "b.v")} AS cos
         |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 5
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY cos DESC, b.vec_id) <= 3)
         |SELECT bf.q_id, COUNT(*) AS n_true,
         |  CAST(SUM(CASE WHEN i.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |  ROUND(CAST(SUM(CASE WHEN i.n_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*), 6) AS recall
         |FROM bf LEFT JOIN ivf i ON bf.q_id = i.q_id AND bf.n_id = i.n_id
         |GROUP BY 1""".stripMargin,
    "q_dedup_lsh_incremental" -> lshIncrementalOracle(
      "SELECT doc_id, text FROM documents",
      """SELECT doc_id + 1000000 AS doc_id, text || ' near dup probe' AS text
        |  FROM documents WHERE doc_id % 10 = 0""".stripMargin),
    // the post-swap probe answers the SAME incremental oracle, but
    // replayed under the NEW banding (2 bands × 4 rows)
    "q_lsh_retrain_swap" -> lshIncrementalOracle(
      "SELECT doc_id, text FROM documents",
      """SELECT doc_id + 1000000 AS doc_id, text || ' near dup probe' AS text
        |  FROM documents WHERE doc_id % 10 = 0""".stripMargin,
      rowsPerBand = 4),
    "q_curation_week" -> curationWeekOracleSql,
    // the CONTENDED week answers the UNCONTENDED week's oracle
    // verbatim: racing nightly maintenance against daily ingest must
    // not change the curated corpus by a single row
    "q_curation_week_contended" -> curationWeekOracleSql,
    "q_lsh_drift" -> lshDriftOracle(
      "SELECT doc_id, text FROM documents",
      """SELECT doc_id + 1000000 AS doc_id, text || ' near dup probe' AS text
        |  FROM documents WHERE doc_id % 10 = 0""".stripMargin),
    "q_dedup_lsh_chained" -> lshIncrementalOracle(
      """SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' near dup probe'
        |  FROM documents WHERE doc_id % 10 = 0""".stripMargin,
      """SELECT doc_id + 2000000 AS doc_id,
        |    text || ' near dup probe again' AS text
        |  FROM documents WHERE doc_id % 10 = 0""".stripMargin),
    // deletion must make the docs vanish from every probe: the day-2
    // oracle corpus is exactly "indexed minus deleted", as if the
    // deleted docs had never existed
    "q_corpus_delete" -> lshIncrementalOracle(
      """SELECT doc_id, text FROM documents WHERE doc_id % 40 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' near dup probe'
        |  FROM documents WHERE doc_id % 10 = 0 AND doc_id % 30 <> 0""".stripMargin,
      """SELECT doc_id + 2000000 AS doc_id,
        |    text || ' near dup probe again' AS text
        |  FROM documents WHERE doc_id % 10 = 0""".stripMargin),
    // the compacted gate answers the CHAINED oracle verbatim —
    // compaction must be invisible to every reader
    "q_dedup_lsh_compacted" -> lshIncrementalOracle(
      """SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' near dup probe'
        |  FROM documents WHERE doc_id % 10 = 0""".stripMargin,
      """SELECT doc_id + 2000000 AS doc_id,
        |    text || ' near dup probe again' AS text
        |  FROM documents WHERE doc_id % 10 = 0""".stripMargin),
    "q_index_drift" ->
      s"""WITH ea AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |e AS (SELECT * FROM ea WHERE vec_id % 10 <> 7),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
         |${lloydChain(2)},
         |sf AS (
         |  SELECT ea.vec_id,
         |    ${cosSql("ea.v", "c.cv")} AS ccos
         |  FROM ea, c2 c),
         |best AS (SELECT vec_id, MAX(ccos) AS bc FROM sf GROUP BY 1),
         |bb AS (SELECT ROUND(AVG(bc), 6) AS mean_ccos_build FROM best
         |  WHERE vec_id % 10 <> 7),
         |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
         |    ROUND(AVG(bc), 6) AS mean_ccos_batch FROM best
         |  WHERE vec_id % 10 = 7)
         |SELECT n_batch, mean_ccos_batch, mean_ccos_build,
         |  ROUND(mean_ccos_build - mean_ccos_batch, 6) AS drift
         |FROM nb, bb""".stripMargin,
    "q_ann_pq_incremental" -> annPqIncrementalOracleSql,
    // the compacted codes chain answers the SAME oracle as the
    // chained one — compaction must be invisible to every reader
    "q_ann_pq_compacted" -> annPqIncrementalOracleSql,
    "q_bitext_mine" ->
      s"""WITH lg AS (SELECT doc_id AS vec_id, lang FROM documents),
         |e AS (SELECT e0.vec_id, CAST(e0.embedding AS DOUBLE[]) AS v, lg.lang
         |  FROM embeddings e0 JOIN lg USING (vec_id)),
         |en AS (SELECT vec_id, v FROM e WHERE lang = 'en'),
         |de AS (SELECT vec_id, v FROM e WHERE lang = 'de'),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM en WHERE vec_id < 50),
         |fs AS (SELECT q.q_id, de.vec_id AS n_id,
         |    ${cosSql("q.qv", "de.v")} AS cos
         |  FROM q, de),
         |fwd AS (SELECT q_id, n_id, cos FROM fs
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) <= 4),
         |xm AS (SELECT q_id, ROUND(AVG(cos), 6) AS xm FROM fwd GROUP BY 1),
         |ys AS (SELECT DISTINCT n_id FROM fwd),
         |rs AS (SELECT ys.n_id, en.vec_id AS b_id,
         |    ${cosSql("de.v", "en.v")} AS cos
         |  FROM ys JOIN de ON de.vec_id = ys.n_id, en),
         |rev AS (SELECT n_id, b_id, cos FROM rs
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY n_id ORDER BY cos DESC, b_id) <= 4),
         |ym AS (SELECT n_id, ROUND(AVG(cos), 6) AS ym FROM rev GROUP BY 1)
         |SELECT fwd.q_id AS en_id, fwd.n_id AS de_id, fwd.cos,
         |  ROUND(fwd.cos / ((xm.xm + ym.ym) / 2.0), 6) AS margin_score
         |FROM fwd JOIN xm USING (q_id) JOIN ym USING (n_id)
         |ORDER BY margin_score DESC, en_id, de_id
         |LIMIT 20""".stripMargin
  )

  /** DuckDB replay of #208 (and #215, which must answer it
    * unchanged): train the PQ codebook on the base corpus, encode ALL
    * vectors against it (≡ build ∪ absorb — both encode against the
    * same stored codebook), ADC top-3. */
  private lazy val annPqIncrementalOracleSql: String =
      """WITH ea AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sub AS (SELECT vec_id, m, v[(m*8 + 1):(m*8 + 8)] AS sv
        |  FROM ea, (SELECT unnest(range(0, 8)) AS m)),
        |bsub AS (SELECT * FROM sub WHERE vec_id % 10 <> 7),
        |seeds AS (SELECT m, CAST(vec_id AS INT) AS c, sv AS cv
        |  FROM bsub WHERE vec_id < 16),
        |a0 AS (SELECT vec_id, m, c, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id, m
        |    ORDER BY list_sum(list_transform(range(1, 9),
        |      j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))), c) AS rn
        |  FROM bsub JOIN seeds USING (m)),
        |asg AS (SELECT vec_id, m, c FROM a0 WHERE rn = 1),
        |cbl AS (SELECT m, c, j, AVG(sv[j]) AS mv
        |  FROM bsub JOIN asg USING (vec_id, m),
        |    (SELECT unnest(range(1, 9)) AS j)
        |  GROUP BY 1, 2, 3),
        |cb AS (SELECT m, c, list(mv ORDER BY j) AS cv FROM cbl GROUP BY 1, 2),
        |enc0 AS (SELECT vec_id, m, c, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id, m
        |    ORDER BY list_sum(list_transform(range(1, 9),
        |      j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))), c) AS rn
        |  FROM sub JOIN cb USING (m)),
        |codes AS (SELECT vec_id, m, c FROM enc0 WHERE rn = 1),
        |dtab AS (SELECT s.vec_id AS q_id, s.m, cb.c,
        |    list_sum(list_transform(range(1, 9),
        |      j -> (s.sv[j] - cb.cv[j]) * (s.sv[j] - cb.cv[j]))) AS d
        |  FROM sub s JOIN cb USING (m) WHERE s.vec_id < 5),
        |ad AS (SELECT dtab.q_id, codes.vec_id, ROUND(SUM(dtab.d), 6) AS adist
        |  FROM codes JOIN dtab ON codes.m = dtab.m AND codes.c = dtab.c
        |  WHERE codes.vec_id <> dtab.q_id
        |  GROUP BY 1, 2),
        |r AS (SELECT q_id, vec_id, adist, ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY adist, vec_id) AS rank FROM ad)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id AS n_id, adist
        |FROM r WHERE rank <= 3""".stripMargin
}
