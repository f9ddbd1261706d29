package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** STORED vector index — the build-once / query-many shape of the
  * inline ANN operators (`q_ann_ivf`, `q_ann_pq`), with
  * [[graft.dedup.BloomIndex]]'s production discipline applied to
  * vectors: a nightly job trains the index from the corpus ONCE and
  * persists it as [[Snapshots]]-versioned artifacts; every subsequent
  * query loads the artifacts instead of re-running the training
  * aggregation over 100 TB of embeddings.
  *
  * Artifacts under an index root:
  *  - `centroids`:   (cid, cv) — the trained coarse quantizer
  *    ([[Embeddings.lloyd]] from id-seeds), KB-scale.
  *  - `assignments`: (vec_id, v, bucket) — every corpus vector with
  *    its nearest-centroid bucket, written with hive-style `bucket=`
  *    partition directories so a probe-set filter prunes whole
  *    directories (PartitionFilters in the scan): per-query I/O is
  *    probe-bucket-sized, not corpus-sized.
  *  - `pq_codebook`: (m, c, cv) — per-subspace PQ codebook (M×K rows).
  *  - `pq_codes`:    (vec_id, m, c) — the corpus as codes: the 100 TB
  *    float corpus compressed ~32× for ADC scanning.
  *
  * Versioning, rollback, idempotent re-commit and vacuum come from
  * [[Snapshots]]; a rebuild commits v+1 while readers of v are
  * untouched.
  */
object VectorIndex {

  /** Bump when build semantics change: a [[defaultRoot]] from an older
    * layout can then never be silently reused. */
  val layoutVersion = 1

  def centroidsRoot(root: String): String = s"$root/centroids"
  def assignmentsRoot(root: String): String = s"$root/assignments"
  def pqCodebookRoot(root: String): String = s"$root/pq_codebook"
  def pqCodesRoot(root: String): String = s"$root/pq_codes"

  /** Deterministic index root for a corpus: keyed on an
    * order-independent content fingerprint of the vectors (so an
    * index from DIFFERENT data at the same path is never reused), the
    * build params, and [[layoutVersion]]. The fingerprint aggregate is
    * one map-side-combined scan of the (small) embeddings table. */
  def defaultRoot(raw: DataFrame, seedK: Int, iters: Int): String = {
    // bit_xor: order-independent like sum, but cannot overflow under
    // ANSI arithmetic
    val fp = raw.agg(
      bit_xor(xxhash64(col("vec_id"), col("embedding"))).as("h"),
      count(lit(1)).as("n")).head()
    s"/tmp/graft-vecindex/v$layoutVersion/k$seedK-i$iters-${fp.getLong(0)}-${fp.getLong(1)}"
  }

  // ---------------------------------------------------------------- IVF

  /** Train the coarse quantizer ([[Embeddings.lloyd]], seeds =
    * vec_id < seedK) and assign every corpus vector to its
    * max-cosine trained centroid (score rounded 6dp, tie-break lowest
    * cid — the `q_ann_ivf` convention, so a SQL oracle replays it
    * exactly). Commits both artifacts; returns
    * (centroidsVersion, assignmentsVersion). */
  def build(vectors: DataFrame, root: String, seedK: Int = 8, iters: Int = 2): (Long, Long) = {
    val cents = Embeddings.lloyd(vectors, Embeddings.idSeeds(vectors, seedK), iters)
    val assigned = vectors.crossJoin(broadcast(cents))
      .withColumn("ccos", round(Embeddings.cosine(col("v"), col("cv")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("v")),
        struct(col("ccos"), negate(col("cid")))).as("a"))
      .select(col("vec_id"), col("a.v").as("v"), col("a.cid").as("bucket"))
    val cv = Snapshots.commit(cents, centroidsRoot(root))
    val av = Snapshots.commitPartitioned(assigned, assignmentsRoot(root), Seq("bucket"))
    (cv, av)
  }

  /** Idempotent build: a no-op when both artifacts already have a
    * committed version under `root` (the nightly-job contract — a
    * retried run never retrains). */
  def buildIfAbsent(vectors: DataFrame, root: String, seedK: Int = 8, iters: Int = 2): Unit =
    if (Snapshots.latestVersion(centroidsRoot(root)).isEmpty ||
        Snapshots.latestVersion(assignmentsRoot(root)).isEmpty) {
      build(vectors, root, seedK, iters); ()
    }

  /** Multi-probe IVF top-k over the STORED index. NO training
    * aggregate appears in this plan: centroids load from their
    * snapshot (KB-scale — collected to compute the probe set, like
    * any broadcast-var build), and the assignments scan carries a
    * `bucket IN (probes)` filter on the partition column, so whole
    * non-probed directories are pruned and per-query I/O is
    * probe-bucket-sized.
    *
    * @param queries (q_id, qv) query frame (small by contract)
    */
  def ivfTopKStored(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    import spark.implicits._
    val cents = Snapshots.read(spark, centroidsRoot(root))
    // probe set: |queries| × K scored rows — bounded scalar reduction
    // (each query keeps nprobe buckets); the driver-side collect is
    // what turns the probe list into a partition filter below
    val probes: Array[(Long, List[Long])] = queries.crossJoin(broadcast(cents))
      .select(col("q_id"),
        round(Embeddings.cosine(col("qv"), col("cv")), 6).as("ccos"),
        col("cid").cast("long").as("cid"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(nprobe).toColumn)
      .map { case (q, top) => (q, top.map(_._2)) }
      .collect()
    val qprobe = broadcast(
      probes.toSeq.flatMap { case (q, bs) => bs.map(b => (q, b.toInt)) }
        .toDF("q_id", "bucket")
        .join(queries, Seq("q_id")))
    val buckets = probes.flatMap(_._2).distinct.map(_.toInt)
    val cand = Snapshots.read(spark, assignmentsRoot(root))
      .filter(col("bucket").isin(buckets: _*))
    // a neighbor appears at most once per query (one home bucket), so
    // the probed union needs no dedup; ranking via the bounded
    // map-side TopKAgg — k rows per query reach the shuffle
    cand.join(qprobe, Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"),
        round(Embeddings.cosine(col("qv"), col("v")), 6).as("cos"),
        col("vec_id").as("n_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(k).toColumn)
      .flatMap { case (q, top) =>
        top.zipWithIndex.map { case ((cs, n), i) => (q, (i + 1).toLong, n, cs) }
      }
      .toDF("q_id", "rank", "n_id", "cos")
  }

  // ----------------------------------------------------------------- PQ

  private val (pqM, pqK, pqSub) = (8, 16, 8)

  private def subVectors(vectors: DataFrame): DataFrame =
    vectors.select(col("vec_id"),
      explode(array((0 until pqM).map(m =>
        struct(lit(m).as("m"), slice(col("v"), m * pqSub + 1, pqSub).as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Train the PQ codebook (seed sub-vectors = vec_id < K, one Lloyd
    * round — the `q_ann_pq` recipe verbatim) and encode the corpus;
    * commits both artifacts and returns
    * (codebookVersion, codesVersion). The stored codes are the
    * at-scale payoff: the float corpus never needs to be re-read to
    * answer an ADC query. */
  def buildPq(vectors: DataFrame, root: String): (Long, Long) = {
    val sub = subVectors(vectors)
    val seeds = sub.filter(col("vec_id") < pqK)
      .select(col("m"), col("vec_id").cast("int").as("c"), col("sv").as("cv"))
    val a0 = sub.join(broadcast(seeds), "m")
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(dist2(col("sv"), col("cv")).as("d"), col("c"))).as("mn"))
      .select(col("vec_id"), col("m"), col("mn.c").as("c"))
    val dimMeans = (0 until pqSub).map(j =>
      avg(element_at(col("sv"), j + 1)).as(s"s$j"))
    val cb = sub.join(a0.hint("shuffle_hash"), Seq("vec_id", "m"))
      .groupBy(col("m"), col("c"))
      .agg(dimMeans.head, dimMeans.tail: _*)
      .select(col("m"), col("c"),
        array((0 until pqSub).map(j => col(s"s$j")): _*).as("cv"))
      .localCheckpoint() // feeds both the commit and the encode below
    val codes = sub.join(broadcast(cb), "m")
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(dist2(col("sv"), col("cv")).as("d"), col("c"))).as("mn"))
      .select(col("vec_id"), col("m"), col("mn.c").as("c"))
    val cbv = Snapshots.commit(cb, pqCodebookRoot(root))
    val cdv = Snapshots.commit(codes, pqCodesRoot(root))
    (cbv, cdv)
  }

  /** Idempotent [[buildPq]] (no-op when both artifacts exist). */
  def buildPqIfAbsent(vectors: DataFrame, root: String): Unit =
    if (Snapshots.latestVersion(pqCodebookRoot(root)).isEmpty ||
        Snapshots.latestVersion(pqCodesRoot(root)).isEmpty) {
      buildPq(vectors, root); ()
    }

  /** ADC top-k over the STORED codes: the per-query (M×K) distance
    * table is built against the stored codebook (tiny, broadcast) and
    * the corpus moves as codes only — no float vector is read outside
    * the query frame. Ranking on the ROUNDED summed distance with the
    * `q_ann_pq` tie-break, via the bounded map-side TopKAgg. */
  def adcTopKStored(spark: SparkSession, root: String, queries: DataFrame,
      k: Int): DataFrame = {
    import spark.implicits._
    val cb = Snapshots.read(spark, pqCodebookRoot(root))
    val codes = Snapshots.read(spark, pqCodesRoot(root))
    val dtab = subVectors(queries.select(col("q_id").as("vec_id"), col("v")))
      .select(col("vec_id").as("q_id"), col("m"), col("sv"))
      .join(broadcast(cb), "m")
      .select(col("q_id"), col("m"), col("c"), dist2(col("sv"), col("cv")).as("d"))
    codes.join(broadcast(dtab), Seq("m", "c"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(round(sum(col("d")), 6).as("adist"))
      .select(col("q_id"), (-col("adist")).as("score"), col("vec_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(k).toColumn)
      .flatMap { case (q, top) =>
        top.zipWithIndex.map { case ((score, id), i) =>
          (q, (i + 1).toLong, id, -score) }
      }
      .toDF("q_id", "rank", "n_id", "adist")
  }
}
