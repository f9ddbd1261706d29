package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity: cosine primitives, brute-force top-k ANN
  * baseline, and an axis-sign LSH bucketing scale path.
  *
  * All vector math runs in double via higher-order array functions —
  * sequential fold, so results are bit-reproducible across engines.
  * The brute-force path is explicitly bounded by the query-set size;
  * the bucketed path keeps the candidate join bucket-local.
  */
object Embeddings {

  /** float[] → double[] (controls precision before any arithmetic). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Higher-order-function cosine: kept as the reference/fallback
    * implementation; bit-equal to [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Native codegen cosine ([[graft.plans.CosineSimilarity]]) — the
    * production kernel. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarity(a, b)

  /** Brute-force cosine top-k: each query vector against the full
    * corpus. The cross join is bounded by the (small) query set — the
    * corpus streams through scan-local; ranking uses the bounded
    * [[graft.plans.TopKAgg]] aggregate, so each map task emits at most
    * k candidates per query to the shuffle instead of every scored
    * row (the window formulation would shuffle and sort them all). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val scored = queries
      .crossJoin(corpus)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"),
        round(cosine(col("qv"), col("nv")), 6).as("cos"), col("n_id"))
      .as[(Long, Double, Long)]
    scored
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(k).toColumn)
      .flatMap { case (q, top) =>
        top.zipWithIndex.map { case ((cos, n), i) => (q, (i + 1).toLong, n, cos) }
      }
      .toDF("q_id", "rank", "n_id", "cos")
  }

  /** Window-ranked reference formulation of [[bruteForceTopK]]
    * (identical output; kept for comparison/testing). */
  def bruteForceTopKWindow(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = queries
      .crossJoin(corpus)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }

  /** IVF search with MULTI-PROBE: assign every corpus vector to its
    * nearest centroid (small broadcast cross-score + max_by), have each
    * query probe its `nprobe` nearest centroid buckets, and rank the
    * union of probed candidates per query. The centroid set is the
    * coarse quantizer (here: per-label means); at scale the bucket
    * restriction turns an O(corpus) scan per query into
    * O(nprobe × corpus / #buckets). nprobe=2 recovers the recall
    * nprobe=1 loses on vectors near a centroid boundary for ~2× the
    * candidate cost — still bucket-local, the corpus never shuffles
    * (the tiny query probe set broadcasts to it).
    *
    * @param centroids long-format (label, dim, centroid) frame with
    *                  dims 1..d, centroid values pre-rounded so
    *                  assignment is reproducible
    */
  def ivfTopK(
      vectors: DataFrame, centroids: DataFrame, queryMaxId: Long, k: Int,
      nprobe: Int = 2): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val centArr = centroids
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        x => x.getField("centroid")).as("cv"))
    val scored = vectors
      .crossJoin(broadcast(centArr))
      .withColumn("ccos", round(cosine(col("v"), col("cv")), 6))
    // nearest-centroid assignment as a hash aggregate (max_by with a
    // (ccos, -label) tie-break = highest score, then lowest label) —
    // combines map-side; the window formulation would shuffle and sort
    // every (vector × centroid) row by vec_id instead
    val assigned = scored
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("label"), col("v")),
        struct(col("ccos"), negate(col("label")))).as("a"))
      .select(col("vec_id"), col("a.v").as("v"), col("a.label").as("bucket"))
    // probe set: each query's nprobe best centroids, via the same
    // bounded TopKAgg (ordering (score desc, label asc) matches the
    // assignment tie-break, so probe #1 IS the home bucket)
    val probes = scored
      .filter(col("vec_id") < queryMaxId)
      .select(col("vec_id"), col("ccos"), col("label").cast("long").as("lbl"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(nprobe).toColumn)
      .flatMap { case (q, top) => top.map { case (_, lbl) => (q, lbl) } }
      .toDF("q_id", "bucket")
    val q = assigned.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val qprobe = probes.join(q, Seq("q_id"))
    val c = assigned
      .select(col("vec_id").as("n_id"), col("v").as("nv"),
        col("bucket").cast("long").as("bucket"))
    // candidates: corpus rows stream past the BROADCAST probe set —
    // a neighbor appears at most once per query (one home bucket), so
    // the probed union needs no dedup; ranking is global per query via
    // the bounded map-side TopKAgg (k rows per query reach the shuffle)
    broadcast(qprobe).join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"),
        round(cosine(col("qv"), col("nv")), 6).as("cos"), col("n_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(k).toColumn)
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case ((cs, n), i) => (qid, (i + 1).toLong, n, cs) }
      }
      .toDF("q_id", "rank", "n_id", "cos")
  }

  /** Trained k-means: `iters` Lloyd rounds from an explicit seed
    * centroid frame — the multi-iteration form of `q_kmeans_iter`'s
    * single documented round (re-feed the output as the next seed
    * set). Feeds the stored IVF index ([[VectorIndex]]) and the
    * trained-recall report with centroids that have actually
    * converged toward the data, instead of label means.
    *
    * Determinism: assignment scores round to 6dp before the max_by
    * (tie-break lowest cid), and each round's means round to 6dp —
    * so a SQL oracle replaying the same rounds re-syncs with this
    * plan at every iteration boundary and float summation order can
    * never drift the trajectory.
    *
    * Scale shape per round: centroids BROADCAST against one corpus
    * scan; assignment is a map-side max_by hash agg; the mean
    * recompute is [[graft.plans.VecSumAgg]] (one (sums, n) row per
    * centroid crosses the shuffle, never per-dimension rows);
    * `localCheckpoint` truncates the lineage so round r+1's plan
    * does not replay rounds 1..r.
    *
    * @param vectors (vec_id, v) corpus
    * @param seeds   (cid, cv) initial centroids (tiny)
    * @return (cid, cv) trained centroids, means rounded to 6dp
    */
  def lloyd(vectors: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    var cents = seeds
    for (_ <- 1 to iters) {
      val scored = vectors.crossJoin(broadcast(cents))
        .withColumn("ccos", round(cosine(col("v"), col("cv")), 6))
      val assigned = scored
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cid"), col("v")),
          struct(col("ccos"), negate(col("cid")))).as("a"))
        .select(col("a.cid").as("cid"), col("a.v").as("v"))
      val centLong = assigned.as[(Int, Array[Double])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(graft.plans.VecSumAgg.toColumn)
        .flatMap { case (cid, acc) =>
          acc.sum.zipWithIndex.map { case (sm, i) =>
            (cid, (i + 1).toLong, sm / acc.n)
          }
        }
        .toDF("cid", "dim", "centroid")
        .withColumn("centroid", round(col("centroid"), 6))
      cents = centLong
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("centroid")))),
          x => x.getField("centroid")).as("cv"))
        .localCheckpoint()
    }
    cents
  }

  /** Seed frame for [[lloyd]]: the corpus vectors with vec_id < k
    * (the `q_kmeans_iter` seeding convention). */
  def idSeeds(vectors: DataFrame, k: Int): DataFrame =
    vectors.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))

  /** Axis-sign LSH bucket id: sign bits of the first `bits` dims.
    * A degenerate-but-deterministic random-hyperplane LSH (the
    * hyperplanes are the coordinate axes); bucket-local search then
    * bounds the candidate set at scale. */
  def signBucket(v: Column, bits: Int = 8): Column =
    concat((1 to bits).map(i =>
      when(element_at(v, i) >= 0, "1").otherwise("0")): _*)

  /** Bucket id with bit `i` (1-based) flipped — the Hamming-distance-1
    * probe set for multi-probe LSH: querying the home bucket plus its
    * `bits` single-bit neighbors recovers most of the recall a single
    * sign-bucket lookup loses at the hyperplane boundaries, while the
    * candidate set stays (bits+1)/2^bits of the corpus. */
  def flipBit(bucket: Column, i: Int): Column =
    concat(
      substring(bucket, 1, i - 1),
      when(substring(bucket, i, 1) === "1", "0").otherwise("1"),
      substring(bucket, i + 1, 64))
}
