package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.similarity.Embeddings
import graft.sources.Tables

/** Training-data preparation batch F (SURVEY §2 #200-202): the IVF
  * tuning sweep (the #194 sweep discipline applied to the vector
  * index), cluster-capped diversity sampling, and per-source score
  * quantile normalization.
  */
object TrainingF {

  /** #200 IVF NPROBE SWEEP — the vector-index twin of #194's LSH
    * banding sweep: recall@3 of the label-seeded IVF index against
    * brute-force truth for nprobe ∈ {1,2,4}, the cost/recall curve an
    * index owner reads before fixing the production probe count
    * (nprobe buckets scanned per query ∝ cost; recall recovered at
    * bucket boundaries is the return).
    *
    * Scale shape: truth is the bounded 5-probe brute pass
    * (localCheckpoint'd once, shared by all three configs);
    * each config is [[Embeddings.ivfTopK]] — assignment broadcast
    * cross-score, bucket-local candidates, bounded map-side top-k;
    * the recall join is 15 rows per config. */
  def ivfNprobeSweep(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
        Embeddings.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("n_id"),
      Embeddings.asDouble(col("embedding")).as("nv"))
    val truth = Embeddings.bruteForceTopK(q, c, 3)
      .select(col("q_id"), col("n_id")).localCheckpoint()
    val vecs = e.select(col("vec_id"),
      Embeddings.asDouble(col("embedding")).as("v"))
    val cents = Extras.embeddingCentroids(s, dir).localCheckpoint()
    Seq(1, 2, 4).map { np =>
      val approx = Embeddings
        .ivfTopK(vecs, cents, queryMaxId = 5L, k = 3, nprobe = np)
        .select(col("q_id"), col("n_id"))
      val hits = truth.join(approx, Seq("q_id", "n_id"))
        .agg(count(lit(1)).as("n_hits"))
      truth.agg(count(lit(1)).as("n_true")).crossJoin(hits)
        .select(lit(np).cast("long").as("nprobe"), col("n_true"),
          col("n_hits"),
          round(col("n_hits").cast("double") / col("n_true"), 6)
            .as("recall_at_3"))
    }.reduce(_ unionByName _)
  }

  /** #201 CLUSTER-CAPPED DIVERSITY SAMPLE — cap each embedding
    * cluster at 20 kept vectors (the cluster-balanced selection step
    * of diversity-first curation: a mega-cluster of near-identical
    * content cannot crowd out the tail). Assignment is the
    * label-seeded quantizer (#198's); WITHIN each cluster the keep
    * set is the deterministic md5-hash order (#92's sampling idiom —
    * reproducible, no rand()), selected by the bounded map-side
    * [[graft.plans.TopKAgg]] so only ≤20 rows per cluster cross the
    * shuffle. */
  def clusterSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 20
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
    val centArr = Extras.embeddingCentroids(s, dir)
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        x => x.getField("centroid")).as("cv"))
    val assigned = e.crossJoin(broadcast(centArr))
      .withColumn("ccos", round(Embeddings.cosine(col("v"), col("cv")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("label"), struct(col("ccos"), negate(col("label"))))
        .as("bucket"))
    val h = md5(concat(col("vec_id").cast("string"), lit(":cluster")))
    val hex = "0123456789abcdef"
    val hv = (1 to 8).map(i =>
      (instr(lit(hex), substring(h, i, 1)) - 1).cast("double")
        * math.pow(16, 8 - i)).reduce(_ + _)
    assigned
      .select(col("bucket").cast("long"), (-hv).as("score"),
        col("vec_id").cast("long"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.plans.TopKAgg(k).toColumn)
      .flatMap { case (bucket, top) =>
        top.zipWithIndex.map { case ((_, id), i) => (bucket, (i + 1).toLong, id) }
      }
      .toDF("bucket", "rank", "vec_id")
  }

  /** #202 PER-SOURCE SCORE QUANTILE NORMALIZATION — each document's
    * quality score replaced by its within-source percent rank, so one
    * threshold means the same strictness in every domain (a raw-score
    * threshold keeps 80% of a clean source and 5% of a noisy one;
    * rank-normalized filtering is the standard correction).
    *
    * Scale shape: percent_rank is NOT computed as a per-source window
    * over the documents (a single source's docs would sort in ONE
    * task — the #87 single-partition-window trap); instead the
    * cumulative counts run over the (source, DISTINCT score) frame —
    * bounded by score resolution (≤10^6 rows per source at 6dp), not
    * by corpus size — and join back to the docs SHUFFLE_HASH on the
    * same key. percent_rank = n_lt/(n−1) with exact integer counts,
    * so the doubles agree bit-for-bit with the oracle's built-in
    * PERCENT_RANK (an independent formulation of the same value). */
  def scoreNorm(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), Training.qualityScore.as("score"))
    val hist = scored.groupBy(col("source"), col("score"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("score"))
    val cum = hist.withColumn("n_lt", sum(col("c")).over(w) - col("c"))
    val ns = scored.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    scored
      .join(cum.hint("shuffle_hash"), Seq("source", "score"))
      .join(broadcast(ns), Seq("source"))
      .select(col("doc_id"), col("source"), col("score"),
        when(col("n_src") === 1, lit(0.0))
          .otherwise(round(col("n_lt").cast("double") / (col("n_src") - 1), 6))
          .as("pct_rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ivf_nprobe_sweep" -> ivfNprobeSweep _,
    "q_cluster_sample"   -> clusterSample _,
    "q_score_norm"       -> scoreNorm _)

  private def cosSql(a: String, b: String): String =
    s"""ROUND(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
       |  / (sqrt(list_sum(list_transform($a, y -> y*y)))
       |     * sqrt(list_sum(list_transform($b, y -> y*y)))), 6)""".stripMargin

  /** Shared label-mean centroid + assignment CTEs (the #57 oracle's
    * assignment replayed). */
  private val assignCte =
    s"""e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |x AS (SELECT label, CAST(i AS BIGINT) AS dim, v[i] AS val
       |  FROM e, UNNEST(range(1, 65)) AS t(i)),
       |cent AS (SELECT label, dim, ROUND(AVG(val), 6) AS centroid
       |  FROM x GROUP BY 1, 2),
       |ca AS (SELECT label, list(centroid ORDER BY dim) AS cv
       |  FROM cent GROUP BY 1),
       |scored AS (SELECT e.vec_id, e.v, ca.label,
       |    ${cosSql("e.v", "ca.cv")} AS ccos
       |  FROM e, ca),
       |assigned AS (SELECT vec_id, v, label AS bucket FROM scored
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY ccos DESC, label) = 1)""".stripMargin

  /** One IVF top-3 config at a given nprobe, as CTEs named with the
    * given prefix (consumes the [[assignCte]] names). */
  private def ivfCte(p: String, nprobe: Int): String =
    s"""${p}_probes AS (SELECT vec_id AS q_id, label AS bucket FROM scored
       |  WHERE vec_id < 5
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY ccos DESC, label) <= $nprobe),
       |${p}_pairs AS (SELECT pr.q_id, c.vec_id AS n_id,
       |    ${cosSql("qe.v", "c.v")} AS cos
       |  FROM ${p}_probes pr
       |  JOIN e qe ON qe.vec_id = pr.q_id
       |  JOIN assigned c ON c.bucket = pr.bucket AND c.vec_id <> pr.q_id),
       |$p AS (SELECT q_id, n_id FROM ${p}_pairs
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, n_id) <= 3)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ivf_nprobe_sweep" ->
      (s"WITH $assignCte,\n" +
        s"""truth_sc AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |    ${cosSql("a.v", "b.v")} AS cos
           |  FROM e a, e b WHERE a.vec_id < 5 AND a.vec_id <> b.vec_id),
           |truth AS (SELECT q_id, n_id FROM truth_sc
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, n_id) <= 3),
           |${ivfCte("np1", 1)},
           |${ivfCte("np2", 2)},
           |${ivfCte("np4", 4)},
           |nt AS (SELECT COUNT(*) AS n_true FROM truth),
           |h1 AS (SELECT COUNT(*) AS n_hits FROM truth JOIN np1 USING (q_id, n_id)),
           |h2 AS (SELECT COUNT(*) AS n_hits FROM truth JOIN np2 USING (q_id, n_id)),
           |h4 AS (SELECT COUNT(*) AS n_hits FROM truth JOIN np4 USING (q_id, n_id))
           |SELECT CAST(1 AS BIGINT) AS nprobe, n_true, n_hits,
           |  ROUND(CAST(n_hits AS DOUBLE) / n_true, 6) AS recall_at_3
           |FROM nt, h1
           |UNION ALL SELECT 2, n_true, n_hits,
           |  ROUND(CAST(n_hits AS DOUBLE) / n_true, 6) FROM nt, h2
           |UNION ALL SELECT 4, n_true, n_hits,
           |  ROUND(CAST(n_hits AS DOUBLE) / n_true, 6) FROM nt, h4""".stripMargin),
    "q_cluster_sample" -> {
      val weights = Seq(268435456L, 16777216L, 1048576L, 65536L, 4096L, 256L, 16L, 1L)
      val terms = weights.zipWithIndex.map { case (wt, i) =>
        s"(strpos('0123456789abcdef', substr(hh, ${i + 1}, 1)) - 1) * $wt"
      }.mkString("\n|    + ")
      s"WITH $assignCte,\n" +
        s"""h AS (SELECT vec_id, bucket,
           |  md5(CAST(vec_id AS VARCHAR) || ':cluster') AS hh FROM assigned),
           |v AS (SELECT vec_id, bucket,
           |    $terms AS hv
           |  FROM h),
           |r AS (SELECT vec_id, bucket,
           |  ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY hv, vec_id) AS rank
           |  FROM v)
           |SELECT bucket, CAST(rank AS BIGINT) AS rank, vec_id
           |FROM r WHERE rank <= 20""".stripMargin
    },
    "q_score_norm" ->
      """WITH f AS (SELECT doc_id, source, string_split(text, ' ') AS tk
        |  FROM documents),
        |x AS (SELECT doc_id, source,
        |    LEAST(CAST(LEN(tk) AS DOUBLE) / 100.0, 2.0) AS x1,
        |    CAST(LEN(list_filter(tk, t -> t IN
        |      ('the','a','of','to','and','in','is','it','on','for')))
        |      AS DOUBLE) / LEN(tk) AS x2,
        |    CAST(LEN(list_distinct(tk)) AS DOUBLE) / LEN(tk) AS x3,
        |    (CAST(list_sum(list_transform(tk, t -> LEN(t))) AS DOUBLE)
        |      / LEN(tk)) / 10.0 AS x4
        |  FROM f),
        |sc AS (SELECT doc_id, source, ROUND(1.0 / (1.0 + exp(
        |    -ROUND(0.8*x1 + 3.0*x2 + 1.5*x3 - 0.6*x4 - 1.2, 6))), 6)
        |    AS score FROM x)
        |SELECT doc_id, source, score,
        |  ROUND(PERCENT_RANK() OVER (PARTITION BY source ORDER BY score), 6)
        |    AS pct_rank
        |FROM sc""".stripMargin)
}
