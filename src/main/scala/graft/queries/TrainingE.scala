package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.similarity.Embeddings
import graft.sources.Tables

/** Training-data preparation batch E (SURVEY §2 #197-199): targeted
  * data selection by embedding similarity, clustering-quality
  * evaluation (Rand / adjusted Rand), and long-context mixture
  * reweighting.
  */
object TrainingE {

  /** #197 TARGETED DATA SELECTION (the embedding-similarity
    * selection of DsDm/LESS-style pipelines, classifier-free): score
    * every corpus vector by cosine to the TARGET-domain centroid
    * (label 0 plays the held-out target set) and select the top-50 —
    * the "find me more data like my eval set" primitive. The label
    * column of the selection shows how much of each source domain the
    * targeted pull brings in.
    *
    * Scale shape: the centroid is a per-label mean re-synced at 6dp
    * ([[Extras.embeddingCentroids]] — KB-sized, broadcast); scoring
    * is row-local on the corpus scan; the top-50 is a bounded
    * distributed take (TakeOrderedAndProject — ≤50 rows per task
    * cross the shuffle), and the rank window runs over only the
    * 50-row take output (the #87 vocab-coverage discipline). */
  def embedSelect(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        Embeddings.asDouble(col("embedding")).as("v"))
    val centArr = Extras.embeddingCentroids(s, dir)
      .filter(col("label") === 0)
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        x => x.getField("centroid")).as("cv"))
    val top = e.crossJoin(broadcast(centArr.select(col("cv"))))
      .select(col("vec_id"), col("label"),
        round(Embeddings.cosine(col("v"), col("cv")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(50)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col("vec_id")))
        .cast("long"))
      .select(col("rank"), col("vec_id"), col("label"), col("score"))
  }

  /** #198 CLUSTERING-QUALITY EVALUATION — pair-counting Rand index
    * and ADJUSTED Rand index of the label-seeded quantizer's
    * assignment (every vector → nearest per-label centroid, the same
    * assignment #57's IVF uses) against the TRUE labels: the check a
    * clustering-dependent pipeline (SemDeDup, IVF, cluster-balanced
    * sampling) runs before trusting its buckets. All pair counts are
    * exact integer combinatorics (C(x,2) in long arithmetic); only
    * the final index divisions are doubles, computed identically in
    * both engines.
    *
    * Scale shape: assignment is one broadcast cross-score + max_by
    * hash agg (map-side combined); the contingency table is
    * (buckets × labels)-sized — tiny — and everything after is
    * arithmetic on one row. */
  def randIndex(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("true_label"),
        Embeddings.asDouble(col("embedding")).as("v"))
    val centArr = Extras.embeddingCentroids(s, dir)
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        x => x.getField("centroid")).as("cv"))
    // nearest-centroid assignment — ivfTopK's semantics: round-6
    // score, (ccos desc, label asc) tie-break, max_by hash agg
    val assigned = e.crossJoin(broadcast(centArr))
      .withColumn("ccos", round(Embeddings.cosine(col("v"), col("cv")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("label"), col("true_label")),
        struct(col("ccos"), negate(col("label")))).as("a"))
      .select(col("a.label").cast("long").as("bucket"),
        col("a.true_label").as("true_label"))
    // C(x,2) in exact LONG arithmetic: x(x−1) is always even, so the
    // halving is a bit shift — a `/ 2` would be double division,
    // losing exactness past 2^53 pairs (n ~ 10^8 rows)
    def c2(x: org.apache.spark.sql.Column) = shiftright(x * (x - 1), 1)
    val cont = assigned.groupBy(col("bucket"), col("true_label"))
      .agg(count(lit(1)).as("nij"))
    val sij = cont.agg(sum(c2(col("nij"))).as("sij"),
      sum(col("nij")).as("n"),
      count_distinct(col("bucket")).as("n_buckets"),
      count_distinct(col("true_label")).as("n_labels"))
    val sa = cont.groupBy(col("bucket")).agg(sum(col("nij")).as("ai"))
      .agg(sum(c2(col("ai"))).as("sa"))
    val sb = cont.groupBy(col("true_label")).agg(sum(col("nij")).as("bj"))
      .agg(sum(c2(col("bj"))).as("sb"))
    val nD = col("n").cast("double")
    val tot = c2(col("n")).cast("double")
    val exp = col("sa").cast("double") * col("sb") / tot
    sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("n"), col("n_buckets"), col("n_labels"),
        col("sij").as("pairs_joint"), col("sa").as("pairs_pred"),
        col("sb").as("pairs_true"),
        round((lit(2.0) * col("sij") + c2(col("n")) - col("sa") - col("sb"))
          / tot, 6).as("rand_index"),
        round((col("sij") - exp)
          / ((col("sa") + col("sb")).cast("double") / 2.0 - exp), 6)
          .as("adjusted_rand"))
  }

  /** #199 LONG-CONTEXT UPSAMPLING — the length-distribution
    * reweighting of a context-extension data mix: per power-of-two
    * length bucket, the corpus's current token share vs the target
    * share, and the capped multiplicative upsample weight
    * min(target/current, 5) a sampler applies to hit the target
    * long-sequence exposure. The CASE-ladder bucket caps are the #181
    * discipline (never floating log2); shares divide identical
    * integer sums, so the doubles agree bit-for-bit. */
  def lengthUpsample(s: SparkSession, dir: String): DataFrame = {
    val n = size(split(col("text"), " ")).cast("long")
    val cap = when(n <= 16, 16L).when(n <= 32, 32L).when(n <= 64, 64L)
      .otherwise(128L)
    val targets = Seq(16L -> 0.05, 32L -> 0.15, 64L -> 0.30, 128L -> 0.50)
    val target = targets.tail.foldLeft(
      when(col("bucket") === targets.head._1, targets.head._2)) {
      case (acc, (b, t)) => acc.when(col("bucket") === b, t)
    }
    val per = Tables.documents(s, dir)
      .select(cap.as("bucket"), n.as("n_tok"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
    val tot = per.agg(sum(col("tokens")).as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("total_tokens"), 6)
          .as("current_share"),
        target.as("target_share"),
        round(least(target
          / (col("tokens").cast("double") / col("total_tokens")), lit(5.0)), 6)
          .as("upsample_weight"))
      .withColumn("tokens_after",
        round(col("tokens") * col("upsample_weight"), 6))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_select"    -> embedSelect _,
    "q_rand_index"      -> randIndex _,
    "q_length_upsample" -> lengthUpsample _)

  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
       |  / (sqrt(list_sum(list_transform($a, y -> y*y)))
       |     * sqrt(list_sum(list_transform($b, y -> y*y))))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_embed_select" ->
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |g AS (SELECT CAST(i AS BIGINT) AS dim, ROUND(AVG(v[i]), 6) AS c
         |  FROM e, UNNEST(range(1, 65)) AS t(i) WHERE label = 0 GROUP BY 1),
         |ca AS (SELECT list(c ORDER BY dim) AS cv FROM g),
         |sc AS (SELECT vec_id, label,
         |    ROUND(${cosSql("e.v", "ca.cv")}, 6) AS score
         |  FROM e, ca)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, vec_id)
         |    AS BIGINT) AS rank,
         |  vec_id, label, score
         |FROM sc ORDER BY score DESC, vec_id LIMIT 50""".stripMargin,
    "q_rand_index" ->
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS true_label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |x AS (SELECT true_label AS cid, CAST(i AS BIGINT) AS dim, v[i] AS val
         |  FROM e, UNNEST(range(1, 65)) AS t(i)),
         |g AS (SELECT cid, dim, ROUND(AVG(val), 6) AS centroid
         |  FROM x GROUP BY 1, 2),
         |c AS (SELECT cid, list(centroid ORDER BY dim) AS cv FROM g GROUP BY 1),
         |sf AS (SELECT e.vec_id, e.true_label, c.cid,
         |    ROUND(${cosSql("e.v", "c.cv")}, 6) AS ccos
         |  FROM e, c),
         |asg AS (SELECT cid AS bucket, true_label FROM sf
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cid) = 1),
         |cont AS (SELECT bucket, true_label, COUNT(*) AS nij
         |  FROM asg GROUP BY 1, 2),
         |sij AS (SELECT CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) AS sij,
         |    CAST(SUM(nij) AS BIGINT) AS n,
         |    COUNT(DISTINCT bucket) AS n_buckets,
         |    COUNT(DISTINCT true_label) AS n_labels
         |  FROM cont),
         |sa AS (SELECT CAST(SUM(ai * (ai - 1) // 2) AS BIGINT) AS sa FROM (
         |  SELECT CAST(SUM(nij) AS BIGINT) AS ai FROM cont GROUP BY bucket)),
         |sb AS (SELECT CAST(SUM(bj * (bj - 1) // 2) AS BIGINT) AS sb FROM (
         |  SELECT CAST(SUM(nij) AS BIGINT) AS bj FROM cont GROUP BY true_label))
         |SELECT n, n_buckets, n_labels, sij AS pairs_joint, sa AS pairs_pred,
         |  sb AS pairs_true,
         |  ROUND((2.0 * sij + n * (n - 1) // 2 - sa - sb)
         |    / CAST(n * (n - 1) // 2 AS DOUBLE), 6) AS rand_index,
         |  ROUND((sij - CAST(sa AS DOUBLE) * sb / CAST(n * (n - 1) // 2 AS DOUBLE))
         |    / (CAST(sa + sb AS DOUBLE) / 2.0
         |       - CAST(sa AS DOUBLE) * sb / CAST(n * (n - 1) // 2 AS DOUBLE)), 6)
         |    AS adjusted_rand
         |FROM sij, sa, sb""".stripMargin,
    "q_length_upsample" ->
      """WITH d AS (SELECT CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
        |    WHEN n <= 64 THEN 64 ELSE 128 END AS bucket, n FROM d),
        |per AS (SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
        |    CAST(SUM(n) AS BIGINT) AS tokens FROM b GROUP BY 1),
        |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens FROM per),
        |t AS (SELECT bucket, n_docs, tokens,
        |    ROUND(CAST(tokens AS DOUBLE) / total_tokens, 6) AS current_share,
        |    CASE WHEN bucket = 16 THEN 0.05 WHEN bucket = 32 THEN 0.15
        |      WHEN bucket = 64 THEN 0.30 ELSE 0.50 END AS target_share,
        |    ROUND(LEAST(
        |      (CASE WHEN bucket = 16 THEN 0.05 WHEN bucket = 32 THEN 0.15
        |        WHEN bucket = 64 THEN 0.30 ELSE 0.50 END)
        |      / (CAST(tokens AS DOUBLE) / total_tokens), 5.0), 6)
        |      AS upsample_weight
        |  FROM per, tot)
        |SELECT bucket, n_docs, tokens, current_share, target_share,
        |  upsample_weight,
        |  ROUND(tokens * upsample_weight, 6) AS tokens_after
        |FROM t""".stripMargin)
}
