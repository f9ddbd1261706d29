package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationBSpec extends AnyFunSuite {
  import TestSpark._

  test("repetition_filter: one row per doc, fractions bounded, pass flag consistent") {
    val df = SparkEntry.queries("q_repetition_filter")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(df.count() == docs.count())
    assert(df.filter(col("top_bigram_frac") < 0 || col("top_bigram_frac") > 1)
      .count() == 0)
    assert(df.filter(col("dup_seg_frac") < 0 || col("dup_seg_frac") > 1)
      .count() == 0)
    assert(df.filter((col("rep_pass") === 1) =!=
      (col("top_bigram_frac") <= 0.2 && col("dup_seg_frac") <= 0.2))
      .count() == 0)
    df.unpersist()
  }

  test("repetition_filter: a single repeated token maxes both signals") {
    // replay the operator's signal construction over a pathological doc
    val one = spark.createDataFrame(Seq(
      (1L, Seq.fill(32)("spam").mkString(" ")),
      (2L, (1 to 32).map(i => s"w$i").mkString(" "))))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val bi = one.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1)))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi(1L) == 1.0)  // all bigrams identical
    assert(bi(2L) < 0.05)  // all bigrams distinct
  }

  test("lm_score: one row per doc, logp non-positive, bigram count = n_tokens-1") {
    val df = SparkEntry.queries("q_lm_score")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    assert(df.count() == docs.count())
    // C(w1,w2) <= C(w1,*) always, so every conditional logp <= 0
    assert(df.filter(col("avg_logp") > 0).count() == 0)
    val joined = df.join(docs, "doc_id")
      .filter(col("n_tok") >= 2)
      .filter(col("n_bigrams") =!= (col("n_tok") - 1))
    assert(joined.count() == 0)
    df.unpersist()
  }

  test("winnow: fingerprints present, ordered, bounded by shingle count") {
    val df = SparkEntry.queries("q_winnow")(spark, sf).cache()
    val sh = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.plans.WordShingles(col("text"), 3)).cast("long").as("n_sh"))
    assert(df.join(sh, "doc_id")
      .filter(col("n_sh") >= 1 && col("n_fp") < 1).count() == 0)
    assert(df.join(sh, "doc_id").filter(col("n_fp") > col("n_sh")).count() == 0)
    assert(df.filter(col("min_fp") > col("max_fp")).count() == 0)
    df.unpersist()
  }

  test("winnow: docs sharing a >=6-word run share a fingerprint") {
    // the winnowing guarantee: window w=4 over 3-grams ⇒ any common
    // substring of w+k-1 = 6 words yields at least one common pick
    val shared = (1 to 10).map(i => s"run$i").mkString(" ")
    val two = spark.createDataFrame(Seq(
      (1L, s"alpha beta gamma $shared delta"),
      (2L, s"$shared omega psi chi phi"))).toDF("doc_id", "text")
    val h = transform(graft.plans.WordShingles(col("text"), 3), x => md5(x))
    val fps = when(size(h) >= 4,
      array_distinct(transform(sequence(lit(1), size(h) - 3),
        i => array_min(slice(h, i, lit(4))))))
      .otherwise(array_distinct(h))
    val rows = two.select(col("doc_id"), fps.as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(rows(1L).intersect(rows(2L)).nonEmpty)
  }

  test("kmeans_iter: every vector assigned exactly once, 64 dims per centroid") {
    val df = SparkEntry.queries("q_kmeans_iter")(spark, sf).cache()
    val nVecs = graft.sources.Tables.embeddings(spark, sf).count()
    // Σ n_assigned over any one dim == corpus size (each vector in one cluster)
    val assignedTotal = df.filter(col("dim") === 1)
      .agg(sum(col("n_assigned"))).head().getLong(0)
    assert(assignedTotal == nVecs)
    // long format: each surviving centroid carries all 64 dims
    val dimCounts = df.groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 64)
    assert(dimCounts.count() == 0)
    df.unpersist()
  }

  test("kmeans_iter: iterating moves means toward assignment stability") {
    // the recomputed centroid of a cluster must be a valid mean:
    // within the min/max envelope of the corpus on every dimension
    val df = SparkEntry.queries("q_kmeans_iter")(spark, sf)
    val env = graft.sources.Tables.embeddings(spark, sf)
      .select(posexplode(graft.similarity.Embeddings.asDouble(col("embedding"))))
      .groupBy((col("pos") + 1).as("dim"))
      .agg(min(col("col")).as("lo"), max(col("col")).as("hi"))
    val out = df.join(env, "dim")
      .filter(col("centroid") < col("lo") - 1e-6 ||
        col("centroid") > col("hi") + 1e-6)
    assert(out.count() == 0)
  }

  test("vocab_coverage: cumulative fraction is monotone and ends <= 1") {
    val rows = SparkEntry.queries("q_vocab_coverage")(spark, sf)
      .orderBy(col("rank")).collect()
    assert(rows.nonEmpty)
    val fracs = rows.map(_.getAs[Double]("cum_frac"))
    assert(fracs.zip(fracs.tail).forall { case (a, b) => b >= a })
    assert(fracs.last <= 1.0 + 1e-9)
    // counts must be non-increasing down the ranking
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => b <= a })
  }

  test("token_entropy: bounded by ln(vocab), positive for mixed sources") {
    val df = SparkEntry.queries("q_token_entropy")(spark, sf).cache()
    // 0 <= H <= ln(vocab) always
    assert(df.filter(col("entropy") < -1e-9).count() == 0)
    assert(df.filter(col("entropy") >
      log(col("vocab").cast("double")) + 1e-9).count() == 0)
    assert(df.filter(col("entropy") > 0).count() > 0)
    df.unpersist()
  }

  test("ivf_recall: one row per query, recall = hits/true, nonzero overall") {
    val df = SparkEntry.queries("q_ivf_recall")(spark, sf).cache()
    assert(df.count() == 5)
    assert(df.filter(col("n_true") =!= 3).count() == 0)
    assert(df.filter(col("recall") < 0 || col("recall") > 1).count() == 0)
    assert(df.filter(
      abs(col("recall") - col("n_hits").cast("double") / col("n_true")) > 1e-6)
      .count() == 0)
    // the index must retrieve SOMETHING across the probe set
    assert(df.agg(sum(col("n_hits"))).head().getLong(0) > 0)
    df.unpersist()
  }

  test("dedup_savings: totals consistent with the pipeline labeling") {
    val row = SparkEntry.queries("q_dedup_savings")(spark, sf).head()
    val (n, kept, tot, keptTok) = (row.getAs[Long]("n_docs"),
      row.getAs[Long]("kept_docs"), row.getAs[Long]("total_tokens"),
      row.getAs[Long]("kept_tokens"))
    assert(kept <= n && kept > 0)
    assert(keptTok <= tot && keptTok > 0)
    val savings = row.getAs[Double]("token_savings")
    assert(math.abs(savings - (1.0 - keptTok.toDouble / tot)) < 1e-5)
    // must agree with the pipeline's own keep column
    val keepSum = SparkEntry.queries("q_dedup_pipeline")(spark, sf)
      .agg(sum(col("keep"))).head().getLong(0)
    assert(kept == keepSum)
  }

  test("lang_mix: shares normalize, doc counts cover the corpus") {
    val df = SparkEntry.queries("q_lang_mix")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(df.agg(sum(col("n_docs"))).head().getLong(0) == docs)
    assert(math.abs(df.agg(sum(col("share"))).head().getDouble(0) - 1.0) < 1e-4)
    df.unpersist()
  }

  test("domain_temperature: weights normalize and up-weight small domains") {
    val df = SparkEntry.queries("q_domain_temperature")(spark, sf).cache()
    val sums = df.agg(sum(col("share")).as("s"), sum(col("temp_weight")).as("w"))
      .head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-4)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-4)
    // α=0.5 compresses the distribution: the smallest domain's weight
    // must exceed its share, the largest domain's weight must not
    val rows = df.orderBy(col("share")).collect()
    assert(rows.head.getAs[Double]("temp_weight") >=
      rows.head.getAs[Double]("share"))
    assert(rows.last.getAs[Double]("temp_weight") <=
      rows.last.getAs[Double]("share"))
    df.unpersist()
  }
}
