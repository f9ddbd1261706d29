package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingSpec extends AnyFunSuite {
  import TestSpark._

  test("ndcg: bounded, consistent with its own dcg/idcg, all probes present") {
    val df = SparkEntry.queries("q_ndcg")(spark, sf).cache()
    assert(df.count() == 20)
    val bad = df.filter(col("ndcg") < 0.0 || col("ndcg") > 1.000001 ||
      col("dcg") > col("idcg") + 1e-9).count()
    assert(bad == 0, "ndcg out of [0,1] or dcg > idcg")
    // ndcg is exactly round(dcg/idcg, 6) of its own columns
    val drift = df.filter(
      abs(col("ndcg") - round(col("dcg") / col("idcg"), 6)) > 1e-9).count()
    assert(drift == 0)
    df.unpersist()
  }

  test("ndcg: a probe whose top-10 are all same-label scores 1.0") {
    // synthetic check via the real corpus: recompute each probe's
    // top-10 relevance independently with a window rank and compare
    // the resulting DCG against the query's
    val e = graft.sources.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        graft.similarity.Embeddings.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("n_id"), col("label").as("n_label"),
      graft.similarity.Embeddings.asDouble(col("embedding")).as("nv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    val top = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        round(graft.similarity.Embeddings.cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .groupBy(col("q_id"))
      .agg(sum(when(col("n_label") === col("q_label"), 1L).otherwise(0L))
        .as("n_rel"))
    val got = SparkEntry.queries("q_ndcg")(spark, sf)
      .join(top, Seq("q_id"))
    // all-relevant top-10 (n_rel = 10) must score ndcg = 1 exactly
    assert(got.filter(col("n_rel") === 10 && col("ndcg") =!= 1.0).count() == 0)
    // and a probe with zero relevant hits must score 0
    assert(got.filter(col("n_rel") === 0 && col("ndcg") =!= 0.0).count() == 0)
  }

  test("hard negatives: never the probe's own label, ranked by descending cos") {
    val df = SparkEntry.queries("q_hard_negatives")(spark, sf).cache()
    assert(df.filter(col("n_label") === col("q_label")).count() == 0,
      "a hard negative shares the probe's label")
    // 10 probes × 5 ranks, ranks exactly 1..5
    assert(df.count() == 50)
    assert(df.groupBy(col("q_id")).agg(
        count(lit(1)).as("n"), min(col("rank")).as("lo"), max(col("rank")).as("hi"))
      .filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5)
      .count() == 0)
    // cos non-increasing with rank per probe
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("rank"))
    assert(df.withColumn("prev", lag(col("cos"), 1).over(w))
      .filter(col("prev").isNotNull && col("cos") > col("prev")).count() == 0)
    df.unpersist()
  }

  test("hard negatives: each is the true filtered argmax (window cross-check)") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        graft.similarity.Embeddings.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("n_id"), col("label").as("n_label"),
      graft.similarity.Embeddings.asDouble(col("embedding")).as("nv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    val want = c.crossJoin(broadcast(q))
      .filter(col("n_label") =!= col("q_label"))
      .withColumn("cos",
        round(graft.similarity.Embeddings.cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("n_id"))
    val got = SparkEntry.queries("q_hard_negatives")(spark, sf)
      .select(col("q_id"), col("rank"), col("n_id"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "TopKAgg hard negatives disagree with the window formulation")
  }

  test("quality classifier: scores bounded, acceptance consistent, deterministic") {
    val df = SparkEntry.queries("q_quality_classifier")(spark, sf).cache()
    assert(df.filter(col("mean_score") <= 0.0 || col("mean_score") >= 1.0)
      .count() == 0, "sigmoid mean escaped (0,1)")
    assert(df.filter(col("n_accept") > col("n_docs")).count() == 0)
    val again = SparkEntry.queries("q_quality_classifier")(spark, sf)
    assert(df.exceptAll(again).count() == 0, "inference not deterministic")
    df.unpersist()
  }

  test("curriculum: full coverage by epoch 5, monotone cumulative schedule") {
    val df = SparkEntry.queries("q_curriculum")(spark, sf)
      .orderBy(col("epoch")).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(df.last.getLong(df.last.fieldIndex("cum_docs")) == nDocs,
      "epoch 5 must cover the whole corpus")
    val cums = df.map(r => r.getLong(r.fieldIndex("cum_docs")))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b },
      "cumulative docs must strictly grow per emitted epoch")
    // pacing: epoch e covers at least ceil(e·N/5) docs (threshold is
    // the smallest value whose cum count reaches the quota)
    df.foreach { r =>
      val e = r.getLong(r.fieldIndex("epoch"))
      val cum = r.getLong(r.fieldIndex("cum_docs"))
      assert(cum * 5 >= e * nDocs, s"epoch $e quota not met: $cum of $nDocs")
    }
  }

  test("span corruption: mask rate near 15%, spans consistent with noise") {
    val df = SparkEntry.queries("q_span_corruption")(spark, sf).cache()
    val tot = df.agg(sum(col("tot_tokens")).as("t"), sum(col("tot_noise")).as("n"),
      sum(col("tot_spans")).as("s")).head()
    val (t, n, sp) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val rate = n.toDouble / t
    assert(rate > 0.10 && rate < 0.20, s"corruption rate $rate far from 15%")
    assert(sp <= n, "more spans than masked tokens")
    assert(sp > 0 && n > 0)
    // mean span length ≥ 1 by construction
    assert(df.filter(col("mean_span_len") < 1.0).count() == 0)
    df.unpersist()
  }

  test("mmr: 5 distinct picks per probe, pick 1 is the relevance argmax") {
    val df = SparkEntry.queries("q_mmr_diversify")(spark, sf).cache()
    assert(df.count() == 25)
    // picks are distinct candidates per probe
    assert(df.groupBy(col("q_id")).agg(countDistinct(col("n_id")).as("n"))
      .filter(col("n") =!= 5).count() == 0)
    // pick 1 equals brute-force rank 1 (pure relevance)
    val e = graft.sources.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
        graft.similarity.Embeddings.asDouble(col("embedding")).as("qv"))
    val c = e.select(col("vec_id").as("n_id"),
      graft.similarity.Embeddings.asDouble(col("embedding")).as("nv"))
    val top1 = graft.similarity.Embeddings.bruteForceTopK(q, c, 1)
      .select(col("q_id"), col("n_id"))
    assert(df.filter(col("pick") === 1).select(col("q_id"), col("n_id"))
      .exceptAll(top1).count() == 0)
    // diversification really reorders: for at least one probe the MMR
    // pick set differs from the plain top-5 ranking order
    val top5 = graft.similarity.Embeddings.bruteForceTopK(q, c, 5)
      .select(col("q_id"), col("rank").as("pick"), col("n_id"))
    val diverged = df.select(col("q_id"), col("pick"), col("n_id"))
      .exceptAll(top5).count()
    assert(diverged > 0, "MMR degenerated to the undiversified ranking")
    df.unpersist()
  }

  test("dataset card: totals add up against independent recounts") {
    val df = SparkEntry.queries("q_dataset_card")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).cache()
    assert(df.agg(sum(col("n_docs"))).head().getLong(0) == docs.count())
    // per-source doc counts and language profile cross-check
    val want = docs.groupBy(col("source")).agg(
      count(lit(1)).as("w_docs"),
      countDistinct(col("lang")).as("w_langs"),
      countDistinct(md5(col("text"))).as("w_distinct"))
    val joined = df.join(want, Seq("source"))
    assert(joined.filter(col("n_docs") =!= col("w_docs") ||
      col("n_langs") =!= col("w_langs")).count() == 0)
    // dup_rate consistent with the distinct-content recount
    assert(joined.filter(
      abs(col("dup_rate") - round(lit(1.0) -
        col("w_distinct").cast("double") / col("w_docs"), 6)) > 1e-9)
      .count() == 0)
    // shares and rates bounded
    assert(df.filter(col("top_lang_share") <= 0.0 || col("top_lang_share") > 1.0 ||
      col("dup_rate") < 0.0 || col("dup_rate") >= 1.0).count() == 0)
    docs.unpersist(); df.unpersist()
  }

  test("tokenizer fertility: ratios consistent, bpe at least the word count") {
    val df = SparkEntry.queries("q_tokenizer_fertility")(spark, sf).cache()
    // the BPE-ish splitter never merges across whitespace, so each
    // word contributes >= 1 token: fertility >= 1 on this corpus
    assert(df.filter(col("fertility") < 1.0).count() == 0)
    assert(df.filter(col("tot_bpe_tokens") < col("tot_words")).count() == 0)
    val drift = df.filter(abs(col("fertility") -
      round(col("tot_bpe_tokens").cast("double") / col("tot_words"), 6)) > 1e-9)
    assert(drift.count() == 0)
    // langs partition the corpus
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(df.agg(sum(col("n_docs"))).head().getLong(0) == docs.count())
    df.unpersist()
  }

  test("span corruption plan: row-local masking — no explode, one agg exchange") {
    val p = SparkEntry.queries("q_span_corruption")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Generate"), s"token explode appeared in the mask path:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1,
      s"span corruption grew shuffles:\n$p")
  }
}
