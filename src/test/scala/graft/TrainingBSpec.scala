package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingBSpec extends AnyFunSuite {
  import TestSpark._

  test("doremi: weights form a smoothed distribution, monotone in excess") {
    val df = SparkEntry.queries("q_doremi_reweight")(spark, sf).cache()
    val n = df.count()
    assert(n == 20, "one row per source")
    // weights sum to ~1 (6dp rounding per row can drift Σ by ≤ n·5e-7)
    val s = df.agg(sum(col("weight"))).head.getDouble(0)
    assert(math.abs(s - 1.0) < 1e-4, s"weight sum $s")
    // the ε-uniform floor: every domain keeps at least ε/n mass
    assert(df.filter(col("weight") < lit(0.02 / n) - 1e-9).count() == 0)
    // multiplicative weights are monotone in excess loss
    val a = df.select(col("excess").as("ea"), col("weight").as("wa"))
    val b = df.select(col("excess").as("eb"), col("weight").as("wb"))
    val bad = a.crossJoin(b)
      .filter(col("ea") > col("eb") && col("wa") < col("wb") - 1e-9).count()
    assert(bad == 0, "a higher-excess domain got a lower weight")
    // a zero-excess domain's raw weight is exp(0)=1 → all such domains
    // share the same final weight
    assert(df.filter(col("excess") === 0.0)
      .select(col("weight")).distinct().count() <= 1)
    df.unpersist()
  }

  test("rejection sample: chosen is the group argmax, gap non-negative") {
    val df = SparkEntry.queries("q_rejection_sample")(spark, sf).cache()
    assert(df.count() == 64)
    assert(df.agg(sum(col("n_candidates"))).head.getLong(0) == 500)
    assert(df.filter(col("best_reward") < col("mean_reward") - 1e-9).count() == 0)
    // recompute the argmax independently with a window rank
    val tk = split(col("text"), " ")
    val r = graft.sources.Tables.documents(spark, sf)
      .select(pmod(col("doc_id"), lit(64)).as("prompt_id"), col("doc_id"),
        round(size(array_distinct(tk)).cast("double") / size(tk), 6).as("rw"))
    val w = Window.partitionBy(col("prompt_id"))
      .orderBy(col("rw").desc, col("doc_id"))
    val best = r.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("prompt_id"), col("doc_id").as("want_id"))
    assert(df.join(best, Seq("prompt_id"))
      .filter(col("chosen_id") =!= col("want_id")).count() == 0)
    df.unpersist()
  }

  test("preference pairs: ordered, distinct, margin-filtered") {
    val df = SparkEntry.queries("q_preference_pairs")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("margin") < 0.05).count() == 0)
    assert(df.filter(col("chosen_reward") <= col("rejected_reward")).count() == 0)
    assert(df.filter(col("chosen_id") === col("rejected_id")).count() == 0)
    // margin is exactly the decimal difference of the two 6dp rewards
    val drift = df.filter(abs(col("margin")
      - (col("chosen_reward") - col("rejected_reward"))) > 1e-9).count()
    assert(drift == 0)
    df.unpersist()
  }

  test("length buckets: partition the corpus, bucketing never wastes more than global pad") {
    val df = SparkEntry.queries("q_length_buckets")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(df.agg(sum(col("n_docs"))).head.getLong(0) == docs)
    assert(df.filter(col("tot_tokens") > col("tot_padded")).count() == 0)
    assert(df.filter(col("waste_ratio") > col("global_waste_ratio") + 1e-9)
      .count() == 0, "bucketed padding must beat global padding per bucket")
    // caps are powers of two
    val caps = df.select(col("bucket_cap")).collect().map(_.getLong(0))
    assert(caps.forall(c => (c & (c - 1)) == 0))
    df.unpersist()
  }

  test("epoch allocation: mixture normalizes, budget conserved, caps bind deficits") {
    val df = SparkEntry.queries("q_epoch_allocation")(spark, sf).cache()
    assert(df.count() == 20)
    val tw = df.agg(sum(col("temp_weight"))).head.getDouble(0)
    assert(math.abs(tw - 1.0) < 1e-4, s"temp_weight sum $tw")
    // Σ desired ≈ budget = 3 × corpus tokens (per-row decimal rounding
    // drifts the sum by at most n/2 tokens)
    val totTok = graft.sources.Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    val desired = df.agg(sum(col("desired_tokens"))).head.getLong(0)
    assert(math.abs(desired - 3L * totTok) <= 20, s"desired $desired vs ${3L * totTok}")
    // a deficit appears exactly when the 4-epoch cap binds
    assert(df.filter(col("epochs") > col("epochs_capped") && col("deficit") <= 0)
      .count() == 0)
    assert(df.filter(col("epochs") === col("epochs_capped")
      && abs(col("deficit")) > 1).count() == 0)
    assert(df.filter(col("served_tokens") > col("desired_tokens") + 1).count() == 0)
    df.unpersist()
  }

  test("bpe train: 3 merges, first merge matches an independent recount") {
    val df = SparkEntry.queries("q_bpe_train")(spark, sf).cache()
    assert(df.count() == 3)
    assert(df.select(col("merge_no")).collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 3L)))
    // merged = pair minus the space; pair has exactly one separating space
    assert(df.filter(col("merged") =!=
      regexp_replace(col("pair"), " ", "")).count() == 0)
    assert(df.filter(size(split(col("pair"), " ")) =!= 2).count() == 0)
    assert(df.filter(col("cnt") <= 0).count() == 0)
    // merge 1 = the top char-bigram over the filtered word-frequency
    // table, recounted independently (substr enumeration, no symbol
    // string representation)
    val words = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")).between(2, 20))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val top = words
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => concat(col("word").substr(i, lit(1)), lit(" "),
            col("word").substr(i + 1, lit(1))))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(1).head
    val m1 = df.filter(col("merge_no") === 1).head
    assert(m1.getAs[String]("pair") == top.getAs[String]("pair"))
    assert(m1.getAs[Long]("cnt") == top.getAs[Long]("cnt"))
    df.unpersist()
  }

  test("bpe train: greedy left-to-right merge semantics on repeated-symbol runs") {
    // wrapped-sentinel form: adjacent matches share no boundary chars,
    // so one replace pass IS greedy BPE — an odd run merges leftmost
    // ("<a><l><l><l><a>" → "<a><ll><l><a>") and an even run merges
    // completely ("<b><b><b><b>" → "<bb><bb>", which a space-separated
    // representation would get wrong)
    val r = spark.sql(
      "SELECT replace('<a><l><l><l><a>', '<l><l>', '<ll>') AS a, " +
        "replace('<b><b><b><b>', '<b><b>', '<bb>') AS b").head
    assert(r.getString(0) == "<a><ll><l><a>")
    assert(r.getString(1) == "<bb><bb>")
  }
}
