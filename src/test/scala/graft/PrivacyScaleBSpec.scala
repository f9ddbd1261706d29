package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacyScaleBSpec extends AnyFunSuite {
  import TestSpark._

  test("kanon: every customer counted exactly once and no released group under k") {
    val df = SparkEntry.queries("q_kanon")(spark, sf).cache()
    val total = df.agg(sum(col("n_users"))).head().getLong(0)
    val customers = graft.sources.Tables.customer(spark, sf).count()
    assert(total == customers, s"released $total of $customers customers")
    // k-anonymity: every non-suppressed row covers >= 8 people
    assert(df.filter(col("level") < 3 && col("n_users") < 8).count() == 0)
    // generalized dims carry the sentinel exactly per level
    assert(df.filter(col("level") === 1 && col("bin") =!= -1L).count() == 0)
    assert(df.filter(col("level") === 2 &&
      (col("nat") =!= -1L || col("bin") =!= -1L)).count() == 0)
    // a released fine-grained group's count matches a direct recount of
    // the base MINUS what finer levels already released (at tiny SF the
    // level-0 frame can be legitimately empty — fall back to level 1)
    val finest = df.filter(col("level") === 0).orderBy(desc("n_users"))
      .collect().headOption
    finest match {
      case Some(r) =>
        val n = graft.sources.Tables.customer(spark, sf)
          .filter(col("c_mktsegment") === r.getString(1) &&
            col("c_nationkey") === r.getLong(2) &&
            floor(col("c_acctbal") / 1000.0).cast("long") === r.getLong(3))
          .count()
        assert(n == r.getLong(4))
      case None =>
        // everything generalized: level-1+ must still cover everyone
        assert(df.filter(col("level") >= 1).agg(sum(col("n_users")))
          .head().getLong(0) == customers)
    }
    df.unpersist()
  }

  test("dp_noise: noise is bounded by the mechanism's max magnitude, nonzero, and deterministic") {
    val noisy = SparkEntry.queries("q_dp_noise")(spark, sf).cache()
    val truth = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val joined = noisy.join(truth, Seq("event_type", "day"))
      .select((col("noisy_n") - col("n")).as("noise")).cache()
    assert(joined.count() == noisy.count())
    // 16-bit endpoint-shifted uniform: |noise| <= ln(65536) / eps
    val maxAbs = joined.agg(max(abs(col("noise")))).head().getDouble(0)
    assert(maxAbs <= math.log(65536.0) + 1e-6, s"noise $maxAbs exceeds mechanism bound")
    // the mechanism actually perturbs (not the identity release)
    assert(joined.filter(abs(col("noise")) > 0.01).count() > joined.count() / 2)
    // deterministic: a second evaluation is bit-identical
    val again = SparkEntry.queries("q_dp_noise")(spark, sf)
    assert(noisy.exceptAll(again).isEmpty && again.exceptAll(noisy).isEmpty)
    joined.unpersist(); noisy.unpersist()
  }

  test("bloom_join: identical to the plain join, and the prefilter actually prunes the fact") {
    val df = SparkEntry.queries("q_bloom_join")(spark, sf).cache()
    val o = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val plain = graft.sources.Tables.lineitem(spark, sf)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      .select(col("o_year"), col("n_lines"), col("sum_qty"),
        round(col("cents") / 100.0, 2).as("revenue"))
    assert(df.exceptAll(plain).isEmpty && plain.exceptAll(df).isEmpty)
    // the bloom prefilter keeps far fewer fact rows than the full scan
    val bf = graft.dedup.BloomIndex.buildSized(o, "o_orderkey")
    val fact = graft.sources.Tables.lineitem(spark, sf)
    val kept = fact.where(graft.dedup.BloomIndex.mightContain(bf, "l_orderkey")).count()
    val all = fact.count()
    assert(kept < all / 2, s"bloom kept $kept of $all fact rows — no pruning")
    // no false negatives: every truly-matching fact row survives the prefilter
    val matching = fact.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept >= matching)
    df.unpersist()
  }

  test("sample_estimate: ~5% sample, truth inside the CI, deterministic") {
    val df = SparkEntry.queries("q_sample_estimate")(spark, sf).cache()
    assert(df.count() == 5) // one row per priority
    val o = graft.sources.Tables.orders(spark, sf)
    val truth = o.groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("true_n"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("true_rev"))
    val j = df.join(truth, Seq("priority")).cache()
    assert(j.count() == 5)
    // sampling rate lands near p = 3277/65536 per group
    val rates = j.select((col("n_sampled") / col("true_n")).as("r"))
      .agg(min(col("r")), max(col("r"))).head()
    assert(rates.getDouble(0) > 0.02 && rates.getDouble(1) < 0.10,
      s"sample rate outside sanity band: $rates")
    // the 95% CI is honest here: truth within est ± 2·ci for every group
    // (deterministic sample — this is a fixed fact of the data, not flaky)
    val bad = j.filter(abs(col("est_revenue") - col("true_rev")) >
      col("ci95_half") * 2).count()
    assert(bad == 0, s"$bad groups outside doubled CI")
    j.unpersist(); df.unpersist()
  }

  test("shard_layout: docs and tokens conserve; balance factor sane and shared") {
    val df = SparkEntry.queries("q_shard_layout")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(df.agg(sum(col("n_docs"))).head.getLong(0) == docs.count())
    val trueTok = docs.select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum(col("t"))).head.getLong(0)
    assert(df.agg(sum(col("n_tokens"))).head.getLong(0) == trueTok)
    // balance = max/mean >= 1 by definition; one global value
    val bf = df.select(col("balance_factor")).distinct().collect()
    assert(bf.length == 1 && bf.head.getDouble(0) >= 1.0)
    // uniform hash: no shard may dominate (loose 3x-mean bound)
    assert(bf.head.getDouble(0) < 3.0, s"skewed shards: ${bf.head.getDouble(0)}")
    // deterministic: a second run is identical
    val again = SparkEntry.queries("q_shard_layout")(spark, sf)
    assert(df.exceptAll(again).count() == 0)
    df.unpersist()
  }
}
