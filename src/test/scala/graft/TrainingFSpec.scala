package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data batch F (#200-202): IVF nprobe sweep, cluster-capped
  * diversity sampling, per-source score quantile normalization. */
class TrainingFSpec extends AnyFunSuite {
  import TestSpark._

  test("ivf_nprobe_sweep: recall monotone non-decreasing in nprobe; nprobe=2 matches q_ivf_recall") {
    val rows = SparkEntry.queries("q_ivf_nprobe_sweep")(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    def rec(np: Long) = rows(np).getAs[Double]("recall_at_3")
    assert(rec(1) <= rec(2) && rec(2) <= rec(4),
      "probing more buckets can only recover recall")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_true") == 15)
      assert(r.getAs[Long]("n_hits") <= 15)
    }
    // the nprobe=2 row must agree with the gated #89 report's totals
    val r89 = SparkEntry.queries("q_ivf_recall")(spark, sf)
      .agg(sum(col("n_hits")), sum(col("n_true"))).collect().head
    assert(rows(2L).getAs[Long]("n_hits") == r89.getLong(0))
    assert(rows(2L).getAs[Long]("n_true") == r89.getLong(1))
  }

  test("cluster_sample: at most 20 per cluster, ranks contiguous, deterministic across runs") {
    val df = SparkEntry.queries("q_cluster_sample")(spark, sf).cache()
    val per = df.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
        min(col("rank")).as("mn")).collect()
    per.foreach { r =>
      assert(r.getLong(1) <= 20)
      assert(r.getLong(3) == 1L && r.getLong(2) == r.getLong(1),
        "ranks must be 1..n contiguous")
    }
    // kept set is a deterministic function of vec_id — a second run
    // returns the identical rows
    val a = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = SparkEntry.queries("q_cluster_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    df.unpersist()
  }

  test("score_norm: pct_rank is the within-source percent rank of the quality score") {
    val df = SparkEntry.queries("q_score_norm")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(df.count() == docs)
    // bounds and tie behavior: min score in a source gets 0; max gets 1
    val agg = df.groupBy(col("source"))
      .agg(min(col("pct_rank")).as("mn"), max(col("pct_rank")).as("mx"),
        count(lit(1)).as("n")).collect()
    agg.foreach { r =>
      assert(r.getDouble(1) == 0.0)
      assert(r.getDouble(2) <= 1.0 && r.getDouble(2) > 0.9)
    }
    // independent recompute for one source via sorted collect
    val src = df.select(col("source")).first().getString(0)
    val rows = df.filter(col("source") === src)
      .select(col("score"), col("pct_rank")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val n = rows.length
    val sorted = rows.map(_._1).sorted
    rows.foreach { case (s, p) =>
      val nLt = sorted.count(_ < s)
      assert(math.abs(p - nLt.toDouble / (n - 1)) < 1e-6, s"score $s")
    }
    // same score => same rank (quantile normalization is tie-stable)
    val tieViolations = df.groupBy(col("source"), col("score"))
      .agg(count_distinct(col("pct_rank")).as("d"))
      .filter(col("d") > 1).count()
    assert(tieViolations == 0)
    df.unpersist()
  }
}
