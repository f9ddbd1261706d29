package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data batch E (#197-199): targeted embedding selection,
  * Rand/ARI clustering evaluation, long-context upsampling. */
class TrainingESpec extends AnyFunSuite {
  import TestSpark._

  test("embed_select: 50 contiguous ranks, non-increasing scores, target label over-pulled") {
    val rows = SparkEntry.queries("q_embed_select")(spark, sf)
      .orderBy(col("rank")).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 50L))
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the point of targeted selection: label 0 (the target domain)
    // is over-represented vs its ~10% base rate
    val frac0 = rows.count(_.getLong(2) == 0L) / 50.0
    assert(frac0 > 0.2, s"target label fraction $frac0 not over-pulled")
    // rank ties at equal score resolve by vec_id ascending
    rows.sliding(2).foreach { case Array(a, b) =>
      if (a.getDouble(3) == b.getDouble(3))
        assert(a.getLong(1) < b.getLong(1))
    }
  }

  test("rand_index: published indices recompute from the published pair sums") {
    val r = SparkEntry.queries("q_rand_index")(spark, sf).collect().head
    val (n, sij, sa, sb) = (r.getAs[Long]("n"), r.getAs[Long]("pairs_joint"),
      r.getAs[Long]("pairs_pred"), r.getAs[Long]("pairs_true"))
    assert(sij <= sa && sij <= sb, "joint pairs bound by both marginals")
    val tot = n * (n - 1) / 2
    val ri = (2.0 * sij + tot - sa - sb) / tot.toDouble
    assert(math.abs(r.getAs[Double]("rand_index") - ri) < 1e-6)
    val exp = sa.toDouble * sb / tot.toDouble
    val ari = (sij - exp) / ((sa + sb).toDouble / 2.0 - exp)
    assert(math.abs(r.getAs[Double]("adjusted_rand") - ari) < 1e-6)
    // label-seeded assignment must correlate with the labels it was
    // seeded from (ARI > 0), and RI is a [0,1] agreement rate
    assert(r.getAs[Double]("adjusted_rand") > 0.0)
    assert(r.getAs[Double]("rand_index") >= 0.0 &&
      r.getAs[Double]("rand_index") <= 1.0)
    assert(r.getAs[Long]("n_buckets") == 10 && r.getAs[Long]("n_labels") == 10)
  }

  test("length_upsample: shares sum to 1, weights capped, token math consistent") {
    val rows = SparkEntry.queries("q_length_upsample")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSet == Set(16L, 32L, 64L, 128L))
    val curSum = rows.map(_.getAs[Double]("current_share")).sum
    assert(math.abs(curSum - 1.0) < 1e-5)
    assert(math.abs(rows.map(_.getAs[Double]("target_share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val w = r.getAs[Double]("upsample_weight")
      assert(w > 0 && w <= 5.0)
      assert(math.abs(r.getAs[Double]("tokens_after")
        - r.getAs[Long]("tokens") * w) < 1e-3)
    }
    // doc counts and tokens cover the whole corpus
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
  }
}
