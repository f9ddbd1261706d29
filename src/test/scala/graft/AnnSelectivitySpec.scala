package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Embeddings

/** Selectivity sweep for metadata-filtered ANN (#94): proves the
  * PRE-filter formulation (predicate → join → rank) returns exactly k
  * results whenever ≥ k vectors pass, on a fixture where the
  * POST-filter alternative (rank globally, then filter) undershoots —
  * the in-code claim the operator was built on, as a test. */
class AnnSelectivitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 4-dim fixture: query along e1; the 12 closest vectors FAIL the
  // metadata predicate (high selectivity), the 6 passing ones sit
  // further out with strictly decreasing cosine
  private val k = 5
  private val passing = (100L to 105L).toSet
  private def vecs = {
    val near = (1L to 12L).map(i =>
      (i, Array(1.0, 0.001 * i, 0.0, 0.0))) // cos ≈ 1, all non-passing
    val far = (100L to 105L).zipWithIndex.map { case (id, j) =>
      (id, Array(1.0, 1.0 + 0.2 * j, 0.0, 0.0)) } // distinct lower cos
    (near ++ far).toDF("n_id", "nv")
  }
  private def q = Seq((0L, Array(1.0, 0.0, 0.0, 0.0))).toDF("q_id", "qv")

  test("pre-filter keeps k exact at high selectivity; post-filter undershoots") {
    val pass = passing.toSeq.toDF("pid")
    val pre = Embeddings.bruteForceTopK(
      q, vecs.join(pass, col("n_id") === col("pid")).select("n_id", "nv"), k)
      .collect()
    assert(pre.length == k, s"pre-filter must return exactly k: ${pre.length}")
    assert(pre.forall(r => passing(r.getAs[Long]("n_id"))))
    assert(pre.map(_.getAs[Long]("rank")).sorted.sameElements(1L to k))
    // best passing vector by construction: id 100 (smallest e2 component)
    assert(pre.minBy(_.getAs[Long]("rank")).getAs[Long]("n_id") == 100L)

    // post-filter: global top-k, THEN the predicate — the top-12 are
    // all non-passing, so nothing survives
    val post = Embeddings.bruteForceTopK(q, vecs, k)
      .filter(col("n_id").isin(passing.toSeq: _*)).collect()
    assert(post.length < k, s"fixture must make post-filter undershoot: ${post.length}")
  }

  test("pre-filter ranking is the true ranking of the passing subset") {
    val pass = passing.toSeq.toDF("pid")
    val pre = Embeddings.bruteForceTopK(
      q, vecs.join(pass, col("n_id") === col("pid")).select("n_id", "nv"), k)
      .orderBy("rank").collect().map(_.getAs[Long]("n_id"))
    // cosine decreases as the e2 component grows: 100, 101, 102, ...
    assert(pre.sameElements(Array(100L, 101L, 102L, 103L, 104L)))
  }
}
