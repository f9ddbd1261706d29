package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Resolve

class ResolveSpec extends AnyFunSuite {
  import TestSpark._

  test("fixpoint resolution collapses a chain a-b-c-d to one canonical") {
    import spark.implicits._
    // one-hop min-propagation would leave 3 pointing at 2; fixpoint
    // must map every chain member to 0
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("src", "dst")
    val out = Resolve.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 10L -> 10L, 11L -> 10L))
  }

  test("fixpoint resolution handles cycles and reversed edge direction") {
    import spark.implicits._
    // edges given in arbitrary direction, with a cycle 5-6-7-5
    val edges = Seq((6L, 5L), (7L, 6L), (5L, 7L), (9L, 8L)).toDF("src", "dst")
    val out = Resolve.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("pointer doubling converges on a chain far longer than the round budget") {
    import spark.implicits._
    // a 120-link chain: plain min-propagation needs 120 rounds, the
    // path-halving loop must do it within maxIters=50 (actually ~8)
    val edges = (0L until 120L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Resolve.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 121)
    assert(out.values.forall(_ == 0L))
  }

  test("empty edge set resolves to an empty labeling, not an NPE") {
    import spark.implicits._
    // a corpus with no near-dups feeds zero verified candidate pairs
    // into resolution — the pipeline must pass through, not crash
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Resolve.connectedComponents(edges).count() == 0)
  }

  test("dedup pipeline keeps every doc when no candidate survives verification") {
    import org.apache.spark.sql.functions._
    // ultra-strict threshold: verification rejects all pairs, the CC
    // stage sees an empty edge set, every doc is its own canonical
    val docs = graft.sources.Tables.documents(spark, sf).limit(50)
    val sigs = graft.dedup.TextDedup.minhashSignatures(docs, "doc_id", "text")
    val cand = graft.dedup.TextDedup.lshCandidates(sigs, "doc_id")
    val verified = graft.dedup.TextDedup.verifyJaccard(cand, docs, "doc_id", "text")
      .filter(col("jaccard") > 1.0) // impossible: empty edges
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = Resolve.connectedComponents(verified).toDF("doc_id", "canonical_id")
    val out = docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
    assert(out.count() == 50)
    assert(out.filter(col("doc_id") =!= col("canonical_id")).count() == 0)
  }

  test("multi-probe flip covers all Hamming-1 neighbors") {
    import spark.implicits._
    val df = Seq("1010").toDF("bucket")
    val flips = (1 to 4).map(i =>
      df.select(graft.similarity.Embeddings.flipBit(col("bucket"), i)).head.getString(0))
    assert(flips == Seq("0010", "1110", "1000", "1011"))
  }
}
