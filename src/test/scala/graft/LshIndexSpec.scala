package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{LshIndex, TextDedup}
import graft.sources.{Snapshots, Tables}

/** The stored LSH index contract (the text twin of VectorIndexSpec):
  * absorb ≡ the live incremental reference, O(batch) plan shape
  * (partition-pruned artifact reads, no corpus signing in the absorb
  * plan), idempotent batch replay, and delta-chained visibility
  * (batch N+1 matches against batch N through the stored index). */
class LshIndexSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val corpus = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text")).localCheckpoint()
  private def plantedBatch(shift: Long) = corpus
    .filter(pmod(col("doc_id"), lit(10)) === 0)
    .select((col("doc_id") + shift).as("doc_id"),
      concat(col("text"), lit(" near dup probe")).as("text"))

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-lsh").toString

  test("absorb equals the live incremental reference (candidates + verify)") {
    val root = freshRoot()
    LshIndex.build(corpus, root)
    val batch = plantedBatch(1000000L).localCheckpoint()
    val got = LshIndex.absorbBatch(spark, root, batch, batchId = 0L)
    val refCand = TextDedup.lshCandidatesIncremental(
      TextDedup.minhashSignatures(corpus, "doc_id", "text"),
      TextDedup.minhashSignatures(batch, "doc_id", "text"), "doc_id")
    val want = TextDedup.verifyJaccard(
      refCand.select(col("new_id").as("doc_a"), col("match_id").as("doc_b")),
      corpus.unionByName(batch), "doc_id", "text")
      .filter(col("jaccard") >= LshIndex.JaccardMin)
      .select(col("doc_a").as("new_id"), col("doc_b").as("match_id"),
        col("jaccard"))
    assert(got.count() > 0, "planted batch produced no verified matches")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "stored-index absorb diverged from the live incremental pipeline")
  }

  test("O(batch) plan: absorb reads pruned artifacts, never signs the corpus") {
    val root = freshRoot()
    LshIndex.build(corpus, root)
    // literal in-memory batch: any corpus-parquet scan in the plan
    // would then be the index re-signing the corpus
    import spark.implicits._
    val batch = corpus.filter(pmod(col("doc_id"), lit(10)) === 0).limit(20)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" near dup probe")).as("text"))
      .as[(Long, String)].collect().toSeq.toDF("doc_id", "text")
    // candidate phase: the stored band scan must be partition-pruned
    // on bmod and must not touch the corpus parquet
    val probe = LshIndex.probeCandidates(spark, root,
      graft.dedup.LshIndex.bandsOf(batch), batch.select(col("doc_id")))
    val pp = probe.queryExecution.executedPlan.toString
    assert(pp.contains("PartitionFilters") && pp.contains("bmod"),
      s"stored band scan is not partition-pruned on bmod:\n$pp")
    assert(!pp.contains("documents.parquet"),
      s"candidate phase re-scanned the corpus parquet:\n$pp")
    // verification phase (the returned plan): stored shingle scan
    // pruned on dmod, corpus never re-signed
    val out = LshIndex.absorbBatch(spark, root, batch, batchId = 0L)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("dmod"),
      s"stored shingle scan is not partition-pruned on dmod:\n$p")
    assert(!p.contains("documents.parquet"),
      s"absorb plan re-scanned the corpus parquet:\n$p")
  }

  test("idempotent replay: same batchId re-appends nothing, returns the same matches") {
    val root = freshRoot()
    LshIndex.build(corpus, root)
    val batch = plantedBatch(3000000L).localCheckpoint()
    val r1 = LshIndex.absorbBatch(spark, root, batch, batchId = 7L)
      .collect().toSet
    val bv = Snapshots.versions(LshIndex.bandsRoot(root))
    val sv = Snapshots.versions(LshIndex.shinglesRoot(root))
    val r2 = LshIndex.absorbBatch(spark, root, batch, batchId = 7L)
      .collect().toSet
    assert(Snapshots.versions(LshIndex.bandsRoot(root)) == bv &&
      Snapshots.versions(LshIndex.shinglesRoot(root)) == sv,
      "replayed batch committed new versions")
    assert(r1 == r2, "replayed batch changed the match set")
  }

  test("delta chain: batch 2 matches batch 1 through the stored index") {
    val root = freshRoot()
    LshIndex.build(corpus, root)
    val b1 = plantedBatch(4000000L).localCheckpoint()
    LshIndex.absorbBatch(spark, root, b1, batchId = 0L).count()
    // batch 2 = near-dups OF BATCH 1 docs (different suffix, new ids):
    // their only strong matches live in batch 1's delta-appended rows
    val b2 = b1.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" again")).as("text")).localCheckpoint()
    val m = LshIndex.absorbBatch(spark, root, b2, batchId = 1L)
    val vsB1 = m.filter(col("match_id").between(4000000L, 4999999L))
    assert(vsB1.count() > 0,
      "batch 2 found no matches against batch 1's delta-appended index rows")
  }

  test("compaction: invisible to probes, carries the maxBatchId watermark forward") {
    val root = freshRoot()
    LshIndex.build(corpus, root)
    val b1 = plantedBatch(5000000L).localCheckpoint()
    val r1 = LshIndex.absorbBatch(spark, root, b1, batchId = 0L).collect().toSet
    // compact BOTH artifact chains back to single full snapshots
    Snapshots.compact(spark, LshIndex.bandsRoot(root), Seq("bmod"))
    Snapshots.compact(spark, LshIndex.shinglesRoot(root), Seq("dmod"))
    assert(!Snapshots.isDelta(LshIndex.bandsRoot(root),
      Snapshots.latestVersion(LshIndex.bandsRoot(root)).get))
    // watermark carry: a re-delivered day-1 batch must still no-op
    // AFTER compaction (the bug class #210 caught on the IVF side)
    val bv = Snapshots.versions(LshIndex.bandsRoot(root))
    val sv = Snapshots.versions(LshIndex.shinglesRoot(root))
    val r1b = LshIndex.absorbBatch(spark, root, b1, batchId = 0L).collect().toSet
    assert(Snapshots.versions(LshIndex.bandsRoot(root)) == bv &&
      Snapshots.versions(LshIndex.shinglesRoot(root)) == sv,
      "replayed batch re-appended after compaction — watermark lost")
    assert(r1b == r1, "replay across compaction changed the match set")
    // a genuinely new day still absorbs, and matches THROUGH the
    // compacted index exactly as through the chain
    val b2 = b1.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" again")).as("text")).localCheckpoint()
    val m = LshIndex.absorbBatch(spark, root, b2, batchId = 1L)
    assert(m.filter(col("match_id").between(5000000L, 5999999L)).count() > 0,
      "batch 2 lost its batch-1 matches after compaction")
    // vacuum afterwards keeps every retained version's chain readable
    Snapshots.vacuum(LshIndex.bandsRoot(root), keep = 1)
    assert(Snapshots.read(spark, LshIndex.bandsRoot(root)).count() > 0)
  }
}
