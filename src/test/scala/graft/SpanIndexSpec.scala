package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SpanIndex
import graft.sources.{Snapshots, Tables}

/** The stored grid-span index contract (the substring member of the
  * incremental-index family): absorb reports #73's statistics over
  * corpus ∪ batch, O(batch) plan shape (no corpus re-spanning in the
  * absorb plan), idempotent batch replay with a replay-stable report,
  * and delta-chained visibility (batch N+1 sees batch N's spans). */
class SpanIndexSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val corpus = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text")).localCheckpoint()

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-span").toString

  test("absorb: verbatim copies fully duplicated, fresh docs mostly not; replay-stable") {
    val root = freshRoot()
    SpanIndex.build(corpus, root)
    val rev = array_join(reverse(split(col("text"), " ")), " ")
    val batch = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(corpus.filter(pmod(col("doc_id"), lit(20)) === 5)
        .select((col("doc_id") + 2000000L).as("doc_id"), rev.as("text")))
      .localCheckpoint()
    val r1 = SpanIndex.absorbBatch(spark, root, batch, batchId = 0L)
      .localCheckpoint()
    // a verbatim copy duplicates EVERY span against its original
    val copies = r1.filter(col("doc_id") < 2000000L)
    assert(copies.count() > 0)
    assert(copies.filter(col("n_dup_spans") =!= col("n_spans")).count() == 0,
      "a verbatim copy had a non-duplicated span")
    // reversed-token fresh docs dup only coincidentally — strictly
    // fewer dup spans overall than the copies
    val fresh = r1.filter(col("doc_id") >= 2000000L)
    assert(fresh.count() > 0)
    val freshDupFrac = fresh.agg(avg(col("dup_frac"))).head().getDouble(0)
    assert(freshDupFrac < 0.5, s"fresh docs unexpectedly duplicated: $freshDupFrac")
    // idempotent replay: no new version, same report
    val vs = Snapshots.versions(SpanIndex.spansRoot(root))
    val r1b = SpanIndex.absorbBatch(spark, root, batch, batchId = 0L)
    assert(Snapshots.versions(SpanIndex.spansRoot(root)) == vs,
      "replayed batch re-appended")
    assert(r1.exceptAll(r1b).count() == 0 && r1b.exceptAll(r1).count() == 0,
      "replay changed the span report")
  }

  test("absorb plan: pruned stored reads, no corpus scan; day-2 sees day-1 through the chain") {
    import spark.implicits._
    val root = freshRoot()
    SpanIndex.build(corpus, root)
    // literal in-memory batch: a documents.parquet scan in the absorb
    // plan would be the index re-spanning the corpus
    def doc(i: Int): String = (0 until 40).map(j => s"sp${i}tok$j").mkString(" ")
    val day1 = Seq((1000000L, doc(1)), (1000001L, doc(2))).toDF("doc_id", "text")
    val r1 = SpanIndex.absorbBatch(spark, root, day1, batchId = 0L)
    val plan = r1.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"absorb plan re-scanned the corpus:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("smod"),
      s"stored span scan is not partition-pruned on smod:\n$plan")
    // day-1 fresh docs: zero dup spans (synthetic unique tokens)
    assert(r1.filter(col("n_dup_spans") > 0).count() == 0)
    // day-2 re-sends doc(1) under a new id: every span now duplicated
    // THROUGH day-1's delta-appended spans
    val day2 = Seq((1100000L, doc(1))).toDF("doc_id", "text")
    val r2 = SpanIndex.absorbBatch(spark, root, day2, batchId = 1L).head()
    assert(r2.getAs[Long]("n_dup_spans") == r2.getAs[Long]("n_spans"),
      "day-2 copy did not match day-1 through the stored chain")
    // targeted delete: forget BOTH stored copies of doc(1)'s spans —
    // a day-3 re-send then matches nothing
    SpanIndex.delete(spark, root,
      Seq(1000000L, 1100000L).toDF("doc_id"), batchId = Some(2L))
    val day3 = Seq((1200000L, doc(1))).toDF("doc_id", "text")
    val r3 = SpanIndex.absorbBatch(spark, root, day3, batchId = 3L).head()
    assert(r3.getAs[Long]("n_dup_spans") == 0L,
      "deleted spans still matched a new arrival")
    // replayed delete no-ops (watermark passed it)
    val vs = Snapshots.versions(SpanIndex.spansRoot(root))
    SpanIndex.delete(spark, root, Seq(1000000L).toDF("doc_id"),
      batchId = Some(2L))
    assert(Snapshots.versions(SpanIndex.spansRoot(root)) == vs,
      "replayed span delete re-committed")
  }

  test("nightly compaction: invisible to day-2 probes, watermark survives") {
    import spark.implicits._
    val root = freshRoot()
    SpanIndex.build(corpus, root)
    def doc(i: Int): String = (0 until 40).map(j => s"cp${i}tok$j").mkString(" ")
    val b1 = Seq((1000000L, doc(1)), (1000001L, doc(2))).toDF("doc_id", "text")
    SpanIndex.absorbBatch(spark, root, b1, batchId = 0L).count()
    val m = SpanIndex.nightly(spark, root, keep = 3)
    val sroot = SpanIndex.spansRoot(root)
    assert(m.compacted(sroot).nonEmpty, "delta chain did not compact")
    assert(!Snapshots.isDelta(sroot, Snapshots.latestVersion(sroot).get))
    // the maxBatchId watermark survived compaction: a re-delivered
    // day-1 batch no-ops instead of double-appending its spans
    val vs = Snapshots.versions(sroot)
    SpanIndex.absorbBatch(spark, root, b1, batchId = 0L).count()
    assert(Snapshots.versions(sroot) == vs,
      "re-delivered pre-compaction batch re-appended")
    // day-2 copy of a day-1 doc matches THROUGH the compacted rows
    val r2 = SpanIndex.absorbBatch(spark, root,
      Seq((1100000L, doc(1))).toDF("doc_id", "text"), batchId = 1L).head()
    assert(r2.getAs[Long]("n_dup_spans") == r2.getAs[Long]("n_spans"),
      "compaction hid day-1's spans from the day-2 probe")
  }

  test("absorb report is stable across post-commit re-evaluations (version pinned at read time)") {
    import spark.implicits._
    val root = freshRoot()
    SpanIndex.build(corpus, root)
    def doc(i: Int): String = (0 until 40).map(j => s"st${i}tok$j").mkString(" ")
    val batch = Seq((1000000L, doc(1)), (1000001L, doc(2)))
      .toDF("doc_id", "text")
    val r = SpanIndex.absorbBatch(spark, root, batch, batchId = 0L)
    // every evaluation of the returned frame happens AFTER the
    // commitAppend inside absorbBatch: the plan must keep answering
    // from the pre-append artifact version it resolved at
    // Snapshots.read time (plus the own-rows replay guard) — a
    // refactor that made version resolution lazy AND dropped the
    // guard would count the batch's own stored copies and report
    // every fresh span as duplicated
    val e1 = r.collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val e2 = r.collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(e1 == e2, "absorb report changed between post-commit evaluations")
    assert(r.filter(col("n_dup_spans") > 0).count() == 0,
      "post-commit evaluation counted the batch's own appended spans")
  }
}
