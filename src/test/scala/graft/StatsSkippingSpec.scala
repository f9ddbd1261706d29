package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileStats, Snapshots}
import graft.sources.FileStats.ColRange

/** Per-file column stats + data-skipping reads ([[FileStats]] /
  * [[Snapshots.readPruned]]): the footer-derived sidecar matches the
  * files' true min/max, pruned reads are EXACTLY filter-equivalent on
  * full/append/delete/merge chains, and the Z-order layout's whole
  * point — a 2-D box touching fewer files than any single-column sort
  * can manage — is asserted as a file COUNT, not prose. The
  * end-to-end oracle gate is `q_stats_pruned`. */
class StatsSkippingSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpRoot(): String =
    Files.createTempDirectory("statskip").toString + "/tbl"

  /** 64x64 grid, one row per (x, y), plus the 12-bit Morton code. */
  private def grid(): DataFrame = {
    import spark.implicits._
    val rows = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, morton(x, y), x.toLong * 64 + y)
    rows.toDF("x", "y", "z", "payload")
  }
  private def morton(x: Int, y: Int): Long =
    (0 until 6).map(i =>
      (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))).reduce(_ | _)

  test("footer stats match the files' true per-file min/max and null counts") {
    import spark.implicits._
    val root = tmpRoot()
    val df = (0 until 1000)
      .map(i => (i.toLong, i.toDouble / 7.0, f"k$i%04d",
        if (i % 5 == 0) None else Some(i.toLong)))
      .toDF("id", "score", "key", "opt")
    Snapshots.commit(df.repartitionByRange(4, col("id")), root,
      statsCols = Seq("id", "score", "key", "opt"))
    val stats = Snapshots.statsOf(root, 0L).get
    assert(stats.size == 4, s"expected 4 files, got ${stats.map(_.path)}")
    // ground truth per physical file
    val truth = spark.read.parquet(s"$root/data/v=0")
      .groupBy(input_file_name().as("f"))
      .agg(min("id"), max("id"), min("score"), max("score"),
        min("key"), max("key"), min("opt"), max("opt"),
        sum(col("opt").isNull.cast("long")), count(lit(1)))
      .collect().map(r => r.getString(0).replaceFirst(".*/v=0/", "") ->
        r).toMap
    stats.foreach { fs =>
      val t = truth(fs.path)
      assert(fs.rows == t.getLong(10))
      assert(fs.stats("id").typ == "l" &&
        fs.stats("id").min.toLong == t.getLong(1) &&
        fs.stats("id").max.toLong == t.getLong(2))
      assert(fs.stats("score").typ == "d" &&
        math.abs(fs.stats("score").min.toDouble - t.getDouble(3)) < 1e-12 &&
        math.abs(fs.stats("score").max.toDouble - t.getDouble(4)) < 1e-12)
      assert(fs.stats("key").typ == "s" &&
        fs.stats("key").min == t.getString(5) &&
        fs.stats("key").max == t.getString(6))
      assert(fs.stats("opt").nulls == t.getLong(9))
    }
  }

  test("readPruned == readVersion.filter across a full+append+delete+merge chain") {
    import spark.implicits._
    val root = tmpRoot()
    def part(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(4, col("id"))
    Snapshots.commit(part(0L, 4000L), root, statsCols = Seq("id"))        // v0
    Snapshots.commitAppend(part(4000L, 6000L), root, batchId = Some(1L),
      statsCols = Seq("id"))                                              // v1
    Snapshots.commitDelete(
      (0L until 6000L by 13).toDF("id"), root, "id", Some(2L))            // v2
    // merge: update ids 100-199 (values shifted), insert 7000-7099 —
    // committed WITHOUT stats (members without a sidecar scan whole)
    Snapshots.commitMerge(
      ((100L until 200L).map(i => (i, s"upd$i")) ++
        (7000L until 7100L).map(i => (i, s"new$i"))).toDF("id", "v"),
      root, "id", batchId = Some(3L))                                     // v3
    val ranges = Seq(ColRange("id", lower = Some(120L), upper = Some(1500L)))
    val pruned = Snapshots.readPruned(spark, root, ranges)
      .as[(Long, String)].collect().toSet
    val full = Snapshots.read(spark, root)
      .filter(col("id") >= 120L && col("id") <= 1500L)
      .as[(Long, String)].collect().toSet
    assert(pruned == full, "pruned read diverged from filtered full read")
    // the box spans only part of v0 (~files 1-2 of its 4 range files)
    // and none of v1 (ids 4000+): real skipping on both members
    val (kept0, total0) = Snapshots.prunedFileCount(root, 0L, ranges).get
    assert(total0 == 4 && kept0 < total0,
      s"v0 pruned nothing ($kept0/$total0)")
    val (kept1, _) = Snapshots.prunedFileCount(root, 1L, ranges).get
    assert(kept1 == 0, s"v1 (ids 4000+) should prune entirely, kept $kept1")
    // updated rows inside the box surface the MERGE value exactly once
    assert(pruned.count(_._1 == 150L) == 1 && pruned(150L -> "upd150"))
    // a range EXCLUDING everything still answers (empty, schema intact)
    val none = Snapshots.readPruned(spark, root,
      Seq(ColRange("id", lower = Some(100000L))))
    assert(none.columns.toSeq == Seq("id", "v") && none.count() == 0)
  }

  test("merge rows OUTSIDE the box still replace their chain targets (key frames unpruned)") {
    import spark.implicits._
    val root = tmpRoot()
    Snapshots.commit(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "score")
        .repartitionByRange(2, col("score")), root, statsCols = Seq("score"))
    // the merge moves id=2 OUT of the box (score 20 -> 999): if the
    // merge member's keys were pruned by the box, the stale (2, 20)
    // would survive and pass the residual filter — silently wrong
    Snapshots.commitMerge(Seq((2L, 999L)).toDF("id", "score"), root, "id",
      batchId = Some(1L))
    val box = Seq(ColRange("score", lower = Some(0L), upper = Some(100L)))
    val got = Snapshots.readPruned(spark, root, box)
      .as[(Long, Long)].collect().toSet
    assert(got == Set(1L -> 10L), s"stale pre-merge row resurfaced: $got")
  }

  test("Z-order layout: a 2-D box keeps fewer files than a single-column sort of the same data") {
    val root = (tmpRoot(), tmpRoot())
    val g = grid()
    // same 4096 rows, 16 files each: Morton-ordered vs x-ordered
    Snapshots.commit(g.repartitionByRange(16, col("z")), root._1,
      statsCols = Seq("x", "y"))
    Snapshots.commit(g.repartitionByRange(16, col("x")), root._2,
      statsCols = Seq("x", "y"))
    // an aligned 16x16 tile: 1/16 of the space
    val box = Seq(ColRange("x", Some(0L), Some(15L)),
      ColRange("y", Some(16L), Some(31L)))
    val (keptZ, totZ) = Snapshots.prunedFileCount(root._1, 0L, box).get
    val (keptX, totX) = Snapshots.prunedFileCount(root._2, 0L, box).get
    assert(totZ == 16 && totX == 16)
    // x-sorted files span all of y: every file intersecting x<=15
    // survives (~4); z-sorted files are ~16x16 tiles: ~1 survives
    assert(keptZ < keptX,
      s"z-order kept $keptZ of $totZ vs x-sort $keptX of $totX")
    assert(keptZ <= 3, s"z-order box read should touch ~1 tile, got $keptZ")
    // and both layouts answer identically
    val a = Snapshots.readPruned(spark, root._1, box).agg(
      count(lit(1)), sum("payload")).head()
    val b = Snapshots.readPruned(spark, root._2, box).agg(
      count(lit(1)), sum("payload")).head()
    assert(a == b && a.getLong(0) == 256L)
  }

  test("operational lookup: absorbDaily records doc_id stats, nightly preserves them through compaction") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val base = java.nio.file.Files.createTempDirectory("opskip").toString
    val (curated, lsh) = (s"$base/curated", s"$base/lsh")
    // the base corpus committed range-laid-out WITH stats (the 100 TB
    // member a point lookup must be able to skip)
    Snapshots.commit(corpus.repartitionByRange(4, col("doc_id")), curated,
      statsCols = Seq("doc_id"))
    graft.dedup.LshIndex.build(corpus, lsh)
    // three daily absorbs — weekBatch day d's ids live in disjoint
    // shifted ranges, so each delta's sidecar covers a distinct slice
    (0 until 3).foreach { d =>
      graft.pipelines.CurationJob.absorbDaily(
        graft.queries.Indexing.weekBatch(corpus, d), curated, lsh,
        batchId = d.toLong)
      assert(Snapshots.statsOf(curated, (d + 1).toLong).nonEmpty,
        s"day $d's curated append recorded no stats sidecar")
    }
    // a lookup inside day 1's fresh-docs id range (10M + 1*1M shift):
    // must equal the full filtered read AND touch zero files of the
    // base or the other days' deltas
    val (lo, hi) = (11000000L, 11999999L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id")).as[Long].collect().toSet
    val lookup = graft.pipelines.CurationJob.lookupDocs(spark, curated, lo, hi)
    val full = Snapshots.read(spark, curated)
      .filter(col("doc_id") >= lo && col("doc_id") <= hi)
    assert(ids(lookup) == ids(full) && lookup.count() > 0)
    val range = Seq(FileStats.ColRange("doc_id", Some(lo), Some(hi)))
    assert(Snapshots.prunedFileCount(curated, 0L, range).get._1 == 0,
      "the base corpus was not skipped")
    assert(Snapshots.prunedFileCount(curated, 1L, range).get._1 == 0,
      "day 0's delta was not skipped")
    assert(Snapshots.prunedFileCount(curated, 2L, range).get._1 > 0,
      "day 1's delta lost the rows")
    // nightly compaction re-records the sidecar (maintain's statsCols
    // carry) — the compacted chain still skips
    graft.pipelines.CurationJob.nightly(spark, curated, lsh, keep = 7)
    val cv = Snapshots.latestVersion(curated).get
    assert(!Snapshots.isDelta(curated, cv))
    assert(Snapshots.statsOf(curated, cv).nonEmpty,
      "compaction stripped the stats sidecar")
    assert(ids(graft.pipelines.CurationJob.lookupDocs(spark, curated, lo, hi))
      == ids(full))
    val (kept, total) = Snapshots.prunedFileCount(curated, cv, range).get
    assert(kept < total, s"compacted table prunes nothing ($kept/$total)")
  }

  test("stats sidecars follow their versions through truncation and vacuum") {
    import spark.implicits._
    val root = tmpRoot()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), root, statsCols = Seq("id"))
    Snapshots.commitAppend(Seq((2L, "b")).toDF("id", "v"), root,
      batchId = Some(1L), statsCols = Seq("id"))
    assert(Snapshots.statsOf(root, 0L).nonEmpty)
    assert(Snapshots.statsOf(root, 1L).nonEmpty)
    // rollback + recommit truncates the dead v1 — its sidecar too
    Snapshots.rollback(root, 0L)
    Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "v"), root,
      batchId = Some(2L)) // no stats on the recommit
    assert(Snapshots.statsOf(root, 1L).isEmpty,
      "dead-timeline stats sidecar survived truncation")
    // compact + aggressive vacuum drops v0's sidecar with its version
    Snapshots.compact(spark, root)
    Snapshots.vacuum(root, keep = 0)
    assert(Snapshots.statsOf(root, 0L).isEmpty,
      "vacuumed version's stats sidecar leaked")
  }
}
