package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file COMPACTION — the operational answer to the small-files
  * problem every long-running date-partitioned sink develops: daily
  * appends and late upserts leave partitions with dozens of KB-scale
  * parquet files, and at 100 TB the resulting scan pays per-file
  * open/footer costs and floods the driver with file listings.
  *
  * Shapes:
  *  - planning reads FILE METADATA only (one driver-side listing —
  *    the same information the scan's own file index would read);
  *  - the rewrite is `coalesce` (no shuffle — merging files needs no
  *    data movement beyond concatenating partitions);
  *  - durability follows the upsert writer's stage-to-temp-and-swap:
  *    the compacted output is a complete committed write BEFORE the
  *    target is touched, and the overwrite reads from the staged
  *    files, never from recomputable lineage over the files being
  *    replaced (see [[Writers.upsertDatePartitions]]);
  *  - the partitioned variant rewrites ONLY partitions whose file
  *    count exceeds the threshold (dynamic partition overwrite) —
  *    cold partitions are never read or written.
  *
  * (reference tasks/base.py load_to_fs appends per-run files and has
  * no compaction pass; this is the missing operational complement.)
  */
object Compact {

  /** (data file count, total bytes) of a parquet directory —
    * metadata only, no data read. */
  def stats(spark: SparkSession, path: String): (Int, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0, 0L)
    val files = dataFiles(fs, p)
    (files.size, files.map(_.getLen).sum)
  }

  private def dataFiles(fs: FileSystem, p: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f
    }
    buf.toSeq
  }

  /** Compact a flat (non-partitioned) parquet directory to
    * ≈`targetBytes` per file. Returns (files before, files after);
    * a directory already at or under the target file count is left
    * byte-identical (no write at all). */
  def compactDir(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    val (nFiles, totalBytes) = stats(spark, path)
    val want = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (nFiles <= want) return (nFiles, nFiles)
    // one shared durable swap implementation (Writers.stageAndSwap)
    Writers.stageAndSwap(spark.read.parquet(path).coalesce(want), path, None)
    (nFiles, stats(spark, path)._1)
  }

  /** Compact ONLY the date partitions of `path` holding more than
    * `maxFilesPerPartition` data files; untouched partitions are
    * never read or written (partition pruning on the read, dynamic
    * overwrite on the write). Returns the rewritten partition
    * values. */
  def compactDatePartitions(
      spark: SparkSession, path: String, dateCol: String,
      maxFilesPerPartition: Int): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val hot = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$dateCol="))
      .map(s => s.getPath.getName.stripPrefix(s"$dateCol=") ->
        dataFiles(fs, s.getPath).size)
      .collect { case (v, n) if n > maxFilesPerPartition => v }
      .sorted
    if (hot.isEmpty) return Seq.empty
    // partition pruning limits the read to the hot partitions; one
    // task per partition value makes one output file per partition.
    // The partition column is CAST to string so the rewritten
    // directory names are byte-identical to the originals — a
    // re-inferred value (date 2024-1-5 → 2024-01-05) would otherwise
    // land in a new directory while dynamic overwrite leaves the old
    // one alive, duplicating the partition.
    val frame = spark.read.parquet(path)
      .withColumn(dateCol, col(dateCol).cast("string"))
      .where(col(dateCol).isin(hot: _*))
      .repartition(hot.size, col(dateCol))
    Writers.stageAndSwap(frame, path, Some(dateCol))
    hot
  }
}
