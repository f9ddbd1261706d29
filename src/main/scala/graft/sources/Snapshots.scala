package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned (time-travel) table on plain parquet + JSON manifests —
  * the lakehouse snapshot pattern behind Delta/Iceberg expressed with
  * no table-format dependency.
  *
  * Layout under a table root:
  * {{{
  *   <root>/data/v=N/part-*.parquet     immutable snapshot data
  *   <root>/manifests/vN.json           {"version":N,"rows":...,"parent":N-1}
  *   <root>/_latest                     atomic pointer file: "N"
  * }}}
  *
  * Writer protocol (crash-safe in commit order):
  *  1. write the snapshot's data directory (a failure here leaves an
  *     orphan `v=N` dir that the next writer OVERWRITES — readers
  *     never see it because the pointer still names the old version);
  *  2. write the manifest file;
  *  3. atomically move a temp pointer over `_latest` (the commit
  *     point — `ATOMIC_MOVE` on one small file, the same single-
  *     object-swap object stores give you).
  *
  * Readers resolve `_latest` (or an explicit version) and read ONE
  * immutable directory — no reader/writer race: concurrent readers of
  * version N are untouched by a writer committing N+1, and a reader
  * holding N can finish long after N+2 lands (until `vacuum` removes
  * N). This is the reference's `latest` snapshot idea
  * (tasks/base.py convert_latest_file) upgraded from copy-the-file to
  * versioned history with rollback.
  *
  * Scale posture: the data write is ONE distributed pass; manifests
  * and the pointer are O(1) driver-side metadata (the Delta/Iceberg
  * shape — metadata small, data distributed). Snapshot dirs are
  * immutable so object-store caching/read-replicas stay valid.
  */
object Snapshots {

  private def dataDir(root: String, v: Long) = s"$root/data/v=$v"
  private def manifest(root: String, v: Long): Path = Paths.get(s"$root/manifests/v$v.json")
  private def pointer(root: String): Path = Paths.get(s"$root/_latest")

  /** The committed latest version, if any. */
  def latestVersion(root: String): Option[Long] = {
    val p = pointer(root)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** All committed versions (manifest-backed), ascending. */
  def versions(root: String): Seq[Long] = {
    val dir = Paths.get(s"$root/manifests")
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong }
      .toSeq.sorted
  }

  /** Write `df` as the next snapshot version; returns the committed
    * version number. Readers of prior versions are unaffected. */
  def commit(df: DataFrame, root: String): Long = commitInternal(df, root, None)

  /** [[commit]] with hive-style partition directories on
    * `partitionCols` inside the snapshot's data dir — a reader
    * filtering on those columns prunes whole directories
    * (PartitionFilters), which is what makes a stored IVF index's
    * per-query cost probe-bucket-sized instead of corpus-sized. */
  def commitPartitioned(df: DataFrame, root: String, partitionCols: Seq[String]): Long =
    commitInternal(df, root, None, partitionCols)

  /** IDEMPOTENT commit keyed by an external batch id (a Structured
    * Streaming micro-batch id): replaying a batch id ≤ the last
    * committed one is a NO-OP, so a foreachBatch sink writing through
    * this method is exactly-once — the snapshot equivalent of
    * [[graft.streaming.EventsStream.idempotentBatchWriter]], with the
    * version history as a bonus (each micro-batch is a time-travel
    * point). Returns the committed (or already-current) version. */
  def commitBatch(df: DataFrame, root: String, batchId: Long): Long = {
    val latest = latestVersion(root)
    if (latest.exists(v => batchIdOf(root, v).exists(_ >= batchId))) latest.get
    else commitInternal(df, root, Some(batchId))
  }

  /** The batch id recorded in a version's manifest, if any. */
  def batchIdOf(root: String, v: Long): Option[Long] = {
    val m = manifest(root, v)
    if (!Files.exists(m)) None
    else "\"batchId\":(-?\\d+)".r
      .findFirstMatchIn(new String(Files.readAllBytes(m), StandardCharsets.UTF_8))
      .map(_.group(1).toLong)
  }

  private def commitInternal(df: DataFrame, root: String, batchId: Option[Long],
      partitionCols: Seq[String] = Seq.empty): Long = {
    val next = latestVersion(root).getOrElse(-1L) + 1
    // 1. data (distributed; overwrite clears any orphan from a crash)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dataDir(root, next))
    // 2. manifest (metadata — written before the pointer so a reader
    //    that sees the pointer always finds the manifest)
    val rows = df.sparkSession.read.parquet(dataDir(root, next)).count()
    Files.createDirectories(manifest(root, next).getParent)
    val batchField = batchId.map(b => s""","batchId":$b""").getOrElse("")
    Files.write(manifest(root, next),
      s"""{"version":$next,"rows":$rows,"parent":${next - 1}$batchField}"""
        .getBytes(StandardCharsets.UTF_8))
    // 3. commit point: atomic pointer swap
    val tmp = Paths.get(s"$root/_latest.tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read the latest committed snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root,
      latestVersion(root).getOrElse(
        throw new IllegalStateException(s"no committed version under $root")))

  /** Time travel: read an explicit version. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(Files.exists(manifest(root, v)), s"version $v was never committed (or vacuumed)")
    spark.read.parquet(dataDir(root, v))
  }

  /** Roll back: point `_latest` at an older committed version without
    * touching any data (the newer snapshots stay readable by explicit
    * version until vacuumed). */
  def rollback(root: String, v: Long): Unit = {
    require(Files.exists(manifest(root, v)), s"cannot roll back to uncommitted version $v")
    val tmp = Paths.get(s"$root/_latest.tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Retention: drop all snapshots older than `keep` versions behind
    * latest (never the pointer target), manifest first so a crashed
    * vacuum leaves data-without-manifest (invisible), not the
    * reverse. */
  def vacuum(root: String, keep: Int): Seq[Long] = {
    val latest = latestVersion(root).getOrElse(return Seq.empty)
    val drop = versions(root).filter(v => v < latest - keep.max(0) && v != latest)
    drop.foreach { v =>
      Files.deleteIfExists(manifest(root, v))
      val d = Paths.get(dataDir(root, v))
      if (Files.isDirectory(d)) {
        Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      }
    }
    drop
  }
}
