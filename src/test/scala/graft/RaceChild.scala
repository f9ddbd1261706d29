package graft

/** Child-JVM entrypoints for CrossProcessLockSpec — a SECOND (and
  * third) real process racing [[graft.sources.Snapshots]] commits on a
  * shared root, so the OS file lock in
  * [[graft.sources.PosixCommitIO]] actually contends across process
  * boundaries (the in-JVM thread races in SnapshotsSpec serialize on
  * the per-root monitor before the file lock can ever matter). */
object RaceChild {
  def main(args: Array[String]): Unit = args(0) match {
    // append <root> <writerId> <n> [lease]: n sequential unkeyed delta
    // appends; "lease" swaps in the object-store-style arbiter
    // (graft.sources.LeaseCommitIO — create-if-absent + TTL, no POSIX
    // lock) so the cross-process race also exercises that seam impl
    case "append" =>
      val (root, writerId, n) = (args(1), args(2).toLong, args(3).toInt)
      if (args.length > 4 && args(4) == "lease")
        graft.sources.Snapshots.io = new graft.sources.LeaseCommitIO()
      val spark = GraftSession.builder(master = "local[2]", shufflePartitions = 2)
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("race-wh").toString)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      (0 until n).foreach { i =>
        graft.sources.Snapshots.commitAppend(
          Seq(writerId * 1000L + i).toDF("id"), root)
      }
      println(s"DONE $writerId")
      spark.stop()
      sys.exit(0)
    // absorbday <base> <day> <sfdir>: one CurationJob.absorbDaily day
    // (the #219 week gate's batch shape) against <base>/curated +
    // <base>/lsh — launched while the PARENT JVM runs nightly
    // maintenance on the same roots, so ingest-vs-compaction contends
    // across real process boundaries
    case "absorbday" =>
      val (base, day, sfdir) = (args(1), args(2).toInt, args(3))
      val spark = GraftSession.builder(master = "local[2]", shufflePartitions = 2)
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("race-wh").toString)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import org.apache.spark.sql.functions.col
      val corpus = spark.read.parquet(s"$sfdir/documents.parquet")
        .select(col("doc_id"), col("text"))
      graft.pipelines.CurationJob.absorbDaily(
        graft.queries.Indexing.weekBatch(corpus, day),
        s"$base/curated", s"$base/lsh", batchId = day.toLong)
      println(s"DONE day$day")
      spark.stop()
      sys.exit(0)
    // lockhold <root>: take the commit lock the way PosixCommitIO does
    // and hold it until killed — the dying-holder recovery scenario
    case "lockhold" =>
      val root = args(1)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(s"$root/_commitlock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      ch.lock()
      println("LOCKED")
      Console.out.flush()
      Thread.sleep(600000L)
  }
}
