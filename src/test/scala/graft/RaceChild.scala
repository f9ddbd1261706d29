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
    // absorbday-stall <base> <day> <sfdir>: one absorbDaily day that
    // STALLS forever at the exact crash window the parent wants to
    // SIGKILL into — AFTER the LSH index absorb fully committed,
    // AFTER the curated append's distributed stage write, BEFORE the
    // curated commit's critical section (the lock for the curated
    // root is where the injected IO parks). The parent watches for
    // the marker, kills this JVM, and replays the day — the
    // composition must heal by batch-id idempotence.
    case "absorbday-stall" =>
      val (base, day, sfdir) = (args(1), args(2).toInt, args(3))
      val curatedRoot = s"$base/curated"
      graft.sources.Snapshots.io = new graft.sources.CommitIO {
        def withLock[T](root: String)(body: => T): T = {
          if (root == curatedRoot) {
            println("CORPUS_COMMIT_PENDING")
            Console.out.flush()
            Thread.sleep(600000L) // parked in the crash window until killed
          }
          graft.sources.PosixCommitIO.withLock(root)(body)
        }
        def moveStage(stage: java.nio.file.Path, dst: java.nio.file.Path): Unit =
          graft.sources.PosixCommitIO.moveStage(stage, dst)
        def publishPointer(root: String, bytes: Array[Byte]): Unit =
          graft.sources.PosixCommitIO.publishPointer(root, bytes)
      }
      val spark2 = GraftSession.builder(master = "local[2]", shufflePartitions = 2)
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("race-wh").toString)
        .getOrCreate()
      spark2.sparkContext.setLogLevel("ERROR")
      import org.apache.spark.sql.functions.{col => c2}
      val corpus2 = spark2.read.parquet(s"$sfdir/documents.parquet")
        .select(c2("doc_id"), c2("text"))
      graft.pipelines.CurationJob.absorbDaily(
        graft.queries.Indexing.weekBatch(corpus2, day),
        curatedRoot, s"$base/lsh", batchId = day.toLong)
      // unreachable: the stall above never returns; a child that gets
      // here somehow must fail loudly, not masquerade as the marker
      println("UNEXPECTED_COMPLETION")
      sys.exit(3)
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
