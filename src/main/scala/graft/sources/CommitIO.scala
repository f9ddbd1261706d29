package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The COMMIT ARBITER seam of [[Snapshots]]: the three filesystem
  * primitives on which the multi-writer commit protocol's correctness
  * rests, extracted behind an interface so (a) the degradation story
  * on storage that lacks POSIX semantics is testable code — specs run
  * the same race suites against a fault-injecting implementation
  * (lost lock, torn pointer publish, non-atomic stage move) and pin
  * what actually breaks — and (b) an object-store deployment has a
  * real extension point: implement `withLock`/`publishPointer` over
  * the store's conditional-put (e.g. if-match on the pointer object,
  * or a DynamoDB-style lock table, the same designs Delta/Iceberg
  * document for S3) instead of inheriting a silently-void file lock.
  *
  * The DEFAULT ([[PosixCommitIO]]) gives the full multi-writer
  * guarantee ONLY on a local or shared-POSIX filesystem (NFS/Lustre
  * class — advisory `FileChannel.lock` + atomic rename). It is NOT
  * object-store-safe: `Files.move(ATOMIC_MOVE)` has no conditional
  * semantics there and the OS file lock does not exist, so two
  * drivers could both claim a version and the loser's dead-timeline
  * truncation would delete the winner's committed manifest. That
  * deployment MUST bring a conditional-put arbiter through this seam.
  */
trait CommitIO {
  /** Mutual exclusion for all METADATA mutations on one table root
    * (version claim + manifest + pointer, rollback, vacuum). Must
    * exclude across processes sharing the root, and must be released
    * if the holder dies. */
  def withLock[T](root: String)(body: => T): T

  /** Move a fully-written stage directory to its committed data
    * location. Runs under [[withLock]]; must either fully appear at
    * `dst` or not at all (readers never see a torn directory). */
  def moveStage(stage: Path, dst: Path): Unit

  /** Atomically publish the `_latest` pointer bytes — THE commit
    * point. A reader must see either the old or the new pointer,
    * never a partial write. */
  def publishPointer(root: String, bytes: Array[Byte]): Unit
}

/** POSIX implementation: a JVM-level monitor (FileChannel refuses
  * overlapping locks inside one process) wrapping an advisory OS file
  * lock on `<root>/_commitlock` (cross-process on a shared POSIX
  * filesystem; auto-released by the OS when the holder dies — see
  * CrossProcessLockSpec, which races real JVMs and kills a holder),
  * directory rename for the stage move, and write-temp-then-
  * ATOMIC_MOVE for the pointer. */
object PosixCommitIO extends CommitIO {
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def withLock[T](root: String)(body: => T): T = {
    val mon = monitors.computeIfAbsent(root, _ => new Object)
    mon.synchronized {
      Files.createDirectories(Paths.get(root))
      val ch = java.nio.channels.FileChannel.open(Paths.get(s"$root/_commitlock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try body finally lk.release()
      } finally ch.close()
    }
  }

  def moveStage(stage: Path, dst: Path): Unit =
    Files.move(stage, dst)

  def publishPointer(root: String, bytes: Array[Byte]): Unit = {
    val tmp = Paths.get(s"$root/_latest.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, Paths.get(s"$root/_latest"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
