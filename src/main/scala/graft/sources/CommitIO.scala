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
  * deployment MUST bring a conditional-put arbiter through this seam
  * — [[LeaseCommitIO]] is the shipped REFERENCE arbiter built on
  * exactly that primitive (create-if-absent + TTL lease), raced by
  * the same spec suites with the POSIX lock provably unused.
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

  /** Filenames directly under a table root that ARE this
    * implementation's lock/lease artifact. [[Snapshots.wipe]] runs
    * UNDER [[withLock]] and must spare every name here: deleting a
    * held POSIX lock file lets a new writer lock a recreated file
    * while the old holder keeps the unlinked inode; deleting a held
    * `_lease` hands the lease to a concurrent writer mid-wipe — both
    * are the two-owners hazard wipe exists to avoid. The default
    * covers both shipped arbiters so a seam swap can never reintroduce
    * it; a custom arbiter with its own artifact overrides. */
  def lockArtifacts: Set[String] = Set("_commitlock", "_lease")
}

/** OBJECT-STORE-STYLE reference arbiter: mutual exclusion built ONLY
  * on atomic create-if-absent plus a liveness LEASE — the primitive
  * every major object store exposes (S3 `If-None-Match` conditional
  * PUT, GCS `if-generation-match: 0`, ABFS conditional create) — so a
  * deployment whose table roots live on such a store has a REAL
  * arbiter to plug through the [[CommitIO]] seam instead of the
  * silently-void POSIX file lock. No `FileChannel`, no JVM monitor:
  * CommitIOSpec and CrossProcessLockSpec race threads AND real JVMs
  * under this IO to prove the seam carries the whole protocol.
  *
  * Acquire = `CREATE_NEW` of `<root>/_lease` carrying
  * `owner:nonce:expiryMs`; release = delete. A holder that DIES
  * leaves a lease that expires after `ttlMs`, and the next writer
  * breaks it — here with a plain delete-then-retry (two concurrent
  * breakers collapse into one winner at the next `CREATE_NEW`). The
  * local-filesystem emulation has a microsecond read-to-delete window
  * in which a just-broken-and-reacquired lease could be mis-stolen; a
  * production store impl closes it with the store's
  * generation-conditional delete (S3 version-id / GCS generation) —
  * the seam method is the same. The TTL must exceed the critical
  * section; the under-lock work is O(1) metadata ops (that is the
  * protocol's design), so the 60 s default is ~4 orders of magnitude
  * of headroom. NOT reentrant, same as the POSIX file lock. */
final class LeaseCommitIO(ttlMs: Long = 60000L, pollMs: Long = 10L)
    extends CommitIO {
  private val owner = java.util.UUID.randomUUID().toString

  def withLock[T](root: String)(body: => T): T = {
    Files.createDirectories(Paths.get(root))
    val lease = Paths.get(s"$root/_lease")
    var payload: Array[Byte] = null
    while (payload == null) {
      val attempt =
        s"$owner:${java.util.UUID.randomUUID()}:${System.currentTimeMillis() + ttlMs}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      try {
        Files.write(lease, attempt, java.nio.file.StandardOpenOption.CREATE_NEW)
        payload = attempt
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val expired =
            try {
              val cur = new String(Files.readAllBytes(lease),
                java.nio.charset.StandardCharsets.UTF_8)
              cur.substring(cur.lastIndexOf(':') + 1).toLongOption
                .exists(_ < System.currentTimeMillis())
            } catch { // vanished between CREATE_NEW and read: retry now
              case _: java.io.IOException => true
            }
          if (expired) Files.deleteIfExists(lease) // break a dead holder
          else Thread.sleep(pollMs)
      }
    }
    try body
    finally {
      // release ONLY our own lease: if we stalled past the TTL and a
      // breaker re-acquired, deleting blindly would free THEIR lock
      // (the store impl's conditional delete makes this exact)
      try {
        if (java.util.Arrays.equals(Files.readAllBytes(lease), payload))
          Files.deleteIfExists(lease)
      } catch { case _: java.io.IOException => () }
    }
  }

  def moveStage(stage: Path, dst: Path): Unit =
    Files.move(stage, dst)

  def publishPointer(root: String, bytes: Array[Byte]): Unit = {
    // under the lease the swap needs no rename atomicity for
    // WRITER-writer safety; the tmp+move keeps READERS tear-free on
    // the local emulation (a store impl does one conditional PUT)
    PosixCommitIO.publishPointer(root, bytes)
  }
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
