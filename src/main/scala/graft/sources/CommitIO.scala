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

/** The three object-store primitives a lease arbiter rests on — the
  * exact call shapes S3 / GCS / ABFS expose, so a production
  * [[LeaseCommitIO]] deployment implements THIS trait over its store
  * and the arbiter logic above it is unchanged:
  *  - `createIfAbsent` = conditional PUT (S3 `If-None-Match: *`, GCS
  *    `if-generation-match: 0`);
  *  - `read` = GET (returning the body a later conditional op names);
  *  - `conditionalDelete` = generation/etag-conditional DELETE (S3
  *    version-id, GCS `if-generation-match`) — delete ONLY if the
  *    object still holds `expected`, atomically. This is the
  *    primitive that closes the lease-break steal window: a breaker
  *    that read an expired lease can no longer delete a DIFFERENT
  *    (just-reacquired, live) lease that replaced it between the read
  *    and the delete.
  */
trait LeaseStore {
  /** Atomically create `p` with `bytes` iff absent; false if present. */
  def createIfAbsent(p: Path, bytes: Array[Byte]): Boolean
  /** Current bytes of `p`, None if it does not exist. */
  def read(p: Path): Option[Array[Byte]]
  /** Delete `p` iff its content still equals `expected` (the
    * store's generation-conditional delete); returns whether the
    * delete happened. MUST refuse when the content changed. */
  def conditionalDelete(p: Path, expected: Array[Byte]): Boolean
}

/** Local-filesystem [[LeaseStore]] emulation: `CREATE_NEW` for the
  * conditional put; the conditional delete is read-compare-delete
  * under a per-path JVM monitor — EXACT for every contender inside
  * one JVM (the spec-raced surface), while ACROSS local processes a
  * sub-microsecond compare-to-delete window remains (the disclosed
  * emulation residue — a real store's generation-conditional delete
  * is exact by API contract, and the call shape here is identical). */
object LocalLeaseStore extends LeaseStore {
  // STRIPED monitors (not a per-path map): a map entry per lease path
  // ever touched would grow for the JVM's lifetime in a driver that
  // commits to many roots; 256 hash-striped monitors bound the memory
  // while keeping the read-compare-delete exact per-JVM (two paths
  // sharing a stripe merely serialize, never interleave)
  private val monitors = Array.fill(256)(new Object)
  private def mon(p: Path) =
    monitors(math.floorMod(p.toString.hashCode, 256))

  def createIfAbsent(p: Path, bytes: Array[Byte]): Boolean =
    try { Files.write(p, bytes, java.nio.file.StandardOpenOption.CREATE_NEW); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  def read(p: Path): Option[Array[Byte]] =
    try Some(Files.readAllBytes(p))
    catch { case _: java.io.IOException => None }

  def conditionalDelete(p: Path, expected: Array[Byte]): Boolean =
    mon(p).synchronized {
      try {
        if (java.util.Arrays.equals(Files.readAllBytes(p), expected)) {
          Files.deleteIfExists(p); true
        } else false
      } catch { case _: java.io.IOException => false }
    }
}

/** OBJECT-STORE-STYLE reference arbiter: mutual exclusion built ONLY
  * on the three [[LeaseStore]] primitives — conditional put, read,
  * conditional delete — the set every major object store exposes, so
  * a deployment whose table roots live on such a store has a REAL
  * arbiter to plug through the [[CommitIO]] seam instead of the
  * silently-void POSIX file lock. No `FileChannel`: CommitIOSpec and
  * CrossProcessLockSpec race threads AND real JVMs under this IO to
  * prove the seam carries the whole protocol.
  *
  * Acquire = `createIfAbsent` of `<root>/_lease` carrying
  * `owner:nonce:expiryMs`. A holder that DIES leaves a lease that
  * expires after `ttlMs`, and the next writer breaks it with
  * `conditionalDelete(lease, the-expired-bytes-it-read)` — so a
  * lease that was broken and REACQUIRED between the breaker's read
  * and its delete is never mis-stolen: the content no longer matches
  * and the delete refuses (two concurrent breakers of the SAME
  * expired lease still collapse into one winner at the next
  * `createIfAbsent`). Release is the same conditional delete against
  * our own payload: a holder that stalled past its TTL and lost the
  * lease to a breaker cannot free the new holder's lock. The TTL
  * must exceed the critical section; the under-lock work is O(1)
  * metadata ops (that is the protocol's design), so the 60 s default
  * is ~4 orders of magnitude of headroom. NOT reentrant, same as the
  * POSIX file lock. */
final class LeaseCommitIO(ttlMs: Long = 60000L, pollMs: Long = 10L,
    store: LeaseStore = LocalLeaseStore) extends CommitIO {
  private val owner = java.util.UUID.randomUUID().toString

  def withLock[T](root: String)(body: => T): T = {
    Files.createDirectories(Paths.get(root))
    val lease = Paths.get(s"$root/_lease")
    var payload: Array[Byte] = null
    while (payload == null) {
      val attempt =
        s"$owner:${java.util.UUID.randomUUID()}:${System.currentTimeMillis() + ttlMs}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (store.createIfAbsent(lease, attempt)) payload = attempt
      else store.read(lease) match {
        case None => () // vanished between createIfAbsent and read: retry now
        case Some(cur) =>
          val s = new String(cur, java.nio.charset.StandardCharsets.UTF_8)
          val expired = s.substring(s.lastIndexOf(':') + 1).toLongOption
            .exists(_ < System.currentTimeMillis())
          // break a dead holder — CONDITIONALLY: only the exact bytes
          // we judged expired may be deleted. If another breaker beat
          // us and a fresh lease already replaced them, the delete
          // refuses and the next loop iteration sees the live lease.
          if (expired) { store.conditionalDelete(lease, cur); () }
          else Thread.sleep(pollMs)
      }
    }
    try body
    finally {
      // release ONLY our own lease: if we stalled past the TTL and a
      // breaker re-acquired, the conditional delete refuses to free
      // THEIR lock (exact under the store's generation-conditional
      // delete; the local emulation is exact per-JVM)
      store.conditionalDelete(lease, payload)
      ()
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
