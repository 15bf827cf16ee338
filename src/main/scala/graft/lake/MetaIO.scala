package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** All metadata-plane I/O for one graft table, through the Hadoop
  * FileSystem API — manifests, shards, the version pointer, named
  * refs, and the batch-tag ledger. A table rooted at `file:`, `hdfs:`,
  * `s3a:`, … resolves one FileSystem from its root URI and the
  * control plane never touches `java.nio` (the role
  * HadoopTableOperations plays for the reference:
  * table/SparkTableOperations.scala:1-159 routes all table metadata
  * through Iceberg's Hadoop table layer). The data plane was already
  * Hadoop-FS; this closes the gap that made non-local roots unopenable.
  *
  * Atomicity notes, by operation:
  *  - [[writeNew]] (exclusive create) is atomic on HDFS and maps to a
  *    conditional PUT on stores that support one; the local FS checks
  *    then creates, and the callers that need hard exclusion run under
  *    the [[CommitLock]].
  *  - [[writeAtomic]] (pointer swap) renames a temp file over the
  *    target: atomic replace on POSIX local FS; filesystems that
  *    refuse to rename over an existing target (HDFS FileSystem API)
  *    fall back to delete+rename, and readers ride out that window via
  *    the retry in [[GraftTable.currentId]] — the same stance Iceberg's
  *    HadoopTableOperations takes for version-hint.txt.
  */
final class MetaIO(root: String, private[lake] val conf: Configuration) {
  private val rootPath = new HPath(root)
  val fs: FileSystem = rootPath.getFileSystem(conf)
  private val metaPath = new HPath(rootPath, "meta")

  /** Local meta directory when the RESOLVED filesystem is local (the
    * root string alone can't tell — a schemeless root resolves against
    * `fs.defaultFS`, which may be HDFS on a cluster). Exclusive create
    * takes the O_EXCL fast path through it; see [[writeNew]].
    */
  private[lake] val localMeta: Option[java.nio.file.Path] =
    if (fs.getScheme == "file")
      Some(java.nio.file.Paths.get(fs.makeQualified(metaPath).toUri.getPath))
    else None

  def path(name: String): HPath = new HPath(metaPath, name)

  def exists(name: String): Boolean = fs.exists(path(name))

  def size(name: String): Long = fs.getFileStatus(path(name)).getLen

  def readBytes(name: String): Array[Byte] = {
    val p = path(name)
    val len = fs.getFileStatus(p).getLen.toInt
    val in = fs.open(p)
    try { val buf = new Array[Byte](len); in.readFully(0, buf); buf }
    finally in.close()
  }

  def readString(name: String): String =
    new String(readBytes(name), StandardCharsets.UTF_8)

  /** [[readString]] that rides out the transient no-file window of a
    * [[writeAtomic]] delete+rename fallback on filesystems without
    * rename-overwrite (the reader saw `exists` just before the swap).
    * Retries a few times, then rethrows — persistent absence is real.
    */
  def readStringRetrying(name: String): String = {
    var tries = 0
    while (true) {
      try return readString(name)
      catch {
        case e: java.io.FileNotFoundException =>
          if (tries >= 5) throw e
          tries += 1; Thread.sleep(20)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Exclusive create: fails with
    * [[org.apache.hadoop.fs.FileAlreadyExistsException]] when the file
    * already exists — the optimistic-concurrency primitive manifest
    * staging builds on. On a LOCAL filesystem this must be O_EXCL
    * (java.nio CREATE_NEW), not Hadoop's exists-check-then-create:
    * lock-free stagers ([[GraftTable.stageAppend]]) race on manifest
    * names by design, and a check-then-act loser would silently
    * truncate the winner's committed manifest instead of throwing.
    * HDFS's own create(overwrite=false) is atomic at the namenode.
    */
  def writeNew(name: String, bytes: Array[Byte]): Unit = localMeta match {
    case Some(dir) =>
      try {
        java.nio.file.Files.write(dir.resolve(name), bytes,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        ()
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"${path(name)} already exists")
      }
    case None =>
      val out = fs.create(path(name), false)
      try out.write(bytes) finally out.close()
  }

  /** Overwrite-in-place via temp file + rename (see class doc for the
    * per-filesystem atomicity story).
    */
  def writeAtomic(name: String, bytes: Array[Byte]): Unit = {
    val tmp = path(s"$name.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val dst = path(name)
    if (!fs.rename(tmp, dst)) {
      fs.delete(dst, false)
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"rename $tmp -> $dst failed")
    }
  }

  def delete(name: String): Boolean = fs.delete(path(name), false)

  /** Flat listing of the meta dir (empty when it does not exist). */
  def listNames(): Seq[String] =
    if (!fs.exists(metaPath)) Seq.empty
    else fs.listStatus(metaPath).toSeq.map(_.getPath.getName)

  /** Flat listing of a meta SUBdirectory (empty when absent) — keeps
    * bulk populations (manifest shards) out of the top-level listing
    * that snapshot-id discovery pays on every commit.
    */
  def listNames(sub: String): Seq[String] = {
    val p = new HPath(metaPath, sub)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** Ensure the parent directory of `name` exists (for names carrying
    * a subdirectory, e.g. `shards/...`; local CREATE_NEW does not
    * create parents).
    */
  def mkdirsFor(name: String): Unit = { fs.mkdirs(path(name).getParent); () }

  def mkdirs(): Unit = { fs.mkdirs(metaPath); () }
}

object MetaIO {
  /** Recursively delete a path through the Hadoop FileSystem API — the
    * replacement for local `rm -rf` shell-outs in work-dir setup, so
    * even the harness plumbing makes no local-FS assumption.
    */
  def deleteDir(path: String, conf: Configuration): Boolean = {
    val p = new HPath(path)
    p.getFileSystem(conf).delete(p, true)
  }
}

/** Serialize the COMMIT POINT (the version-pointer swap) across
  * writers — held for one manifest write + one rename, never during
  * data writes. Pluggable because no single primitive is atomic on
  * every filesystem: the local impl uses POSIX atomic mkdir, other
  * Hadoop filesystems get an exclusive-create lock file (atomic on
  * HDFS), and an object-store deployment would plug a conditional-PUT
  * or metastore lock here (the reference leans on Hive metastore
  * locking the same way).
  */
trait CommitLock {
  /** Block (poll) until the lock is held; throw
    * [[java.util.ConcurrentModificationException]] after ~10 s (a
    * crashed writer holds the lock forever — the error names the path
    * to remove).
    */
  def acquire(): Unit
  def release(): Unit
}

object CommitLock {
  private[lake] val TimeoutMs = 10000L

  /** Settle delay of [[ClaimCommitLock]]'s second VERIFY read: long
    * enough for a contending rename's PUT (fired before our first
    * read-back) to land and be observed, short enough to keep the
    * commit point cheap. Only the claim protocol pays it.
    */
  private[lake] val ClaimSettleMs = 50L

  /** A lock artifact older than this is orphaned with overwhelming
    * likelihood — the critical section is one manifest write plus one
    * pointer rename, milliseconds — so acquisition BREAKS it and
    * retries instead of demanding manual removal (a crashed writer
    * must not brick the table). Safety is layered: staged manifests
    * are exclusive-create and non-commutative commits CAS on the
    * parent id, so even a wrongly-broken lock (a writer stalled >5 min
    * inside the critical section) degrades to a clean
    * ConcurrentModificationException, never silent loss.
    */
  private[lake] val StaleMs = 5 * 60 * 1000L

  /** Schemes whose Hadoop client implements `create(overwrite=false)`
    * as a non-atomic exists-check-then-PUT over an object store (no
    * O_EXCL, no namenode to serialize creates) — these need the
    * claim-and-verify protocol instead of exclusive create.
    */
  private val ObjectStoreSchemes = Set(
    "s3a", "s3", "s3n", "gs", "oss", "cos", "wasb", "wasbs", "abfs",
    "abfss", "swift")

  /** Hadoop conf key forcing a specific lock impl (`mkdir` | `create` |
    * `claim`); unset = select by the resolved filesystem.
    */
  val ImplConfKey = "graft.commit.lock.impl"

  /** Lock impl for a table root, by the RESOLVED filesystem (not the
    * raw root string: a schemeless root resolves against
    * `fs.defaultFS`, so "/warehouse/t" on a cluster is HDFS — a local
    * mkdir there would be a per-node non-lock). Object-store schemes
    * get the claim-and-verify lock; `graft.commit.lock.impl` in the
    * Hadoop conf overrides (e.g. `claim` for an S3-compatible store
    * mounted under an unlisted scheme, or to exercise the object-store
    * protocol in tests on a local root).
    */
  def forRoot(root: String, io: MetaIO): CommitLock =
    // read the override from the Configuration the MetaIO was BUILT
    // with, not fs.getConf: Hadoop's FileSystem cache returns an
    // instance bound to the first Configuration seen for a
    // scheme/authority, so a per-table override would be silently
    // ignored (or leak across tables) through the cached conf
    Option(io.conf.get(ImplConfKey)).map(_.trim.toLowerCase) match {
      case Some("mkdir") => new MkdirCommitLock(root, io.localMeta.getOrElse(
        throw new IllegalArgumentException(
          s"$ImplConfKey=mkdir requires a local-filesystem root, got scheme ${io.fs.getScheme}")))
      case Some("create") => new CreateFileCommitLock(root, io)
      case Some("claim")  => new ClaimCommitLock(root, io)
      case Some(other) => throw new IllegalArgumentException(
        s"unknown $ImplConfKey=$other (expected mkdir|create|claim)")
      case None => io.localMeta match {
        case Some(meta)                                  => new MkdirCommitLock(root, meta)
        case None if ObjectStoreSchemes(io.fs.getScheme) => new ClaimCommitLock(root, io)
        case None                                        => new CreateFileCommitLock(root, io)
      }
    }

  /** `break` must be a single-winner CLAIM (rename the artifact to a
    * unique name, then remove the claim) — a plain delete would let two
    * timed-out waiters both "break", the second deleting the lock the
    * first just re-acquired. Returning false = someone else claimed it
    * (or it vanished): do not count it as our break, just retry. The
    * residual hazard — the age check racing a legitimate holder's
    * release+reacquire in the same millisecond — degrades to the
    * staged-manifest/CAS ConcurrentModificationException, never loss.
    */
  private[lake] def spin(root: String, what: String)(tryOnce: () => Boolean)(
      ageMs: () => Option[Long], break: () => Boolean): Unit = {
    var waitedMs = 0L
    var broke = false
    while (!tryOnce()) {
      if (waitedMs > TimeoutMs) {
        val age = ageMs()
        if (age.isEmpty) {
          waitedMs = 0L // lock vanished under us — it's free, retry
        } else if (!broke && age.exists(_ > StaleMs)) {
          if (break()) broke = true
          waitedMs = 0L
        } else throw new java.util.ConcurrentModificationException(
          s"commit lock on $root held >10s by a live writer (remove $what " +
            "if it is actually orphaned; locks older than 5min break automatically)")
      }
      Thread.sleep(10); waitedMs += 10
    }
  }
}

/** Local-FS commit lock: `mkdir meta/commit.lock` is atomic on POSIX
  * (and `java.nio` is correct here by construction — this impl is
  * selected only for `file:`/schemeless roots).
  */
final class MkdirCommitLock(root: String, localMeta: java.nio.file.Path) extends CommitLock {
  private val lockDir = localMeta.resolve("commit.lock")
  override def acquire(): Unit = CommitLock.spin(root, lockDir.toString) { () =>
    try { java.nio.file.Files.createDirectory(lockDir); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  } (
    ageMs = () =>
      try Some(System.currentTimeMillis() -
        java.nio.file.Files.getLastModifiedTime(lockDir).toMillis)
      catch { case _: java.io.IOException => None }, // vanished = retry
    break = () =>
      // atomic rename = single-winner claim of the stale artifact
      try {
        val claimed = lockDir.resolveSibling(
          s"commit.lock.broken-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.move(lockDir, claimed)
        java.nio.file.Files.deleteIfExists(claimed)
        true
      } catch { case _: java.io.IOException => false })
  override def release(): Unit = { java.nio.file.Files.deleteIfExists(lockDir); () }
}

/** Hadoop-FS commit lock: exclusive create of `meta/commit.lock`
  * (atomic on HDFS; object stores without atomic create-if-absent
  * should plug a conditional-PUT/metastore [[CommitLock]] instead).
  */
final class CreateFileCommitLock(root: String, io: MetaIO) extends CommitLock {
  private val Name = "commit.lock"
  override def acquire(): Unit = CommitLock.spin(root, io.path(Name).toString) { () =>
    try { io.writeNew(Name, Array.emptyByteArray); true }
    catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
  } (
    ageMs = () =>
      try Some(System.currentTimeMillis() -
        io.fs.getFileStatus(io.path(Name)).getModificationTime)
      catch { case _: java.io.IOException => None },
    break = () =>
      // rename-claim: exactly one timed-out waiter wins the artifact
      try {
        val claimed = io.path(s"$Name.broken-${java.util.UUID.randomUUID()}")
        if (io.fs.rename(io.path(Name), claimed)) {
          io.fs.delete(claimed, false); true
        } else false
      } catch { case _: java.io.IOException => false })
  override def release(): Unit = { io.delete(Name); () }
}

/** Object-store commit lock: a two-phase claim that never relies on an
  * atomic exclusive create (S3-class Hadoop clients implement
  * `create(overwrite=false)` as exists-check-then-PUT — two racers can
  * both "win"). Protocol per acquire attempt:
  *
  *  1. STAGE: write the contender's token to a unique candidate key
  *     (`commit.lock.cand-<token>` — fresh key, collision-free by
  *     construction, needs no atomicity).
  *  2. CLAIM: rename the candidate to `commit.lock`. On a store where
  *     rename is copy+PUT, two concurrent claims can both report
  *     success with last-PUT-wins content.
  *  3. VERIFY: read `commit.lock` back; hold the lock ONLY if our own
  *     token survived. A double-claim settles deterministically here —
  *     exactly one token is in the object, everyone else retries.
  *
  * The VERIFY step re-reads a second time after a settle delay: a
  * slower racer's rename can land AFTER our first read-back (both
  * contenders would then believe they hold the lock), and the settle
  * re-read catches any overwrite whose PUT completes within the
  * window. Requires read-after-write consistency, which S3 (since
  * 2020), GCS, and ADLS all provide.
  *
  * THE HONEST LIMIT: without a native conditional write there is no
  * hard mutual exclusion on an object store — a rename delayed past
  * the settle window still yields a double-hold, and a double-held
  * commit CAN lose a concurrent append (appends carry no parent-id
  * CAS by design). The settle window makes that improbable, not
  * impossible. For strict safety on a store with a conditional write
  * (S3 `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`,
  * DynamoDB `attribute_not_exists`), steps 1-3 collapse into one
  * conditional PUT — swap `tryClaim` for it; the spin/stale-break
  * protocol and every call site stay the same. `release` deletes only
  * if our token still holds the lock, so a broken-then-reassigned lock
  * is never deleted out from under the new holder.
  *
  * The reference avoids this problem class by committing through the
  * Hive metastore's transactional pointer swap
  * (table/SparkTableOperations.scala:60-120); this impl is the
  * storage-only equivalent for deployments without a metastore.
  */
final class ClaimCommitLock(root: String, io: MetaIO) extends CommitLock {
  private val Name = "commit.lock"
  private var token: String = ""

  private def tryClaim(): Boolean = {
    if (io.exists(Name)) return false
    val cand = s"$Name.cand-$token"
    val out = io.fs.create(io.path(cand), true)
    try out.write(token.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val renamed =
      try io.fs.rename(io.path(cand), io.path(Name))
      catch { case _: java.io.IOException => false }
    if (!renamed) { io.delete(cand); return false }
    def holder(): String =
      try io.readString(Name) catch { case _: java.io.IOException => "" }
    if (holder() != token) return false
    // settle re-read: catch a racer whose overwriting rename lands
    // after our first read-back (see class doc for the residual limit)
    Thread.sleep(CommitLock.ClaimSettleMs)
    holder() == token
  }

  override def acquire(): Unit = {
    token = java.util.UUID.randomUUID().toString
    CommitLock.spin(root, io.path(Name).toString)(() => tryClaim())(
      ageMs = () =>
        try Some(System.currentTimeMillis() -
          io.fs.getFileStatus(io.path(Name)).getModificationTime)
        catch { case _: java.io.IOException => None },
      break = () =>
        // rename-claim of the stale artifact: single winner, like the
        // other impls — the loser's rename returns false and it retries
        try {
          val claimed = io.path(s"$Name.broken-${java.util.UUID.randomUUID()}")
          if (io.fs.rename(io.path(Name), claimed)) {
            io.fs.delete(claimed, false); true
          } else false
        } catch { case _: java.io.IOException => false })
  }

  override def release(): Unit = {
    val holder = try io.readString(Name) catch { case _: java.io.IOException => "" }
    if (holder == token) { io.delete(Name); () }
  }
}
