package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** The catalog's storage seam — every commit-protocol primitive
  * [[KuduLikeCatalog]] relies on, behind one small interface with an
  * explicit capability matrix. The reference reaches its store through
  * conf-bound RPC to Kudu masters/tablet servers (reference:
  * KuduStorageHandler.java:226, HiveKuduTableInputFormat.java:148-223);
  * this catalog's analog of "the server" is a filesystem contract, and a
  * 100-TB deployment lives on HDFS or an object store — not a local POSIX
  * disk — so the contract must name exactly which primitives each backend
  * really provides and what replaces the ones it lacks.
  *
  * Capability matrix (what the commit protocol needs, per backend):
  *
  * | primitive              | POSIX ([[NioStorage]]) | HDFS ([[HadoopStorage]]) | S3-class object store |
  * |------------------------|------------------------|--------------------------|-----------------------|
  * | atomic file replace    | rename(2)              | FileContext OVERWRITE rename | versioned manifest + pointer-object PUT (PUT is per-object atomic; rename does not exist) |
  * | atomic dir move        | rename(2)              | NameNode rename          | NOT AVAILABLE — commit must ride the manifest pointer, stage dirs become immutable named generations (exactly the `data_<epoch>` discipline this catalog already uses: the STAGE name changes, the manifest swap IS the commit) |
  * | hardlink (zero-copy clone) | link(2)            | none → copy fallback     | none → server-side copy fallback |
  * | create-exclusive claim | mkdir(2)               | create(overwrite=false) (atomic at the NameNode) | conditional PUT (If-None-Match) |
  * | crash-released locks   | OS file locks          | none → marker lease with staleness TTL | none → marker lease with staleness TTL |
  *
  * Everything above the seam — reservation protocol, staged-then-swap
  * commits, the manifest as the single commit point, burn-before-delete —
  * is backend-independent; CrashSpec's cut-point kills prove the protocol
  * against any implementation of this trait.
  *
  * Paths are `java.nio.file.Path` (the catalog's currency); implementations
  * map them to their native addressing (HadoopStorage via `Path.toUri`).
  */
trait GraftStorage {

  /** Hardlinks available? When false, [[linkOrCopy]] copies bytes: clone /
    * ADD RANGE re-open / incremental compact degrade from O(file count) to
    * O(bytes) but stay CORRECT — the commit protocol never depends on link
    * identity, only on the staged tree being complete before the swap.
    */
  def supportsHardLink: Boolean

  /** True when [[moveAtomic]]/[[replaceFile]] are single atomic metadata
    * ops (POSIX rename, HDFS NameNode rename). An object-store
    * implementation must answer false and commit through the manifest
    * pointer instead (see the capability matrix above).
    */
  def supportsAtomicRename: Boolean

  /** True when the platform releases a crashed holder's locks (OS file
    * locks). When false, the lease implementation must break stale locks
    * by age — a crashed writer delays, never wedges, the table.
    */
  def supportsCrashReleasedLocks: Boolean

  def exists(p: Path): Boolean
  def isDirectory(p: Path): Boolean
  def isRegularFile(p: Path): Boolean

  /** Immediate children; empty for a missing or non-directory path. */
  def list(p: Path): Seq[Path]

  /** All regular files under `p`, recursively; empty if `p` is missing. */
  def walkFiles(p: Path): Seq[Path]

  def createDirectories(p: Path): Unit

  /** Atomic create-exclusive claim of a marker (the reservation-protocol
    * primitive): exactly one concurrent claimer wins; losers get
    * [[GraftStorage.MarkerExistsException]]. The marker is visible in
    * [[list]] under its name until deleted.
    */
  def claimMarker(p: Path): Unit

  def deleteIfExists(p: Path): Unit
  def deleteRecursively(p: Path): Unit
  def lastModifiedMillis(p: Path): Long

  def readString(p: Path): String
  def readAllBytes(p: Path): Array[Byte]
  def writeString(p: Path, s: String): Unit

  /** Publish a control file: `tmp` atomically replaces `dst` (which may
    * exist). This IS the manifest commit point — a reader sees the old
    * bytes or the new bytes, never a mix, and a crash leaves one of the
    * two complete states.
    */
  def replaceFile(tmp: Path, dst: Path): Unit

  /** Move a completed staged directory (or file) to its final name; `dst`
    * must not exist. The visibility flip of layer/clone/rename commits.
    */
  def moveAtomic(src: Path, dst: Path): Unit

  /** Make `link` refer to `existing`'s content: a hardlink when
    * [[supportsHardLink]], otherwise a byte copy. Callers must treat the
    * result as immutable shared content either way (the catalog's
    * append-only discipline already guarantees this).
    */
  def linkOrCopy(link: Path, existing: Path): Unit

  /** Exclusive cross-process lease on `lockFile` (DDL / staged-swap
    * writers). Blocks up to `timeoutMs`, then throws [[CatalogException]].
    */
  def lockExclusive(lockFile: Path, timeoutMs: Long, owner: String): GraftStorage.Lease

  /** Shared cross-process lease on the same file (mutation-layer writers):
    * concurrent with other shared holders, mutually exclusive with
    * [[lockExclusive]].
    */
  def lockShared(lockFile: Path, timeoutMs: Long, owner: String): GraftStorage.Lease
}

object GraftStorage {
  /** A held lock; `close()` releases it. */
  trait Lease extends AutoCloseable

  /** Thrown by [[GraftStorage.claimMarker]] when the marker is taken —
    * the storage-neutral face of create-exclusive conflicts (java.nio's
    * FileAlreadyExistsException, Hadoop's own FileAlreadyExistsException,
    * an object store's 412 Precondition Failed).
    */
  final class MarkerExistsException(path: String)
      extends RuntimeException(s"marker already exists: $path")
}

/** POSIX-primitive implementation — `java.nio` exactly as the catalog used
  * directly before the seam: rename(2) moves, link(2) clones, OS file
  * locks (released by the kernel if the holder dies).
  */
object NioStorage extends GraftStorage {
  import java.nio.file.StandardCopyOption.{ATOMIC_MOVE, REPLACE_EXISTING}

  override val supportsHardLink = true
  override val supportsAtomicRename = true
  override val supportsCrashReleasedLocks = true

  override def exists(p: Path): Boolean = Files.exists(p)
  override def isDirectory(p: Path): Boolean = Files.isDirectory(p)
  override def isRegularFile(p: Path): Boolean = Files.isRegularFile(p)

  override def list(p: Path): Seq[Path] = {
    val fs = p.toFile.listFiles()
    if (fs == null) Seq.empty else fs.map(_.toPath).toSeq
  }

  override def walkFiles(p: Path): Seq[Path] =
    if (!Files.exists(p)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(p)) { stream =>
        stream.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      }
    }

  override def createDirectories(p: Path): Unit = Files.createDirectories(p)

  override def claimMarker(p: Path): Unit =
    try Files.createDirectory(p)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new GraftStorage.MarkerExistsException(p.toString)
    }

  override def deleteIfExists(p: Path): Unit = Files.deleteIfExists(p)

  override def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))

  override def lastModifiedMillis(p: Path): Long =
    Files.getLastModifiedTime(p).toMillis

  override def readString(p: Path): String = Files.readString(p)
  override def readAllBytes(p: Path): Array[Byte] = Files.readAllBytes(p)
  override def writeString(p: Path, s: String): Unit = Files.writeString(p, s)

  override def replaceFile(tmp: Path, dst: Path): Unit =
    Files.move(tmp, dst, ATOMIC_MOVE, REPLACE_EXISTING)

  override def moveAtomic(src: Path, dst: Path): Unit =
    Files.move(src, dst, ATOMIC_MOVE)

  override def linkOrCopy(link: Path, existing: Path): Unit =
    Files.createLink(link, existing)

  override def lockExclusive(lockFile: Path, timeoutMs: Long,
      owner: String): GraftStorage.Lease = {
    val ch = java.nio.channels.FileChannel.open(lockFile,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      var fl: java.nio.channels.FileLock = null
      val deadline = System.nanoTime + timeoutMs * 1000000L
      while (fl == null) {
        fl = ch.tryLock()
        if (fl == null) {
          if (System.nanoTime > deadline) throw new CatalogException(
            s"$owner: timed out after ${timeoutMs}ms waiting for the " +
              "table write lock (held by another writer process; OS file " +
              "locks release automatically when their holder exits — a " +
              "persistent hold means a live long-running writer, not a " +
              "crashed one). Tune graft.write.lock.timeout.ms if needed.")
          Thread.sleep(50)
        }
      }
      val theLock = fl
      new GraftStorage.Lease {
        override def close(): Unit =
          try theLock.release() finally ch.close()
      }
    } catch { case e: Throwable => ch.close(); throw e }
  }

  /** Refcounted per-path: java.nio rejects overlapping locks inside one
    * JVM, so in-process shared holders share one OS-level shared lock
    * (see [[KuduLikeCatalog.SharedFileLock]]).
    */
  override def lockShared(lockFile: Path, timeoutMs: Long,
      owner: String): GraftStorage.Lease = {
    val st = KuduLikeCatalog.sharedFileLocks.computeIfAbsent(
      lockFile.toAbsolutePath.normalize.toString,
      _ => new KuduLikeCatalog.SharedFileLock)
    st.acquire(lockFile, timeoutMs, owner)
    new GraftStorage.Lease {
      override def close(): Unit = st.release()
    }
  }
}

/** Hadoop-FileSystem implementation — the seam's proof that the commit
  * protocol runs where a 100-TB corpus actually lives. All namespace and
  * data ops go through `org.apache.hadoop.fs` (FileSystem / FileContext),
  * resolved per-path from its URI, so the SAME code serves `file://`
  * (tested here), `hdfs://` (atomic NameNode renames, create-exclusive
  * claims), and — with the documented capability degradations — object
  * stores.
  *
  * Capability deltas vs POSIX:
  *  - no hardlink API → [[linkOrCopy]] copies (clone correctness is
  *    unchanged — StorageDegradationSpec proves it — at O(bytes) cost);
  *  - no OS file locks → leases are marker files: exclusive = one
  *    create-exclusive `.x` file (atomic on HDFS), shared = per-holder
  *    marker under a `.shared/` dir, each fenced against the other; a
  *    crashed holder's marker is broken by age (`staleMs`) — a crash
  *    DELAYS other writers, never wedges them (the trait documents this
  *    as the `supportsCrashReleasedLocks=false` contract).
  */
class HadoopStorage(conf: org.apache.hadoop.conf.Configuration,
    staleMs: Long = 30L * 60 * 1000) extends GraftStorage {
  import org.apache.hadoop.fs.{FileContext, FileSystem, FileUtil, Options, Path => HPath}

  def this() = this(new org.apache.hadoop.conf.Configuration())

  private def hp(p: Path): HPath = new HPath(p.toUri)

  /** Raw filesystem — ChecksumFileSystem unwrapped for `file://`: its
    * `.crc` sidecars desync under the rename-based commit protocol (a
    * replaced control file would verify against the PREVIOUS generation's
    * checksum), and its create(overwrite=false) is no more atomic than
    * the raw one. HDFS/object-store schemes pass through unchanged.
    */
  private def fs(p: Path): FileSystem =
    hp(p).getFileSystem(conf) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case x => x
    }

  private def fc(p: Path): FileContext =
    FileContext.getFileContext(hp(p).toUri, conf)

  override val supportsHardLink = false
  override val supportsAtomicRename = true // HDFS + local; object stores: no
  override val supportsCrashReleasedLocks = false

  override def exists(p: Path): Boolean = fs(p).exists(hp(p))

  override def isDirectory(p: Path): Boolean = {
    val f = fs(p)
    f.exists(hp(p)) && f.getFileStatus(hp(p)).isDirectory
  }

  override def isRegularFile(p: Path): Boolean = {
    val f = fs(p)
    f.exists(hp(p)) && f.getFileStatus(hp(p)).isFile
  }

  override def list(p: Path): Seq[Path] = {
    val f = fs(p)
    if (!f.exists(hp(p)) || !f.getFileStatus(hp(p)).isDirectory) Seq.empty
    else f.listStatus(hp(p)).toSeq.map(st => Paths.get(st.getPath.toUri))
  }

  override def walkFiles(p: Path): Seq[Path] = {
    val f = fs(p)
    if (!f.exists(hp(p))) Seq.empty
    else {
      val out = Seq.newBuilder[Path]
      val it = f.listFiles(hp(p), /*recursive=*/ true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) out += Paths.get(st.getPath.toUri)
      }
      out.result()
    }
  }

  override def createDirectories(p: Path): Unit = { fs(p).mkdirs(hp(p)); () }

  /** Create-exclusive FILE (atomic at the HDFS NameNode; `mkdirs` is a
    * mkdir -p and cannot claim). Same visibility contract: the marker
    * lists under its name.
    *
    * `file://` caveat: RawLocalFileSystem's create(overwrite=false) is a
    * check-then-create, NOT atomic — so local claims additionally hold a
    * JVM-wide mutex, which makes them atomic for every in-process writer
    * (this suite's model). TRUE multi-process local deployments should
    * use [[NioStorage]] — local POSIX is exactly its domain; this class
    * exists for the schemes (hdfs://) where create IS a namespace-atomic
    * server op.
    */
  override def claimMarker(p: Path): Unit = {
    def doCreate(): Unit =
      try fs(p).create(hp(p), /*overwrite=*/ false).close()
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException =>
          throw new GraftStorage.MarkerExistsException(p.toString)
        case e: java.io.IOException
            if e.getMessage != null && e.getMessage.contains("exists") =>
          // RawLocalFileSystem reports the conflict as a plain IOException
          throw new GraftStorage.MarkerExistsException(p.toString)
      }
    if ("file" == hp(p).toUri.getScheme || hp(p).toUri.getScheme == null)
      HadoopStorage.localClaimMutex.synchronized {
        if (exists(p)) throw new GraftStorage.MarkerExistsException(p.toString)
        doCreate()
      }
    else doCreate()
  }

  override def deleteIfExists(p: Path): Unit = {
    fs(p).delete(hp(p), /*recursive=*/ false); ()
  }

  override def deleteRecursively(p: Path): Unit = {
    fs(p).delete(hp(p), /*recursive=*/ true); ()
  }

  override def lastModifiedMillis(p: Path): Long =
    fs(p).getFileStatus(hp(p)).getModificationTime

  override def readString(p: Path): String =
    new String(readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)

  override def readAllBytes(p: Path): Array[Byte] = {
    val in = fs(p).open(hp(p))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  override def writeString(p: Path, s: String): Unit = {
    val out = fs(p).create(hp(p), /*overwrite=*/ true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  override def replaceFile(tmp: Path, dst: Path): Unit =
    fc(dst).rename(hp(tmp), hp(dst), Options.Rename.OVERWRITE)

  override def moveAtomic(src: Path, dst: Path): Unit =
    fc(dst).rename(hp(src), hp(dst), Options.Rename.NONE)

  override def linkOrCopy(link: Path, existing: Path): Unit = {
    val ok = FileUtil.copy(fs(existing), hp(existing), fs(link), hp(link),
      /*deleteSource=*/ false, /*overwrite=*/ false, conf)
    if (!ok) throw new java.io.IOException(s"copy $existing -> $link failed")
  }

  // ── marker leases ──
  // Exclusive = `.x` file claimed create-exclusively; it fences NEW shared
  // holders, then the acquirer drains existing shared markers. Shared =
  // per-holder uuid marker under `.shared/`, verified against `.x` AFTER
  // registering (claim-then-check closes the register/fence race: either
  // the exclusive claimer sees the marker and waits, or the shared holder
  // sees `.x` and backs off). Staleness (`staleMs`) breaks markers whose
  // holder crashed.

  private def freshEnough(p: Path): Boolean =
    try System.currentTimeMillis() - lastModifiedMillis(p) < staleMs
    catch { case _: Exception => false } // vanished while checking

  private def breakIfStale(p: Path): Unit =
    if (exists(p) && !freshEnough(p)) deleteIfExists(p)

  override def lockExclusive(lockFile: Path, timeoutMs: Long,
      owner: String): GraftStorage.Lease = {
    val x = lockFile.resolveSibling(lockFile.getFileName.toString + ".x")
    val sharedDir = lockFile.resolveSibling(lockFile.getFileName.toString + ".shared")
    val deadline = System.nanoTime + timeoutMs * 1000000L
    var claimed = false
    while (!claimed) {
      breakIfStale(x)
      try { claimMarker(x); claimed = true }
      catch {
        case _: GraftStorage.MarkerExistsException =>
          if (System.nanoTime > deadline) throw new CatalogException(
            s"$owner: timed out after ${timeoutMs}ms waiting for the table " +
              "write lock (marker lease held by another writer; stale " +
              s"markers break after ${staleMs}ms). Tune " +
              "graft.write.lock.timeout.ms if needed.")
          Thread.sleep(50)
      }
    }
    try {
      // drain live shared holders; stale ones break by age
      while (list(sharedDir).exists(freshEnough)) {
        if (System.nanoTime > deadline) throw new CatalogException(
          s"$owner: timed out after ${timeoutMs}ms waiting for shared " +
            "mutation writers to drain. Tune graft.write.lock.timeout.ms " +
            "if needed.")
        Thread.sleep(50)
      }
    } catch { case e: Throwable => deleteIfExists(x); throw e }
    new GraftStorage.Lease {
      override def close(): Unit = deleteIfExists(x)
    }
  }

  override def lockShared(lockFile: Path, timeoutMs: Long,
      owner: String): GraftStorage.Lease = {
    val x = lockFile.resolveSibling(lockFile.getFileName.toString + ".x")
    val sharedDir = lockFile.resolveSibling(lockFile.getFileName.toString + ".shared")
    val marker = sharedDir.resolve(java.util.UUID.randomUUID().toString)
    val deadline = System.nanoTime + timeoutMs * 1000000L
    var held = false
    while (!held) {
      breakIfStale(x)
      if (!exists(x)) {
        createDirectories(sharedDir)
        try claimMarker(marker) catch {
          case _: GraftStorage.MarkerExistsException => () // ours alone; unreachable
        }
        if (exists(x) && freshEnough(x)) deleteIfExists(marker) // lost the race
        else held = true
      }
      if (!held) {
        if (System.nanoTime > deadline) throw new CatalogException(
          s"$owner: timed out after ${timeoutMs}ms waiting for the shared " +
            "table lock (a DDL writer holds the exclusive marker). Tune " +
            "graft.write.lock.timeout.ms if needed.")
        Thread.sleep(50)
      }
    }
    new GraftStorage.Lease {
      override def close(): Unit = deleteIfExists(marker)
    }
  }
}

object HadoopStorage {
  /** See [[HadoopStorage.claimMarker]]: makes `file://` claims atomic for
    * in-process writers (RawLocalFileSystem's create-exclusive is
    * check-then-create).
    */
  private[catalog] val localClaimMutex = new Object
}

/** Capability-degradation wrapper for tests and object-store modeling:
  * delegates everything to `inner` but reports (and enforces) hardlinks
  * unavailable, so [[GraftStorage.linkOrCopy]] really copies. Used by
  * StorageDegradationSpec to prove clone / ADD RANGE re-open / incremental
  * compact stay atomic and correct with zero-copy off.
  */
final class NoHardLinkStorage(inner: GraftStorage) extends GraftStorage {
  override val supportsHardLink = false
  override def supportsAtomicRename: Boolean = inner.supportsAtomicRename
  override def supportsCrashReleasedLocks: Boolean = inner.supportsCrashReleasedLocks

  override def exists(p: Path): Boolean = inner.exists(p)
  override def isDirectory(p: Path): Boolean = inner.isDirectory(p)
  override def isRegularFile(p: Path): Boolean = inner.isRegularFile(p)
  override def list(p: Path): Seq[Path] = inner.list(p)
  override def walkFiles(p: Path): Seq[Path] = inner.walkFiles(p)
  override def createDirectories(p: Path): Unit = inner.createDirectories(p)
  override def claimMarker(p: Path): Unit = inner.claimMarker(p)
  override def deleteIfExists(p: Path): Unit = inner.deleteIfExists(p)
  override def deleteRecursively(p: Path): Unit = inner.deleteRecursively(p)
  override def lastModifiedMillis(p: Path): Long = inner.lastModifiedMillis(p)
  override def readString(p: Path): String = inner.readString(p)
  override def readAllBytes(p: Path): Array[Byte] = inner.readAllBytes(p)
  override def writeString(p: Path, s: String): Unit = inner.writeString(p, s)
  override def replaceFile(tmp: Path, dst: Path): Unit = inner.replaceFile(tmp, dst)
  override def moveAtomic(src: Path, dst: Path): Unit = inner.moveAtomic(src, dst)

  override def linkOrCopy(link: Path, existing: Path): Unit =
    Files.copy(existing, link)

  override def lockExclusive(lockFile: Path, timeoutMs: Long,
      owner: String): GraftStorage.Lease =
    inner.lockExclusive(lockFile, timeoutMs, owner)
  override def lockShared(lockFile: Path, timeoutMs: Long,
      owner: String): GraftStorage.Lease =
    inner.lockShared(lockFile, timeoutMs, owner)
}
