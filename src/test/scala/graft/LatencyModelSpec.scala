package graft

import java.nio.file.Path
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import graft.catalog.{GraftStorage, KuduLikeCatalog, ObjectStoreStorage, TableDef}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Real-store cost model for the rename-less protocol (round-16 verdict
  * item 7). The [[ObjectStoreStorage]] emulation is semantically faithful
  * but FREE of latency, so a protocol could be correct yet unshippably
  * chatty — on a real store every control-plane call is a 10-100 ms HTTP
  * round trip. Rather than injecting wall-clock delays (which tests
  * flakily), this spec pins the deterministic proxy: the NUMBER of
  * control-plane operations per commit, counted at the storage seam.
  *
  * Pinned bounds:
  *  - a mutation-layer commit is ONE visibility PUT (the
  *    `_graft_committed` marker) — and its total control-plane cost does
  *    NOT grow with the table's accumulated history (a layer publish that
  *    walked prior layers would turn a year-old table's upserts into
  *    LIST storms);
  *  - the copy-republish paths (rename, clone) are O(file count) data
  *    copies — exactly one copy call per table file, plus O(1) commit
  *    writes (journal + manifest): the documented file-count bound. A
  *    10k-file table costs 10k server-side copies and still exactly ONE
  *    visibility PUT.
  */
class LatencyModelSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def up(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  test("a mutation-layer commit is ONE visibility PUT, zero renames, and " +
    "its control-plane cost stays FLAT as table history accumulates") {
    val st = new CountingStorage(new ObjectStoreStorage())
    val cat = new KuduLikeCatalog(spark, tmpDir("graft_lat_"), st)
    cat.createTable(TableDef("t", schema, Seq("id"), buckets = 2))
    cat.insert("t", up((0L until 20L).map(i => i -> s"v$i"): _*))

    def opsOfUpsert(k: Long): Map[String, Long] = {
      st.reset()
      assert(cat.upsert("t", up(k -> s"patched$k")) === 1)
      st.snapshot()
    }
    val first = opsOfUpsert(100L)
    assert(first("moveAtomic") === 0L, "rename-less: no rename anywhere")
    assert(st.commitMarkerPuts.sum() === 1L,
      "exactly one _graft_committed PUT made the layer visible")
    // burn history: more committed layers, then re-measure
    (101L until 106L).foreach(k => cat.upsert("t", up(k -> s"p$k")))
    st.commitMarkerPuts.reset()
    val later = opsOfUpsert(200L)
    assert(st.commitMarkerPuts.sum() === 1L)
    for (op <- Seq("writeString", "replaceFile", "claimMarker", "list",
        "linkOrCopy", "deleteRecursively")) {
      assert(later.getOrElse(op, 0L) <= first.getOrElse(op, 0L),
        s"$op grew with table history: first=${first.getOrElse(op, 0L)} " +
          s"later=${later.getOrElse(op, 0L)} — a layer commit must not " +
          "walk prior layers")
    }
  }

  test("rename republish: one copy call per table file + O(1) commit " +
    "writes — the documented file-count bound") {
    val st = new CountingStorage(new ObjectStoreStorage())
    val root = tmpDir("graft_lat2_")
    val cat = new KuduLikeCatalog(spark, root, st)
    cat.createTable(TableDef("t", schema, Seq("id"), buckets = 2))
    cat.insert("t", up((0L until 20L).map(i => i -> s"v$i"): _*))
    cat.upsert("t", up(1L -> "patched")) // some history to carry over
    // the files the republish must move: every non-dot file in the tree
    val files = st.inner.walkFiles(java.nio.file.Paths.get(root, "t"))
      .count { f =>
        val rel = java.nio.file.Paths.get(root, "t").relativize(f)
        !(0 until rel.getNameCount)
          .exists(i => rel.getName(i).toString.startsWith("."))
      }
    st.reset()
    cat.renameTable("t", "t2")
    val ops = st.snapshot()
    assert(ops("moveAtomic") === 0L)
    // every file copies exactly once EXCEPT the manifest, which is not
    // copied at all — it rides the single commit PUT below
    assert(ops("linkOrCopy") === files.toLong - 1L,
      s"republish must copy each of the ${files - 1} non-manifest files " +
        s"exactly once, did ${ops("linkOrCopy")}")
    // commit writes: the journal PUT + the manifest PUT (+ the layer
    // markers were COPIED, not re-PUT)
    assert(st.manifestPuts.sum() === 1L,
      "exactly one destination-manifest PUT commits the rename")
    assert(cat.exists("t2") && !cat.exists("t"))
    assert(cat.table("t2").count() === 20L)
  }
}

/** Storage wrapper counting control-plane calls per operation name — the
  * deterministic stand-in for per-call store latency. Data-plane parquet
  * IO goes through Spark, not this seam, so every count here is a
  * would-be HTTP round trip on a real object store.
  */
final class CountingStorage(val inner: GraftStorage) extends GraftStorage {
  private val counts = new ConcurrentHashMap[String, LongAdder]
  val commitMarkerPuts = new LongAdder
  val manifestPuts = new LongAdder

  private def tick(op: String): Unit =
    counts.computeIfAbsent(op, _ => new LongAdder).increment()

  def reset(): Unit = { counts.clear(); commitMarkerPuts.reset(); manifestPuts.reset() }

  def snapshot(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    counts.asScala.map { case (k, v) => k -> v.sum() }.toMap.withDefaultValue(0L)
  }

  override def supportsHardLink: Boolean = inner.supportsHardLink
  override def supportsAtomicRename: Boolean = inner.supportsAtomicRename
  override def supportsCrashReleasedLocks: Boolean = inner.supportsCrashReleasedLocks

  override def exists(p: Path): Boolean = { tick("exists"); inner.exists(p) }
  override def isDirectory(p: Path): Boolean = { tick("isDirectory"); inner.isDirectory(p) }
  override def isRegularFile(p: Path): Boolean = { tick("isRegularFile"); inner.isRegularFile(p) }
  override def list(p: Path): Seq[Path] = { tick("list"); inner.list(p) }
  override def walkFiles(p: Path): Seq[Path] = { tick("walkFiles"); inner.walkFiles(p) }
  override def createDirectories(p: Path): Unit = { tick("createDirectories"); inner.createDirectories(p) }
  override def claimMarker(p: Path): Unit = { tick("claimMarker"); inner.claimMarker(p) }
  override def deleteIfExists(p: Path): Unit = { tick("deleteIfExists"); inner.deleteIfExists(p) }
  override def deleteRecursively(p: Path): Unit = { tick("deleteRecursively"); inner.deleteRecursively(p) }
  override def lastModifiedMillis(p: Path): Long = { tick("lastModifiedMillis"); inner.lastModifiedMillis(p) }
  override def readString(p: Path): String = { tick("readString"); inner.readString(p) }
  override def readAllBytes(p: Path): Array[Byte] = { tick("readAllBytes"); inner.readAllBytes(p) }

  override def writeString(p: Path, s: String): Unit = {
    tick("writeString")
    val n = p.getFileName.toString
    if (n == "_graft_committed") commitMarkerPuts.increment()
    if (n == "_meta.json") manifestPuts.increment()
    inner.writeString(p, s)
  }

  override def replaceFile(tmp: Path, dst: Path): Unit = {
    tick("replaceFile")
    if (dst.getFileName.toString == "_meta.json") manifestPuts.increment()
    inner.replaceFile(tmp, dst)
  }

  override def moveAtomic(src: Path, dst: Path): Unit = { tick("moveAtomic"); inner.moveAtomic(src, dst) }
  override def linkOrCopy(link: Path, existing: Path): Unit = { tick("linkOrCopy"); inner.linkOrCopy(link, existing) }

  override def lockExclusive(lockFile: Path, timeoutMs: Long,
      owner: String): GraftStorage.Lease = {
    tick("lockExclusive"); inner.lockExclusive(lockFile, timeoutMs, owner)
  }
  override def lockShared(lockFile: Path, timeoutMs: Long,
      owner: String): GraftStorage.Lease = {
    tick("lockShared"); inner.lockShared(lockFile, timeoutMs, owner)
  }
}
