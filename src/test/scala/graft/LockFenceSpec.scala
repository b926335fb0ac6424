package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Cross-process DDL fence (round-10 verdict item 5): mutation writers hold
  * the table's `.write_lock` file in SHARED mode, DDL/compact/insert hold
  * it EXCLUSIVE — so a schema-changing DDL in one process and a mutation
  * writer in another serialize instead of interleaving a meta swap with a
  * layer write. These are REAL two-process tests: the other side is a
  * forked `java` running [[LockProbe]], which locks the same file through
  * the OS (java.nio file locks are per-process, so a fork is the only
  * honest way to exercise the cross-process mode from a test).
  */
class LockFenceSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def mk(): (KuduLikeCatalog, String) = {
    val root = tmpDir("graft_fence_")
    val cat = new KuduLikeCatalog(spark, root)
    cat.createTable(TableDef("t", schema, Seq("id")))
    assert(cat.insert("t", spark.createDataFrame(
      (0L until 10L).map(i => Row(i, s"v$i")).asJava, schema)) === 10)
    (cat, root)
  }

  private def lockFile(root: String) = s"$root/t/.write_lock"

  /** Fork a JVM that locks `file` in `mode` ("shared"|"exclusive").
    * action "probe": try once, exit 0 if acquired / 3 if blocked.
    * action "hold": acquire, print HELD, hold for holdMs, exit 0.
    */
  private def fork(file: String, mode: String, action: String,
      holdMs: Long = 0): Process = {
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/java", "-cp", cp,
      "graft.LockProbe", file, mode, action, holdMs.toString)
    pb.redirectErrorStream(true)
    pb.start()
  }

  private def awaitHeld(p: Process): Unit = {
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val line = r.readLine()
    assert(line == "HELD", s"probe process failed to lock: $line")
  }

  test("a remote exclusive holder blocks local mutation writers until it exits") {
    val (cat, root) = mk()
    // remote 'DDL' grabs the exclusive lock for 2s
    val p = fork(lockFile(root), "exclusive", "hold", holdMs = 2000)
    awaitHeld(p)
    val t0 = System.nanoTime
    // local mutation writer must WAIT the remote DDL out, then succeed
    val up = spark.createDataFrame(Seq(Row(1L, "patched")).asJava, schema)
    assert(cat.upsert("t", up) === 1)
    val waitedMs = (System.nanoTime - t0) / 1000000
    assert(p.waitFor() === 0)
    assert(waitedMs >= 1000,
      s"upsert returned after ${waitedMs}ms — it did not wait for the remote " +
        "exclusive holder")
    assert(cat.table("t").filter("id = 1").head().getString(1) === "patched")
  }

  test("a local mutation writer blocks remote exclusive acquisition (DDL fenced)") {
    val (cat, root) = mk()
    // simulate an in-flight local mutation: take the shared lock the way
    // withTableSharedLock does (refcounted, through the production class)
    val st = new KuduLikeCatalog.SharedFileLock
    st.acquire(java.nio.file.Paths.get(lockFile(root)), 5000, "t")
    try {
      val blocked = fork(lockFile(root), "exclusive", "probe")
      assert(blocked.waitFor() === 3,
        "remote exclusive lock must be refused while a mutation holds shared")
      // shared mode is concurrent with OTHER mutation writers
      val shared = fork(lockFile(root), "shared", "probe")
      assert(shared.waitFor() === 0,
        "remote SHARED lock must coexist with a local shared holder")
    } finally st.release()
    // released: remote exclusive now succeeds
    val after = fork(lockFile(root), "exclusive", "probe")
    assert(after.waitFor() === 0)
    assert(cat.table("t").count() === 10)
  }

  test("shared lock is refcounted: last in-process holder releases the OS lock") {
    val (_, root) = mk()
    val st = new KuduLikeCatalog.SharedFileLock
    val path = java.nio.file.Paths.get(lockFile(root))
    st.acquire(path, 5000, "t"); st.acquire(path, 5000, "t")
    st.release() // one holder remains
    assert(fork(lockFile(root), "exclusive", "probe").waitFor() === 3,
      "OS lock must persist while any in-process holder remains")
    st.release() // last holder
    assert(fork(lockFile(root), "exclusive", "probe").waitFor() === 0)
  }
}

/** Forked-JVM side of [[LockFenceSpec]]: lock a file shared/exclusive,
  * probe-once or hold-for-millis. Exit codes: 0 acquired, 3 blocked.
  */
object LockProbe {
  def main(args: Array[String]): Unit = {
    val Array(file, mode, action, holdMs) = args.take(4)
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(file),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.READ,
      java.nio.file.StandardOpenOption.WRITE)
    val shared = mode == "shared"
    val fl = ch.tryLock(0L, Long.MaxValue, shared)
    action match {
      case "probe" =>
        if (fl == null) System.exit(3)
        fl.release(); System.exit(0)
      case "hold" =>
        if (fl == null) System.exit(3)
        println("HELD")
        System.out.flush()
        Thread.sleep(holdMs.toLong)
        fl.release(); System.exit(0)
    }
  }
}
