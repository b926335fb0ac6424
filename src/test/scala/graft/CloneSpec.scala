package graft

import graft.catalog.{CatalogException, FaultInjection, KuduLikeCatalog, TableDef}

import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Zero-copy CLONE TABLE: hardlink-backed snapshot branch. The contract —
  * O(file count) cost with BYTES shared (hardlinks proven by inode
  * identity), then full independence: mutations, compaction, vacuum, and
  * DROP on either side never change what the other reads, because every
  * catalog write path creates new files and every delete path is an
  * unlink the filesystem refcounts.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def newCat(): (KuduLikeCatalog, String) = {
    val root = tmpDir("graft_clone_")
    (new KuduLikeCatalog(spark, root), root)
  }

  private def build(cat: KuduLikeCatalog, n: Int = 200): Unit = {
    val df = (0 until n).map(i => (i.toLong, s"v$i", i % 5)).toDF("id", "payload", "grp")
    cat.createTable(TableDef("t", df.schema, Seq("id"), buckets = 2))
    cat.insert("t", df)
  }

  private def fileKeys(dir: String): Map[String, Object] = {
    val walk = Files.walk(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map { p =>
          val rel = p.toString.stripPrefix(dir)
          rel -> Files.readAttributes(p, classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
        }.toMap
    } finally walk.close()
  }

  test("clone reads identically and shares every data inode (zero-copy)") {
    val (cat, root) = newCat()
    build(cat)
    cat.upsert("t", Seq((1L, "patched", 9)).toDF("id", "payload", "grp"))
    cat.cloneTable("t", "t2")

    val a = cat.table("t").orderBy("id").collect().map(_.toSeq).toSeq
    val b = cat.table("t2").orderBy("id").collect().map(_.toSeq).toSeq
    assert(a === b)
    // merge-on-read state came along: pending delta visible through the clone
    assert(cat.table("t2").where(col("id") === 1).head().getString(1) === "patched")

    // every parquet file in the clone is the SAME inode as the source's
    val src = fileKeys(s"$root/t")
    val dst = fileKeys(s"$root/t2")
    assert(dst.nonEmpty && dst.keySet === src.keySet)
    dst.foreach { case (rel, key) =>
      assert(key === src(rel), s"$rel must be a hardlink of the source file")
    }
  }

  test("clone and source evolve independently after the branch") {
    val (cat, _) = newCat()
    build(cat)
    cat.cloneTable("t", "t2")

    cat.delete("t", col("id") < 150) // mutate SOURCE
    cat.insert("t2", Seq((1000L, "new", 0)).toDF("id", "payload", "grp")) // grow CLONE
    cat.upsert("t2", Seq((0L, "clone-side", 0)).toDF("id", "payload", "grp"))

    assert(cat.table("t").count() === 50)
    assert(cat.table("t2").count() === 201)
    assert(cat.table("t2").where(col("id") === 0).head().getString(1) === "clone-side")
    assert(cat.table("t").where(col("id") === 150).head().getString(1) === "v150")
  }

  test("compact + vacuum on the source cannot starve the clone") {
    val (cat, _) = newCat()
    build(cat)
    cat.upsert("t", Seq((5L, "x", 1)).toDF("id", "payload", "grp"))
    cat.cloneTable("t", "t2")
    val before = cat.table("t2").orderBy("id").collect().map(_.toSeq).toSeq

    cat.delete("t", col("id") >= 0) // empty the source...
    cat.compact("t") // ...fold it...
    cat.vacuum("t") // ...and unlink every displaced generation and layer
    assert(cat.table("t").count() === 0)

    assert(cat.table("t2").orderBy("id").collect().map(_.toSeq).toSeq === before,
      "the clone must keep serving its snapshot from the shared inodes")

    // and the mirror direction: dropping the CLONE leaves the source whole
    cat.cloneTable("t2", "t3")
    cat.dropTable("t2")
    assert(cat.table("t3").orderBy("id").collect().map(_.toSeq).toSeq === before)
  }

  test("clone carries schema evolution state and dropped ranges") {
    val (cat, _) = newCat()
    val df = (0 until 120).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-${i % 3 + 1}%02d-05 00:00:00"), s"p$i")
    }.toDF("id", "ts", "payload")
    cat.createTable(TableDef("r", df.schema, Seq("id"), rangeCol = Some("ts")))
    cat.insert("r", df)
    cat.dropRangePartition("r", "2024-02")
    cat.addColumn("r", org.apache.spark.sql.types.StructField("extra",
      org.apache.spark.sql.types.LongType))
    cat.cloneTable("r", "r2")

    assert(cat.table("r2").count() === 80, "dropped range stays dropped in the clone")
    assert(cat.schemaOf("r2").fieldNames.contains("extra"))
    assert(cat.table("r2").where(date_format(col("ts"), "yyyy-MM") === "2024-02").count() === 0)
  }

  test("version-pinned clone: the branch IS the historical state, writable") {
    import org.apache.spark.sql.types.{LongType, StructField}
    val (cat, _) = newCat()
    build(cat) // version 0: 200 base rows
    cat.upsert("t", Seq((0L, "v1", 9)).toDF("id", "payload", "grp")) // version 1
    cat.delete("t", col("id") >= 100) // version 2
    cat.upsert("t", Seq((1L, "v3", 9)).toDF("id", "payload", "grp")) // version 3

    GraftSql.execute(spark, cat, "CREATE TABLE t_v1 CLONE t VERSION AS OF 1")
    val expected = cat.tableAsOf("t", 1).orderBy("id").collect().map(_.toSeq).toSeq
    assert(cat.table("t_v1").orderBy("id").collect().map(_.toSeq).toSeq === expected)
    assert(cat.table("t_v1").count() === 200) // the delete (v2) never happened here
    assert(cat.table("t_v1").where(col("id") === 0).head().getString(1) === "v1")
    assert(cat.table("t_v1").where(col("id") === 1).head().getString(1) === "v1") // not "v3"

    // the branch is writable and independent
    cat.delete("t_v1", col("id") < 10)
    assert(cat.table("t_v1").count() === 190)
    assert(cat.table("t").count() === 100)

    // compacted-away history refuses loudly, exactly like tableAsOf
    cat.compact("t")
    val e = intercept[CatalogException] { cat.cloneTable("t", "t_v0", Some(1)) }
    assert(e.getMessage.contains("compacted"))

    // schema evolution between versions rides the manifest, so a clone at
    // a pre-evolution version keeps the CURRENT schema (manifest is one
    // file) — document by assertion
    cat.addColumn("t", StructField("extra", LongType))
    cat.cloneTable("t", "t_now", None)
    assert(cat.schemaOf("t_now").fieldNames.contains("extra"))
  }

  test("restore on the source cannot rewrite a clone's history (shared inodes, independent trees)") {
    val (cat, _) = newCat()
    build(cat) // v0 base: id 2's payload is "v2"
    cat.upsert("t", Seq((1L, "first", 9)).toDF("id", "payload", "grp")) // v1
    cat.upsert("t", Seq((2L, "second", 9)).toDF("id", "payload", "grp")) // v2
    cat.cloneTable("t", "t2")
    cat.restoreTable("t", 1) // truncates v2 IN THE SOURCE only

    // source: v2's upsert is gone, base payload back in force
    assert(cat.table("t").where(col("id") === 2).head().getString(1) === "v2")
    assert(cat.currentVersion("t") === 1)
    // clone: full history intact, including time travel to both versions
    assert(cat.table("t2").where(col("id") === 2).head().getString(1) === "second")
    assert(cat.tableAsOf("t2", 1).where(col("id") === 2).head().getString(1) === "v2")
  }

  test("pinned clone burns dropped layer ids: stale stats can never alias as fresh") {
    val (cat, _) = newCat()
    build(cat) // v0
    cat.upsert("t", Seq((1L, "a", 9)).toDF("id", "payload", "grp")) // v1
    cat.upsert("t", Seq((2L, "b", 9)).toDF("id", "payload", "grp")) // v2
    cat.analyze("t") // fingerprint stamped at currentVersion = 2
    assert(cat.statsOf("t").isDefined)

    cat.cloneTable("t", "tb", Some(1)) // drops layer 2, burns its id
    // the hardlinked record is stale on the branch (analyzed at v2, branch at v1)
    assert(cat.statsOf("tb").isEmpty)

    // one branch mutation: without the burn it would COMMIT as layer 2 and
    // re-reach the analyzed version number under the same manifest and base
    // epoch — aliasing the source's stats record as fresh for DIFFERENT
    // content. The burn makes the dropped id unreachable.
    cat.upsert("tb", Seq((3L, "c", 9)).toDF("id", "payload", "grp"))
    assert(cat.currentVersion("tb") === 3, "dropped ids must stay burned")
    assert(cat.statsOf("tb").isEmpty)
    // the branch's own ANALYZE serves fresh stats as usual
    cat.analyze("tb")
    assert(cat.statsOf("tb").isDefined)
  }

  test("pinned clone keeps stats exactly when genuinely valid (analyzed at or below the pin)") {
    val (cat, _) = newCat()
    build(cat) // v0
    cat.upsert("t", Seq((1L, "a", 9)).toDF("id", "payload", "grp")) // v1
    cat.analyze("t") // stamped at v1
    cat.upsert("t", Seq((2L, "b", 9)).toDF("id", "payload", "grp")) // v2: source record now stale
    assert(cat.statsOf("t").isEmpty)
    cat.cloneTable("t", "tb", Some(1))
    // the branch content IS the analyzed state — record valid there
    assert(cat.statsOf("tb").isDefined)
  }

  test("pinned clone validates the version INSIDE the source lock (no TOCTOU vs compact)") {
    val (cat, root) = newCat()
    build(cat) // v0
    cat.upsert("t", Seq((1L, "a", 9)).toDF("id", "payload", "grp")) // v1
    cat.upsert("t", Seq((2L, "b", 9)).toDF("id", "payload", "grp")) // v2

    val inCompact = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    // blocking (non-throwing) hook: pause compact at its staged cut point,
    // INSIDE the write lock, so the clone's schedule is deterministic
    FaultInjection.arm { p =>
      if (p == "compact.staged") { inCompact.countDown(); release.await() }
      false
    }
    try {
      @volatile var cloneResult: Option[Throwable] = null
      val compactor = new Thread(() => cat.compact("t"))
      compactor.start()
      assert(inCompact.await(120, java.util.concurrent.TimeUnit.SECONDS))
      // compact holds the source write lock, paused pre-commit. The clone
      // must WAIT for the lock and re-validate INSIDE it: with the old
      // outside-the-lock check, exactly this schedule passed validation at
      // floor 0, then staged post-compact content (no layers left to drop)
      // and committed HEAD rows labeled as version 1.
      val cloner = new Thread(() => {
        cloneResult =
          try { cat.cloneTable("t", "t_pin", Some(1)); None }
          catch { case e: Throwable => Some(e) }
      })
      cloner.start()
      cloner.join(500)
      assert(cloneResult == null, "clone must block on the source write lock")
      release.countDown()
      compactor.join(120000); cloner.join(120000)
      assert(cloneResult != null, "clone must finish once the lock releases")
      assert(cloneResult.isDefined, "clone of a compacted-away version must fail")
      assert(cloneResult.get.getMessage.contains("compacted"))
      assert(!Files.exists(Paths.get(root, "t_pin")), "no half-made table")
    } finally {
      FaultInjection.disarm()
      release.countDown()
    }
  }

  test("SQL verb: CREATE TABLE dst CLONE src; errors are loud") {
    val (cat, _) = newCat()
    build(cat, n = 50)
    GraftSql.execute(spark, cat, "CREATE TABLE t_branch CLONE t")
    assert(cat.table("t_branch").count() === 50)

    val eDup = intercept[CatalogException] {
      GraftSql.execute(spark, cat, "CREATE TABLE t_branch CLONE t")
    }
    assert(eDup.getMessage.contains("already exists"))
    val eMissing = intercept[CatalogException] { cat.cloneTable("nope", "x") }
    assert(eMissing.getMessage.contains("does not exist"))
  }
}
