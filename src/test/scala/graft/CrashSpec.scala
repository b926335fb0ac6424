package graft

import graft.catalog.{FaultInjection, KuduLikeCatalog, TableDef}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Crash-point fault injection over the storage commit protocols
  * (round-9 verdict item 3): a writer is killed BETWEEN every two steps of
  * each multi-step commit (stage → atomic move → meta swap → cleanup) and
  * the suite proves the surviving on-disk state replays to exactly the
  * complete pre-op or complete post-op state — never a torn middle — that
  * reads keep working, that a retry converges, and that litter is swept.
  */
class CrashSpec extends SparkSpec {

  /** Storage backend under test — [[HadoopCatalogSuites]] re-runs the whole
    * suite through the Hadoop-FileSystem implementation of the seam.
    */
  protected def specStorage: graft.catalog.GraftStorage = graft.catalog.NioStorage

  protected def mkCatalog(root: String) =
    new KuduLikeCatalog(spark, root, specStorage)
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("ts", TimestampType),
    StructField("v", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def df(cat: KuduLikeCatalog, rows: Seq[(Long, Timestamp, String)]) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)

  /** Fresh range+bucket table with three months of data and NO pending
    * deltas; callers layer state on top.
    */
  private def freshTable(): (KuduLikeCatalog, String) = {
    val root = tmpDir("graft_crash_")
    val cat = mkCatalog(root)
    cat.createTable(TableDef("t", schema, Seq("id"), buckets = 2, rangeCol = Some("ts")))
    val rows = (0L until 30L).map(i =>
      (i, ts(f"2024-${1 + (i % 3)}%02d-10 00:00:00"), s"base$i"))
    assert(cat.insert("t", df(cat, rows)) === 30)
    (cat, root)
  }

  private def state(cat: KuduLikeCatalog): Set[(Long, String)] =
    cat.table("t").collect().map(r => (r.getLong(0), r.getString(2))).toSet

  private def crash(point: String)(op: => Any): Unit = {
    FaultInjection.arm(_ == point)
    try {
      intercept[FaultInjection.InjectedCrash](op)
      ()
    } finally FaultInjection.disarm()
  }

  test("delta layer commit: crash at every cut point, retry converges") {
    val (cat, root) = freshTable()
    val before = state(cat)
    val up = Seq((1L, ts("2024-01-10 00:00:00"), "patched"))

    // staged-but-not-moved: layer invisible, state is the complete pre-op
    crash("delta.staged")(cat.upsert("t", df(cat, up)))
    assert(state(cat) === before, "torn layer must stay invisible")
    // tmp litter exists but no committed layer
    val deltas = new java.io.File(s"$root/t/deltas")
    assert(deltas.listFiles().exists(_.getName.startsWith(".tmp_")))
    assert(!deltas.listFiles().exists(_.getName.forall(_.isDigit)))

    // retry after the crash converges to post-op; the dead tmp is reused/cleared
    assert(cat.upsert("t", df(cat, up)) === 1)
    assert(state(cat) === before - ((1L, "base1")) + ((1L, "patched")))

    // crash AFTER the atomic move: state is the complete post-op
    val up2 = Seq((2L, ts("2024-02-10 00:00:00"), "patched2"))
    crash("delta.committed")(cat.upsert("t", df(cat, up2)))
    assert(state(cat).contains((2L, "patched2")), "moved layer is committed")

    // compact folds everything; layers are LOGICALLY retired via the floor
    // (their files linger for snapshot readers until the litter sweep)
    cat.compact("t")
    assert(state(cat).contains((1L, "patched")) && state(cat).contains((2L, "patched2")))
    assert(cat.deltaLayers("t").isEmpty, "folded layers retired")
  }

  test("overwrite: crash at every cut point is all-or-nothing") {
    val (cat, root) = freshTable()
    cat.upsert("t", df(cat, Seq((5L, ts("2024-01-10 00:00:00"), "mutated"))))
    val before = state(cat)
    val batch = (100L until 110L).map(i => (i, ts("2024-01-15 00:00:00"), s"ow$i"))

    for (point <- Seq("overwrite.epochBumped", "overwrite.staged")) {
      crash(point)(cat.overwrite("t", df(cat, batch)))
      assert(state(cat) === before,
        s"$point: old base + its deltas stay the complete visible state")
    }
    // staged litter exists after the staged-crash, invisible via the manifest
    assert(new java.io.File(s"$root/t").listFiles()
      .exists(f => f.getName.startsWith("data_")), "staged generation present")

    crash("overwrite.committed")(cat.overwrite("t", df(cat, batch)))
    assert(state(cat) === batch.map(r => (r._1, r._3)).toSet,
      "after the meta swap the new contents are the complete visible state")

    // retry/next overwrite sweeps every dead staged generation; only the
    // displaced base (kept one cycle for snapshot readers) and the live
    // generation remain
    val epochNow = cat.baseEpoch("t")
    assert(cat.overwrite("t", df(cat, batch)) === 10)
    val gens = new java.io.File(s"$root/t").listFiles()
      .filter(_.getName.startsWith("data_")).map(_.getName).toSet
    assert(gens === Set(s"data_$epochNow", s"data_${epochNow + 1}"),
      s"crash litter swept, got $gens")
  }

  test("compact: crash at every cut point is all-or-nothing") {
    val (cat, _) = freshTable()
    cat.upsert("t", df(cat, Seq((7L, ts("2024-02-10 00:00:00"), "patched"))))
    cat.delete("t", col("id") === 8L)
    val before = state(cat)

    crash("compact.staged")(cat.compact("t"))
    assert(state(cat) === before, "pre-commit crash: overlay still applies")
    assert(cat.currentVersion("t") > 0, "layers not retired")

    crash("compact.committed")(cat.compact("t"))
    assert(state(cat) === before, "compact is state-invariant")
    assert(cat.deltaLayers("t").isEmpty, "post-commit crash: layers retired")
  }

  test("rename column: crash before the meta swap leaves the old schema; after, the new") {
    val (cat, _) = freshTable()
    val before = state(cat)

    crash("rename.staged")(cat.renameColumn("t", "v", "w"))
    assert(cat.schemaOf("t").fieldNames.toSeq === Seq("id", "ts", "v"))
    assert(state(cat) === before, "fold staged but not committed")
    // the table still accepts writes under the OLD schema
    assert(cat.insert("t", df(cat, Seq((200L, ts("2024-03-10 00:00:00"), "new")))) === 1)

    crash("rename.committed")(cat.renameColumn("t", "v", "w"))
    assert(cat.schemaOf("t").fieldNames.toSeq === Seq("id", "ts", "w"))
    assert(cat.table("t").filter(col("id") === 200L).head().getString(2) === "new")
  }

  test("range drop/re-open: crash cut points, including the once-torn overwrite window") {
    val (cat, _) = freshTable()

    crash("droprange.epochBumped")(cat.dropRangePartition("t", "2024-02"))
    assert(cat.droppedRangesOf("t").isEmpty, "drop did not commit")
    assert(state(cat).size === 30)

    cat.dropRangePartition("t", "2024-02")
    assert(cat.droppedRangesOf("t") === Seq("2024-02"))
    assert(state(cat).size === 20)

    // re-open: crash before the swap keeps the range dropped; retry re-opens
    crash("addrange.staged")(cat.addRangePartition("t", "2024-02"))
    assert(cat.droppedRangesOf("t") === Seq("2024-02"))
    assert(state(cat).size === 20)
    intercept[graft.catalog.CatalogException] {
      cat.insert("t", df(cat, Seq((300L, ts("2024-02-20 00:00:00"), "x"))))
    }
    crash("addrange.committed")(cat.addRangePartition("t", "2024-02"))
    assert(cat.droppedRangesOf("t").isEmpty,
      "base repoint and exclusion-list shrink commit in ONE swap")
    assert(cat.insert("t", df(cat, Seq((300L, ts("2024-02-20 00:00:00"), "x")))) === 1)

    // the historical torn window: overwrite COMMITS, crash before any
    // cleanup — batch rows in a previously-dropped range must be visible,
    // because the exclusion list cleared in the same atomic swap
    cat.dropRangePartition("t", "2024-03")
    val batch = Seq((400L, ts("2024-03-05 00:00:00"), "reborn"))
    crash("overwrite.committed")(cat.overwrite("t", df(cat, batch)))
    assert(cat.droppedRangesOf("t").isEmpty)
    assert(state(cat) === Set((400L, "reborn")),
      "committed overwrite must not be filtered by a stale exclusion list")
  }

  // ── crash × concurrency (round-10 verdict item 6): CrashSpec killed a
  // LONE writer, PropertySpec randomized order without kills — here N
  // concurrent writers race and exactly ONE dies at a commit cut point.
  // The invariant: the table equals the base plus every commit that
  // happened, no more and no less — the pre-commit kill loses ONLY the
  // victim's batch, the post-commit kill loses NOTHING, and the victim's
  // reservation litter never blocks the survivors or a retry.
  test("concurrent writers, one killed at a cut point: state equals the commits exactly") {
    import scala.concurrent._
    for ((point, victimCommitted) <- Seq(
        "delta.staged" -> false, "delta.committed" -> true)) {
      val (cat, root) = freshTable()
      val before = state(cat)
      val writers = 8
      def batch(i: Int) = // ranges disjoint from the base's ids 0..29
        (1000L * (i + 1) until 1000L * (i + 1) + 50L)
          .map(k => (k, ts("2024-01-10 00:00:00"), s"w$i"))
      // one-shot arm: the FIRST writer to reach the cut point dies; the
      // rest sail through (FaultInjection is global, so the predicate
      // carries the claim)
      val claimed = new java.util.concurrent.atomic.AtomicBoolean(false)
      FaultInjection.arm(p => p == point && claimed.compareAndSet(false, true))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val outcomes =
        try Await.result(
          Future.sequence((0 until writers).map(i => Future {
            try Right(i -> cat.upsert("t", df(cat, batch(i))))
            catch { case e: FaultInjection.InjectedCrash => Left(i) }
          })), duration.Duration(600, "s"))
        finally { FaultInjection.disarm(); pool.shutdown() }
      val victims = outcomes.collect { case Left(i) => i }
      assert(victims.size === 1, s"exactly one writer must die at $point")
      val survivors = outcomes.collect { case Right((i, n)) => assert(n === 50L); i }
      val expected = before ++
        (survivors ++ (if (victimCommitted) victims else Nil))
          .flatMap(i => batch(i).map(r => (r._1, r._3)))
      assert(state(cat) === expected,
        s"state after a $point kill must be the base plus exactly the commits")
      // the victim's reservation is burned litter, never a blocker: a
      // retry of its batch commits above every surviving layer
      val victim = victims.head
      assert(cat.upsert("t", df(cat, batch(victim))) === 50L)
      assert(state(cat) === before ++
        (0 until writers).flatMap(i => batch(i).map(r => (r._1, r._3))))
      // and the catalog still compacts cleanly over the litter
      cat.compact("t")
      assert(cat.table("t").count() === (before.size + writers * 50L))
    }
  }

  test("clone: crash at every cut point is all-or-nothing; retry converges") {
    val (cat, root) = freshTable()
    cat.upsert("t", df(cat, Seq((5L, ts("2024-01-10 00:00:00"), "mutated"))))
    val before = state(cat)

    // staged-crash: no table, only dot-litter; the source is untouched
    crash("clone.staged")(cat.cloneTable("t", "t2"))
    assert(!cat.exists("t2"), "a crashed clone must never be a table")
    assert(new java.io.File(root).listFiles()
      .exists(_.getName == ".clone_tmp_t2"), "staged clone litter present")
    assert(state(cat) === before, "source unchanged by the crashed clone")

    // retry converges — and sweeps the stale staged attempt first
    cat.cloneTable("t", "t2")
    assert(cat.exists("t2"))
    assert(cat.table("t2").collect().map(r => (r.getLong(0), r.getString(2))).toSet === before)
    assert(!new java.io.File(root).listFiles().exists(_.getName == ".clone_tmp_t2"),
      "retry consumed the staged attempt")

    // committed-crash: the rename already landed — the clone IS a table
    crash("clone.committed")(cat.cloneTable("t", "t3"))
    assert(cat.exists("t3"), "post-rename crash leaves a complete clone")
    assert(cat.table("t3").collect().map(r => (r.getLong(0), r.getString(2))).toSet === before)
  }
}
