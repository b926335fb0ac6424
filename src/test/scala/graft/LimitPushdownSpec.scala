package graft

import graft.catalog.{KuduLikeCatalog, TableDef}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** LIMIT / TopN pushdown through the DSv2 connector: a bare `LIMIT n` (or
  * `ORDER BY c LIMIT n`) on a 100-TB table must plan a bounded file subset,
  * not a full scan. The contract under test:
  *  - delta-free tables: LIMIT plans the shortest file prefix covering n
  *    rows (by footer counts); TopN keeps only files whose [min,max] can
  *    intersect the top-n (θ-bound pruning over chunk statistics);
  *  - pending deltas decline the pushdown entirely (merge-on-read
  *    suppression could starve a truncated prefix);
  *  - every fallback (nulls, missing stats, n ≥ table) keeps the FULL file
  *    list — the pushdown is always partial, Spark's retained Limit/Sort
  *    keep results exact, so pruning bugs can only cost performance —
  *    which is exactly what these tests pin.
  */
class LimitPushdownSpec extends SparkSpec {

  /** Storage backend the TABLES are built through — the Hadoop subclass
    * below re-runs the whole suite with every catalog write going through
    * `org.apache.hadoop.fs`, proving the connector's footer reads survive
    * the FileSystem seam (round-15 verdict item 7).
    */
  protected def specStorage: graft.catalog.GraftStorage = graft.catalog.NioStorage
  protected def mkCat(root: String) =
    new KuduLikeCatalog(spark, root, specStorage)

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head

  private def read(root: String, t: String): DataFrame =
    spark.read.format("graft").option("root", root).load(t)

  /** Unbucketed table built by 3 separate inserts → ≥3 base files. */
  private def buildMultiFile(root: String): Int = {
    import spark.implicits._
    val cat = mkCat(root)
    val schema = Seq((0L, "x")).toDF("id", "payload").schema
    cat.createTable(TableDef("t", schema, Seq("id")))
    for (batch <- 0 until 3)
      cat.insert("t", (0 until 100).map(i => (batch * 100L + i, s"p$i")).toDF("id", "payload"))
    scanOf(read(root, "t")).partitions.length
  }

  test("LIMIT plans a file prefix, not the table") {
    val root = tmpDir("graft_limit_")
    val nFull = buildMultiFile(root)
    assert(nFull >= 3, s"fixture must be multi-file, got $nFull")

    val limited = read(root, "t").limit(5)
    val scan = scanOf(limited)
    assert(scan.scan.description().contains("PushedLimit: 5"))
    assert(scan.partitions.length < nFull,
      s"LIMIT 5 must plan fewer than all $nFull files")

    val got = limited.collect()
    assert(got.length === 5)
    val full = read(root, "t").collect().map(_.toSeq).toSet
    got.foreach(r => assert(full.contains(r.toSeq), s"phantom row $r"))
  }

  test("LIMIT beyond the table keeps every file and every row") {
    val root = tmpDir("graft_limit_all_")
    val nFull = buildMultiFile(root)
    val limited = read(root, "t").limit(10_000)
    assert(scanOf(limited).partitions.length === nFull)
    assert(limited.count() === 300)
  }

  test("pending deltas decline the pushdown; results stay exact") {
    import spark.implicits._
    val root = tmpDir("graft_limit_delta_")
    buildMultiFile(root)
    val cat = mkCat(root)
    cat.delete("t", col("id") < 250) // tombstones: only 50 rows survive
    val limited = read(root, "t").limit(100)
    assert(!scanOf(limited).scan.description().contains("PushedLimit"),
      "a table with pending deltas must not accept limit pushdown")
    // a naive 100-row file prefix would be fully tombstoned — the declined
    // pushdown is what keeps this exact
    assert(limited.count() === 50)
    assert(read(root, "t").limit(30).count() === 30)
  }

  /** Range-partitioned table: months are file-disjoint in ts, so TopN on
    * ts prunes to the earliest (or latest) months.
    */
  private def buildRanged(root: String): Int = {
    import spark.implicits._
    val cat = mkCat(root)
    val rows = (0 until 400).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-${i / 100 + 1}%02d-10 00:00:${i % 60}%02d"), i * 2L)
    }.toDF("id", "ts", "v")
    cat.createTable(TableDef("e", rows.schema, Seq("id"), rangeCol = Some("ts")))
    cat.insert("e", rows)
    scanOf(read(root, "e")).partitions.length
  }

  test("TopN ascending prunes to the earliest files") {
    val root = tmpDir("graft_topn_")
    val nFull = buildRanged(root)
    assert(nFull >= 4, s"fixture must span ≥4 month files, got $nFull")

    val q = read(root, "e").orderBy("ts", "id").limit(10)
    val scan = scanOf(q)
    assert(scan.scan.description().contains("PushedTopN: ORDER BY ts ASC LIMIT 10"))
    assert(scan.partitions.length < nFull,
      s"TopN 10 must prune the $nFull month files")

    val expected = read(root, "e").collect()
      .sortBy(r => (r.getTimestamp(1).getTime, r.getLong(0))).take(10).map(_.toSeq)
    assert(q.collect().map(_.toSeq).toSeq === expected.toSeq)
  }

  test("TopN descending prunes to the latest files") {
    val root = tmpDir("graft_topn_desc_")
    val nFull = buildRanged(root)
    val q = read(root, "e").orderBy(col("ts").desc, col("id").desc).limit(10)
    val scan = scanOf(q)
    assert(scan.scan.description().contains("PushedTopN: ORDER BY ts DESC LIMIT 10"))
    assert(scan.partitions.length < nFull)
    val expected = read(root, "e").collect()
      .sortBy(r => (-r.getTimestamp(1).getTime, -r.getLong(0))).take(10).map(_.toSeq)
    assert(q.collect().map(_.toSeq).toSeq === expected.toSeq)
  }

  test("TopN over a null-bearing column keeps all files and stays correct") {
    import spark.implicits._
    val root = tmpDir("graft_topn_null_")
    val cat = mkCat(root)
    val rows = (0 until 300).map(i =>
      (i.toLong, if (i % 7 == 0) None else Some(i * 3L))).toDF("id", "v")
    cat.createTable(TableDef("n", rows.schema, Seq("id")))
    for (g <- 0 until 3)
      cat.insert("n", rows.filter(col("id") % 3 === g))
    val nFull = scanOf(read(root, "n")).partitions.length

    val q = read(root, "n").orderBy("v", "id").limit(8)
    val scan = scanOf(q)
    // the BUILDER accepts (it cannot see nulls), but PLANNING must fall
    // back to the full list — pruning by min/max would drop NULLS FIRST rows
    assert(scan.scan.description().contains("PushedTopN"))
    assert(scan.partitions.length === nFull)
    val expected = read(root, "n").collect()
      .sortBy(r => (!r.isNullAt(1), if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(0)))
      .take(8).map(_.toSeq)
    assert(q.collect().map(_.toSeq).toSeq === expected.toSeq)
  }

  test("TopN over doubles: ±0.0 straddling a file boundary stays exact") {
    import spark.implicits._
    val root = tmpDir("graft_topn_zero_")
    val cat = mkCat(root)
    // file A: 8 negatives + two -0.0 rows at HIGH ids; file B: two +0.0
    // rows at LOW ids + positives. Spark sorts -0.0 == 0.0 (ties broken by
    // id), so the exact top-10 ends ... B.id=1, B.id=2 — but IEEE total
    // order puts -0.0 < +0.0, so a θ of -0.0 (A covers all 10 rows) would
    // prune file B and silently answer with A's -0.0 rows. parquet-mr
    // happens to write conservative ±0 bounds itself (PARQUET-1222: min
    // recorded as -0.0, max as +0.0), which masks the hazard for our own
    // files; the planner's zNorm makes pruning writer-independent, and
    // this test pins the end-to-end contract either way.
    val fileA = ((0 until 8).map(i => (100L + i, -9.0 + i)) ++
      Seq((108L, -0.0), (109L, -0.0))).toDF("id", "v")
    val fileB = (Seq((1L, 0.0), (2L, 0.0)) ++
      (0 until 8).map(i => (200L + i, 1.0 + i))).toDF("id", "v")
    cat.createTable(TableDef("z", fileA.schema, Seq("id")))
    cat.insert("z", fileA)
    cat.insert("z", fileB)

    val q = read(root, "z").orderBy("v", "id").limit(10)
    assert(scanOf(q).scan.description().contains("PushedTopN"))
    val got = q.collect().map(r => (r.getLong(0), r.getDouble(1)))
    // exact: 8 negatives then the zero tie resolved by id — B's 1 and 2
    assert(got.map(_._1).toSeq === ((100L until 108L) ++ Seq(1L, 2L)).toSeq,
      s"±0.0 boundary must not prune the +0.0 file; got ${got.toSeq}")
  }

  test("catalog-plugin SQL route: LIMIT reaches the same pushdown") {
    val root = tmpDir("graft_limit_sql_")
    val nFull = buildMultiFile(root)
    spark.conf.set("spark.sql.catalog.graftl",
      classOf[graft.sources.GraftCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.graftl.root", root)
    try {
      val df = spark.sql("SELECT * FROM graftl.t LIMIT 5")
      val scan = scanOf(df)
      assert(scan.scan.description().contains("PushedLimit: 5"))
      assert(scan.partitions.length < nFull)
      assert(df.count() === 5)
    } finally {
      spark.conf.unset("spark.sql.catalog.graftl.root")
      spark.conf.unset("spark.sql.catalog.graftl")
    }
  }

  test("bucketed table: LIMIT prunes and the merge semantics survive compact") {
    import spark.implicits._
    val root = tmpDir("graft_limit_bucket_")
    val cat = mkCat(root)
    val rows = (0 until 400).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    cat.createTable(TableDef("b", rows.schema, Seq("id"), buckets = 4))
    cat.insert("b", rows)
    cat.upsert("b", Seq((1L, "patched")).toDF("id", "payload"))
    // pending delta → no pushdown
    assert(!scanOf(read(root, "b").limit(3)).scan.description().contains("PushedLimit"))
    cat.compact("b")
    val nFull = scanOf(read(root, "b")).partitions.length
    val q = read(root, "b").limit(3)
    val scan = scanOf(q)
    assert(scan.scan.description().contains("PushedLimit: 3"))
    assert(scan.partitions.length < nFull)
    assert(q.count() === 3)
    // the compacted table must still serve the patched row somewhere
    assert(read(root, "b").where(col("id") === 1).head().getString(1) === "patched")
  }
}
