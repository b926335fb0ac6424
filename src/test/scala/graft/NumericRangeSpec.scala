package graft

import graft.catalog.{CatalogException, KuduLikeCatalog, TableDef}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** Arbitrary numeric range partitioning — Kudu's
  * `PARTITION lower <= VALUES < upper` shape on an integer key prefix
  * (round-11 verdict item 6; reference DesignDocument.md:8 partitioning
  * goal). Each declared pair owns one `__range=<lower>` directory; rows
  * outside every pair are REJECTED at write time ("row not in any range
  * partition"); the connector prunes base files whose pair cannot
  * intersect the pushed predicate window; DROP / ADD RANGE PARTITION take
  * Kudu's own bound-pair syntax and stay metadata-only.
  */
class NumericRangeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private val bounds = Seq((0L, 1000L), (1000L, 2000L), (2000L, 3000L))

  private def mk(buckets: Int = 0): (KuduLikeCatalog, String) = {
    val root = tmpDir("graft_nrange_")
    val cat = new KuduLikeCatalog(spark, root)
    cat.createTable(TableDef("t", schema, Seq("k"), buckets = buckets,
      rangeCol = Some("k"), rangeBounds = bounds))
    // 30 rows spread over all three ranges, including both edges of each
    val rows = (Seq(0L, 999L, 1000L, 1999L, 2000L, 2999L) ++
      (0 until 24).map(i => (i * 125).toLong)).distinct
    assert(cat.insert("t", rows.map(k => (k, s"r$k")).toDF("k", "v")) === rows.size)
    (cat, root)
  }

  private def read(root: String) =
    spark.read.format("graft").option("root", root).load("t")

  private def plannedBaseFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      .head.partitions.flatten.flatMap {
        case p: graft.sources.GraftInputPartition => p.baseFiles
        case _ => Seq.empty
      }.toSeq

  test("layout: one __range=<lower> directory per declared pair; reads exact") {
    val (cat, root) = mk()
    val dirs = Paths.get(root, "t", "data").toFile.listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs === Seq("__range=0", "__range=1000", "__range=2000"))
    // boundary semantics: lower inclusive, upper exclusive
    val got = cat.table("t").orderBy("k").select("k").as[Long].collect()
    assert(got.contains(0L) && got.contains(999L) && got.contains(1000L))
    assert(cat.table("t").where(col("k") === 999).head().getString(1) === "r999")
  }

  test("a row outside every range is rejected loudly (Kudu: no owning tablet)") {
    val (cat, _) = mk()
    val e = intercept[Exception] {
      cat.insert("t", Seq((5000L, "nope")).toDF("k", "v"))
    }
    assert(e.getMessage != null && e.getMessage.contains("row not in any range partition")
      || Option(e.getCause).exists(_.getMessage.contains("row not in any range partition")),
      s"unexpected error: $e")
    val neg = intercept[Exception] {
      cat.insert("t", Seq((-1L, "nope")).toDF("k", "v"))
    }
    assert(neg.toString.contains("row not in any range partition") ||
      Option(neg.getCause).exists(_.toString.contains("row not in any range partition")))
  }

  test("connector prunes base files by the pushed key window; results exact") {
    val (_, root) = mk()
    val all = plannedBaseFiles(read(root))
    assert(all.exists(_.contains("__range=0")) &&
      all.exists(_.contains("__range=1000")) && all.exists(_.contains("__range=2000")))

    // point lookup: only the owning range's files are planned
    val point = read(root).where(col("k") === 1500)
    val pf = plannedBaseFiles(point)
    assert(pf.nonEmpty && pf.forall(_.contains("__range=1000")), pf.toString)
    assert(point.count() === 1)

    // window straddling two ranges: the third is pruned
    val win = read(root).where(col("k") >= 900 && col("k") < 2000)
    val wf = plannedBaseFiles(win)
    assert(wf.exists(_.contains("__range=0")) && wf.exists(_.contains("__range=1000")))
    assert(!wf.exists(_.contains("__range=2000")), wf.toString)
    val expect = read(root).collect().map(_.getLong(0)).filter(k => k >= 900 && k < 2000).sorted
    assert(win.orderBy("k").collect().map(_.getLong(0)).toSeq === expect.toSeq)

    // upper-exclusive boundary: k < 1000 must not plan __range=1000
    val lt = plannedBaseFiles(read(root).where(col("k") < 1000))
    assert(lt.nonEmpty && lt.forall(_.contains("__range=0")), lt.toString)
  }

  test("drop is metadata-only; writes rejected; add re-opens empty; new pairs extend") {
    val (cat, root) = mk()
    val before = cat.table("t").count()
    val inMid = cat.table("t").where(col("k") >= 1000 && col("k") < 2000).count()
    assert(inMid > 0)

    cat.dropRangePartition("t", "1000")
    assert(cat.table("t").count() === before - inMid)
    val eWrite = intercept[CatalogException] {
      cat.insert("t", Seq((1500L, "x")).toDF("k", "v"))
    }
    assert(eWrite.getMessage.contains("dropped range partition"))

    // re-open EMPTY via Kudu's bound-pair syntax; old rows never come back
    GraftSql.execute(spark, cat,
      "ALTER TABLE t ADD RANGE PARTITION 1000 <= VALUES < 2000")
    assert(cat.table("t").where(col("k") >= 1000 && col("k") < 2000).count() === 0)
    assert(cat.insert("t", Seq((1500L, "fresh")).toDF("k", "v")) === 1)
    assert(cat.table("t").where(col("k") === 1500).head().getString(1) === "fresh")

    // a NEW pair extends the declaration; writes there start working
    GraftSql.execute(spark, cat,
      "ALTER TABLE t ADD RANGE PARTITION 5000 <= VALUES < 6000")
    assert(cat.rangeBoundsOf("t").contains((5000L, 6000L)))
    assert(cat.insert("t", Seq((5500L, "new")).toDF("k", "v")) === 1)

    // overlap is a loud caller bug
    val eOverlap = intercept[CatalogException] {
      cat.addRangePartitionBounds("t", 5500L, 7000L)
    }
    assert(eOverlap.getMessage.contains("overlaps"))

    // dropping a DECLARED but still-empty pair is legal (pure metadata);
    // dropping an undeclared pair is not
    GraftSql.execute(spark, cat,
      "ALTER TABLE t ADD RANGE PARTITION 8000 <= VALUES < 9000")
    cat.dropRangePartition("t", "8000")
    val eUndecl = intercept[CatalogException] {
      GraftSql.execute(spark, cat,
        "ALTER TABLE t DROP RANGE PARTITION 7000 <= VALUES < 7500")
    }
    assert(eUndecl.getMessage.contains("no declared range"))
  }

  test("mutations, merge-on-read, and compact hold; ids recompute consistently") {
    val (cat, root) = mk(buckets = 2)
    cat.upsert("t", Seq((999L, "edited"), (2000L, "edited")).toDF("k", "v"))
    cat.delete("t", col("k") === 0)
    assert(cat.table("t").where(col("k") === 999).head().getString(1) === "edited")
    assert(cat.table("t").where(col("k") === 0).count() === 0)
    val preCompact = cat.table("t").orderBy("k").collect().map(_.toSeq).toSeq
    cat.compact("t")
    assert(cat.table("t").orderBy("k").collect().map(_.toSeq).toSeq === preCompact)
    // compacted base keeps the bounds layout
    val dirs = Files.list(Paths.get(cat.dataLocation("t"))).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]()
    while (dirs.hasNext) { val p = dirs.next(); if (Files.isDirectory(p)) names += p.getFileName.toString }
    assert(names.count(_.startsWith("__range=")) === 3)
  }

  test("SQL round trip: CREATE with graft.range_bounds, SHOW CREATE re-executes") {
    val root = tmpDir("graft_nrange_sql_")
    val cat = new KuduLikeCatalog(spark, root)
    GraftSql.execute(spark, cat,
      """CREATE TABLE nb (k BIGINT, v STRING)
        |STORED BY 'graft.catalog.KuduLikeCatalog'
        |TBLPROPERTIES(
        |  'kudu.key_columns'='k',
        |  'graft.hash_buckets'='2',
        |  'graft.range_column'='k',
        |  'graft.range_bounds'='-100:0,0:100')""".stripMargin)
    assert(cat.rangeBoundsOf("nb") === Seq((-100L, 0L), (0L, 100L)))
    // negative bounds route rows correctly
    assert(cat.insert("nb", Seq((-50L, "neg"), (50L, "pos")).toDF("k", "v")) === 2)
    assert(cat.table("nb").where(col("k") === -50).head().getString(1) === "neg")

    val ddl = GraftSql.execute(spark, cat, "SHOW CREATE TABLE nb")
      .head().getString(0)
    assert(ddl.contains("'graft.range_bounds' = '-100:0,0:100'"), ddl)
    // the emitted DDL executes verbatim and yields the same declaration
    GraftSql.execute(spark, cat, ddl.replace("`nb`", "`nb2`"))
    assert(cat.rangeBoundsOf("nb2") === cat.rangeBoundsOf("nb"))
    assert(cat.bucketsOf("nb2") === 2)

    // non-integer range column refuses loudly
    val eType = intercept[CatalogException] {
      cat.createTable(TableDef("bad",
        StructType(Seq(StructField("s", StringType), StructField("v", StringType))),
        Seq("s"), rangeCol = Some("s"), rangeBounds = Seq((0L, 10L))))
    }
    assert(eType.getMessage.contains("integer range column"))
  }
}
