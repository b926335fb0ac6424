package graft

import graft.catalog.{CatalogException, FaultInjection, KuduLikeCatalog, TableDef}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp

/** Incremental compaction: fold pending deltas touching only the range
  * partitions they hit — hardlinking untouched subtrees (zero data
  * movement) and rewriting only touched ones through the connector's
  * range-restricted merge-on-read scan. Kudu's per-tablet compaction
  * locality over the range layout: at 100 TB the fold cost is
  * O(touched data + deltas), never O(table).
  */
class IncrementalCompactSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // range columns ⊆ key columns — the soundness precondition (Kudu's own
  // partition-columns-from-PK rule); a key can then never move ranges
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("ts", TimestampType),
    StructField("tenant", StringType), StructField("v", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  /** 2 months x 2 tenants x 5 rows, ids encode (month, tenant, i). */
  private def rows: Seq[Row] = (for {
    m <- Seq("01", "02"); t <- Seq("acme", "bimal"); i <- 0 until 5
  } yield {
    val id = Seq("01", "02").indexOf(m) * 1000 +
      Seq("acme", "bimal").indexOf(t) * 100 + i
    Row(id.toLong, ts(s"2024-$m-10 00:00:00"), t, s"r$id")
  }).toSeq

  private def mk(buckets: Int = 0): (KuduLikeCatalog, String) = {
    val root = tmpDir("graft_icompact_")
    val cat = new KuduLikeCatalog(spark, root)
    cat.createTable(TableDef("t", schema, Seq("id", "ts", "tenant"),
      buckets = buckets, hashCols = if (buckets > 0) Seq("id") else Seq.empty,
      rangeCol = Some("ts"), rangeSubCols = Seq("tenant")))
    assert(cat.insert("t", spark.createDataFrame(rows.asJava, schema)) === 20)
    (cat, root)
  }

  private def filesUnder(dir: String): Seq[Path] =
    scala.util.Using.resource(Files.walk(Paths.get(dir))) { s =>
      s.iterator().asScala.filter(Files.isRegularFile(_))
        // data files only: _SUCCESS markers and .crc shadows are job
        // artifacts outside the hardlink contract (Spark's own hidden-file
        // convention)
        .filter { f =>
          val n = f.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".")
        }.toSeq
    }

  private def contents(cat: KuduLikeCatalog): Set[(Long, String, String)] =
    cat.table("t").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet

  test("folds only touched ranges: content exact, untouched subtrees hardlinked") {
    val (cat, _) = mk(buckets = 2)
    // mutations confined to 2024-02/acme (ids 1000-1004 by the fixture's
    // id = month*1000 + tenant*100 + i encoding; tenant is a KEY column,
    // so a mutated row's tenant must match or the upsert is a new key):
    // one update, one new key, one delete
    cat.upsert("t", spark.createDataFrame(Seq(
      Row(1000L, ts("2024-02-10 00:00:00"), "acme", "UPDATED"),
      Row(1099L, ts("2024-02-15 00:00:00"), "acme", "NEW")).asJava, schema))
    cat.delete("t", col("id") === 1001L)
    val expected = contents(cat) // merge-on-read truth before the fold
    assert(expected.contains((1000L, "acme", "UPDATED")))
    assert(expected.contains((1099L, "acme", "NEW")))
    assert(!expected.exists(_._1 == 1001L))
    val oldBase = cat.dataLocation("t")
    val oldByRel = filesUnder(oldBase).map(f =>
      Paths.get(oldBase).relativize(f).toString -> f).toMap

    cat.compactIncremental("t")

    assert(contents(cat) === expected)
    assert(cat.deltaLayers("t").isEmpty) // folded
    val newBase = cat.dataLocation("t")
    assert(newBase !== oldBase)
    val newFiles = filesUnder(newBase)
    val (touched, untouched) = newFiles.partition(
      _.toString.contains("__range=2024-02/__range2=acme"))
    assert(touched.nonEmpty && untouched.nonEmpty)
    // untouched subtrees: every file IS the old generation's file (hardlink)
    untouched.foreach { f =>
      val rel = Paths.get(newBase).relativize(f).toString
      val old = oldByRel.get(rel)
      assert(old.isDefined, s"untouched file $rel not carried from old base")
      assert(Files.isSameFile(f, old.get), s"untouched file $rel was rewritten")
    }
    // touched subtree: rewritten, not linked to ANY old file
    touched.foreach { f =>
      oldByRel.values.foreach(old => assert(!Files.isSameFile(f, old)))
    }
    // fold is terminal: a second incremental run is a declarative no-op
    val gen = cat.dataLocation("t")
    cat.compactIncremental("t")
    assert(cat.dataLocation("t") === gen)
  }

  test("pure retention fold: dropped range disappears physically, rest hardlinks") {
    val (cat, _) = mk()
    cat.dropRangePartition("t", "2024-01/acme")
    assert(cat.table("t").count() === 15)
    val oldBase = cat.dataLocation("t")
    cat.compactIncremental("t") // no deltas: metadata-speed fold
    assert(cat.droppedRangesOf("t").isEmpty) // drop folded + cleared
    assert(cat.table("t").count() === 15)
    val newFiles = filesUnder(cat.dataLocation("t"))
    assert(!newFiles.exists(_.toString.contains("__range=2024-01/__range2=acme")))
    // zero rewrite: every surviving file links back into the displaced base
    val oldByRel = filesUnder(oldBase).map(f =>
      Paths.get(oldBase).relativize(f).toString -> f).toMap
    newFiles.foreach { f =>
      val rel = Paths.get(cat.dataLocation("t")).relativize(f).toString
      assert(Files.isSameFile(f, oldByRel(rel)))
    }
  }

  test("rejects non-key range columns loudly; unpartitioned tables too") {
    val root = tmpDir("graft_icompact_bad_")
    val cat = new KuduLikeCatalog(spark, root)
    cat.createTable(TableDef("loose", schema, Seq("id"),
      rangeCol = Some("ts"), rangeSubCols = Seq("tenant")))
    val e = intercept[CatalogException](cat.compactIncremental("loose"))
    assert(e.getMessage.contains("not key columns"))
    cat.createTable(TableDef("flat", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))), Seq("id")))
    val e2 = intercept[CatalogException](cat.compactIncremental("flat"))
    assert(e2.getMessage.contains("not range-partitioned"))
  }

  test("crash cut points: staged crash keeps old state, committed crash is folded") {
    val (cat, _) = mk()
    cat.upsert("t", spark.createDataFrame(Seq(
      Row(1100L, ts("2024-02-10 00:00:00"), "acme", "UPDATED")).asJava, schema))
    val before = contents(cat)
    FaultInjection.arm(_ == "icompact.staged")
    try intercept[FaultInjection.InjectedCrash](cat.compactIncremental("t"))
    finally FaultInjection.disarm()
    // pre-commit death: manifest untouched, delta still live, content intact
    assert(contents(cat) === before)
    assert(cat.deltaLayers("t").nonEmpty)
    FaultInjection.arm(_ == "icompact.committed")
    try intercept[FaultInjection.InjectedCrash](cat.compactIncremental("t"))
    finally FaultInjection.disarm()
    // post-commit death: the fold is complete, only deferred cleanup was lost
    assert(contents(cat) === before)
    assert(cat.deltaLayers("t").isEmpty)
  }

  test("SQL verb: OPTIMIZE t INCREMENTAL routes to the incremental fold") {
    val (cat, _) = mk()
    cat.upsert("t", spark.createDataFrame(Seq(
      Row(2100L, ts("2024-02-10 00:00:00"), "bimal", "SQLNEW")).asJava, schema))
    val st = GraftSql.execute(spark, cat, "OPTIMIZE t INCREMENTAL")
    assert(st.head().getString(0) === "OPTIMIZE INCREMENTAL")
    assert(cat.deltaLayers("t").isEmpty)
    assert(contents(cat).contains((2100L, "bimal", "SQLNEW")))
  }
}
