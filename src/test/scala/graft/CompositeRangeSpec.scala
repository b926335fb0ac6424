package graft

import graft.catalog.{CatalogException, KuduLikeCatalog, TableDef}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Composite (multi-column) range partitioning — Kudu's `RANGE (day,
  * tenant)` shape (round-10 verdict item 4; reference DesignDocument.md:8
  * partitioning goal). The time dimension stays the outermost `__range=`
  * directory level (granularity, lookupRange pruning, whole-month
  * retention all cut there); each additional range column nests as an
  * identity-valued `__range2=`, `__range3=`, … level. DROP RANGE PARTITION
  * takes either a full composite id ('2024-01/acme' — one tenant-month) or
  * a prefix ('2024-01' — the whole month across tenants), both
  * metadata-only.
  */
class CompositeRangeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("ts", TimestampType),
    StructField("tenant", StringType), StructField("v", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  /** 2 months x 2 tenants x 5 rows. */
  private def rows: Seq[Row] = (for {
    m <- Seq("01", "02"); t <- Seq("acme", "bimal"); i <- 0 until 5
  } yield {
    val id = Seq("01", "02").indexOf(m) * 1000 +
      Seq("acme", "bimal").indexOf(t) * 100 + i
    Row(id.toLong, ts(s"2024-$m-10 00:00:00"), t, s"r$id")
  }).toSeq

  private def mk(buckets: Int = 0): (KuduLikeCatalog, String) = {
    val root = tmpDir("graft_crange_")
    val cat = new KuduLikeCatalog(spark, root)
    cat.createTable(TableDef("t", schema, Seq("id"), buckets = buckets,
      rangeCol = Some("ts"), rangeSubCols = Seq("tenant")))
    assert(cat.insert("t", spark.createDataFrame(rows.asJava, schema)) === 20)
    (cat, root)
  }

  test("directory layout nests __range2 under __range; partitions listing shows both") {
    val (cat, _) = mk()
    val parts = cat.partitionsOf("t")
    assert(parts.toSet === Set(
      "__range=2024-01/__range2=acme", "__range=2024-01/__range2=bimal",
      "__range=2024-02/__range2=acme", "__range=2024-02/__range2=bimal"))
    assert(cat.rangeSubColsOf("t") === Seq("tenant"))
    // logical reads shed every internal level
    assert(cat.table("t").columns.toSeq === schema.fieldNames.toSeq)
    assert(cat.table("t").count() === 20)
  }

  test("drop one tenant-month is metadata-only; prefix drops the whole month") {
    val (cat, root) = mk()
    cat.dropRangePartition("t", "2024-01/acme")
    val afterOne = cat.table("t")
    assert(afterOne.count() === 15)
    assert(afterOne.filter(col("tenant") === "acme" &&
      col("ts") < lit(ts("2024-02-01 00:00:00"))).count() === 0)
    // the other tenant's January and acme's February both survive
    assert(afterOne.filter(col("tenant") === "bimal").count() === 10)
    // the connector path agrees (liveBaseFiles is its listing)
    val conn = spark.read.format("graft").option("root", root).load("t")
    assert(conn.count() === 15)
    // whole-month prefix drop removes the remaining January tenant too
    cat.dropRangePartition("t", "2024-01")
    assert(cat.table("t").count() === 10)
    assert(cat.table("t").filter(month(col("ts")) === 1).count() === 0)
    // writes into any dropped sub-partition are rejected
    val bad = spark.createDataFrame(
      Seq(Row(9999L, ts("2024-01-15 00:00:00"), "acme", "x")).asJava, schema)
    intercept[CatalogException](cat.insert("t", bad))
    // but a February write for the same tenant is accepted
    val ok = spark.createDataFrame(
      Seq(Row(9999L, ts("2024-02-15 00:00:00"), "acme", "x")).asJava, schema)
    assert(cat.insert("t", ok) === 1)
  }

  test("add range partition re-opens a dropped tenant-month empty") {
    val (cat, _) = mk()
    cat.dropRangePartition("t", "2024-01/acme")
    assert(cat.table("t").count() === 15)
    cat.addRangePartition("t", "2024-01/acme")
    // re-opened EMPTY: the old rows never come back …
    assert(cat.table("t").count() === 15)
    // … but the range accepts writes again
    val fresh = spark.createDataFrame(
      Seq(Row(5000L, ts("2024-01-20 00:00:00"), "acme", "fresh")).asJava, schema)
    assert(cat.insert("t", fresh) === 1)
    assert(cat.table("t").count() === 16)
    // adding a LIVE partition is a loud caller bug
    intercept[CatalogException](cat.addRangePartition("t", "2024-02/acme"))
    // and a live prefix conflicts too
    intercept[CatalogException](cat.addRangePartition("t", "2024-02"))
  }

  test("mutations and compact hold on a composite-range bucketed table") {
    val (cat, _) = mk(buckets = 2)
    assert(cat.table("t").count() === 20)
    cat.upsert("t", spark.createDataFrame(
      Seq(Row(0L, ts("2024-01-10 00:00:00"), "acme", "patched")).asJava, schema))
    val merged = cat.table("t")
    assert(merged.count() === 20)
    assert(merged.filter(col("id") === 0).select("v").head().getString(0) === "patched")
    cat.compact("t")
    val folded = cat.table("t")
    assert(folded.count() === 20)
    assert(folded.filter(col("id") === 0).select("v").head().getString(0) === "patched")
    // composite dirs survive the rewrite
    assert(cat.partitionsOf("t").exists(_.contains("__range2=acme")))
  }

  test("graft.range_columns round-trips through SQL CREATE and SHOW CREATE") {
    val root = tmpDir("graft_crange_sql_")
    val cat = new KuduLikeCatalog(spark, root)
    GraftSql.execute(spark, cat,
      """CREATE TABLE tc (id BIGINT, ts TIMESTAMP, tenant STRING, v STRING)
        |STORED BY 'graft.catalog.KuduLikeCatalog'
        |TBLPROPERTIES ('kudu.key_columns' = 'id',
        |  'graft.range_columns' = 'ts,tenant',
        |  'graft.range_granularity' = 'day')""".stripMargin)
    assert(cat.rangeColOf("tc") === Some("ts"))
    assert(cat.rangeSubColsOf("tc") === Seq("tenant"))
    assert(cat.rangeGranularityOf("tc") === "day")
    val ddl = GraftSql.execute(spark, cat, "SHOW CREATE TABLE tc")
      .collect().head.getString(0)
    assert(ddl.contains("'graft.range_columns' = 'ts,tenant'"))
    assert(!ddl.contains("'graft.range_column' ="))
    val cat2 = new KuduLikeCatalog(spark, tmpDir("graft_crange_sql2_"))
    GraftSql.execute(spark, cat2, ddl)
    assert(cat2.rangeSubColsOf("tc") === Seq("tenant"))
    assert(cat2.rangeGranularityOf("tc") === "day")
  }

  test("lookupRange prunes on the outer time level of a composite table") {
    val (cat, _) = mk()
    val jan = cat.lookupRange("t",
      ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"))
    assert(jan.count() === 10)
    assert(jan.columns.toSeq === schema.fieldNames.toSeq)
  }

  test("rename of a range sub-column rewrites layout references atomically") {
    val (cat, _) = mk()
    cat.renameColumn("t", "tenant", "org")
    assert(cat.rangeSubColsOf("t") === Seq("org"))
    assert(cat.table("t").columns.contains("org"))
    assert(cat.table("t").count() === 20)
    // retention still cuts on the renamed sub-level
    cat.dropRangePartition("t", "2024-01/acme")
    assert(cat.table("t").count() === 15)
  }
}
