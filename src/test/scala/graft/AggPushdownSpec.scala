package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Footer-answered aggregate pushdown through the DSv2 connector:
  * COUNT(*)/MIN/MAX come from parquet metadata when (and only when) the
  * footers are the whole truth — no deltas, no filters, no grouping —
  * and every decline path still computes the right answer the slow way.
  */
class AggPushdownSpec extends SparkSpec {

  /** Storage backend the TABLES are built through — the Hadoop subclass
    * below re-runs the whole suite with every catalog write going through
    * `org.apache.hadoop.fs`, proving the connector's footer reads survive
    * the FileSystem seam (round-15 verdict item 7).
    */
  protected def specStorage: graft.catalog.GraftStorage = graft.catalog.NioStorage
  protected def mkCat(root: String) =
    new KuduLikeCatalog(spark, root, specStorage)
  import spark.implicits._

  private def plannedScan(df: DataFrame): String = {
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString
  }

  private def freshTable(rows: DataFrame, buckets: Int = 4): (KuduLikeCatalog, String) = {
    val root = tmpDir("graft_aggpd_")
    val cat = mkCat(root)
    cat.createTable(TableDef("t", rows.schema, Seq("id"), buckets = buckets))
    cat.insert("t", rows)
    (cat, root)
  }

  private def connector(root: String): DataFrame =
    spark.read.format("graft").option("root", root).load("t")

  private val rows = (1 to 1000)
    .map(i => (i.toLong, i * 2, i / 7.0, s"s$i")).toDF("id", "x", "d", "s")

  test("count/min/max answered from footers, pinned in the plan") {
    val (_, root) = freshTable(rows)
    val agg = connector(root).agg(
      count(lit(1)).as("n"), min("x").as("mn"), max("d").as("mx"))
    assert(plannedScan(agg).contains("PushedAggregates"),
      s"aggregate not pushed:\n${plannedScan(agg)}")
    val r = agg.head()
    assert(r.getLong(0) === 1000L)
    assert(r.getInt(1) === 2)
    assert(r.getDouble(2) === 1000 / 7.0)
  }

  test("pending deltas decline the pushdown; compaction restores it") {
    val (cat, root) = freshTable(rows)
    cat.upsert("t", Seq((5L, 999999, 0.0, "upd")).toDF("id", "x", "d", "s"))
    val agg = connector(root).agg(count(lit(1)).as("n"), max("x").as("mx"))
    assert(!plannedScan(agg).contains("PushedAggregates"),
      "must not trust footers while deltas are pending")
    val r = agg.head()
    assert(r.getLong(0) === 1000L) // upsert of an existing key: count unchanged
    assert(r.getInt(1) === 999999) // post-merge value, not the base footer's
    cat.compact("t")
    val agg2 = connector(root).agg(count(lit(1)).as("n"), max("x").as("mx"))
    assert(plannedScan(agg2).contains("PushedAggregates"))
    val r2 = agg2.head()
    assert(r2.getLong(0) === 1000L && r2.getInt(1) === 999999,
      "compacted footers must reflect the merged state")
  }

  test("filters and grouping decline the pushdown but stay correct") {
    val (_, root) = freshTable(rows)
    val filtered = connector(root).filter(col("x") > 100).agg(count(lit(1)).as("n"))
    assert(!plannedScan(filtered).contains("PushedAggregates"))
    assert(filtered.head().getLong(0) === rows.filter(col("x") > 100).count())
    val grouped = connector(root).groupBy(col("id") % 2).agg(min("x"))
    assert(!plannedScan(grouped).contains("PushedAggregates"))
    assert(grouped.count() === 2)
  }

  test("string min/max is never footer-answered (truncation risk); still correct") {
    val (_, root) = freshTable(rows)
    val agg = connector(root).agg(min("s").as("mn"))
    assert(!plannedScan(agg).contains("PushedAggregates"))
    assert(agg.head().getString(0) === "s1")
  }

  test("all-null column yields NULL min/max from footers") {
    val root = tmpDir("graft_aggpd_")
    val cat = mkCat(root)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    cat.createTable(TableDef("t", schema, Seq("id")))
    cat.insert("t", spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 50).map(i =>
        org.apache.spark.sql.Row(i.toLong, null))), schema))
    val agg = connector(root).agg(count(lit(1)).as("n"), min("v").as("mn"))
    assert(plannedScan(agg).contains("PushedAggregates"))
    val r = agg.head()
    assert(r.getLong(0) === 50L)
    assert(r.isNullAt(1))
  }

  test("count(col) from footer null counts; count(distinct) declines") {
    val root = tmpDir("graft_aggpd_")
    val cat = mkCat(root)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    // every third v is null
    cat.createTable(TableDef("t", schema, Seq("id"), buckets = 3))
    cat.insert("t", spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 300).map(i => org.apache.spark.sql.Row(
        i.toLong, if (i % 3 == 0) null else i.toDouble))), schema))
    val agg = connector(root).agg(count(col("v")).as("nv"), count(lit(1)).as("n"))
    assert(plannedScan(agg).contains("PushedAggregates"))
    val r = agg.head()
    assert(r.getLong(0) === 200L && r.getLong(1) === 300L)
    val distinct = connector(root).agg(count_distinct(col("v")).as("nd"))
    assert(!plannedScan(distinct).contains("PushedAggregates"))
    assert(distinct.head().getLong(0) === 200L)
  }

  test("timestamp min/max from footers equals the scan answer") {
    val root = tmpDir("graft_aggpd_")
    val cat = mkCat(root)
    val ev = Tables.load(spark, sf, "events").select(
      col("event_id").as("id"), col("ts"))
    cat.createTable(TableDef("t", ev.schema, Seq("id"), buckets = 2))
    cat.insert("t", ev)
    val agg = connector(root).agg(min("ts").as("mn"), max("ts").as("mx"))
    assert(plannedScan(agg).contains("PushedAggregates"))
    val exact = ev.agg(min("ts"), max("ts")).head()
    val got = agg.head()
    assert(got.get(0) === exact.get(0) && got.get(1) === exact.get(1))
  }
}
