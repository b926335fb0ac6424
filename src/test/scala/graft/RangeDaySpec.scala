package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import org.apache.spark.sql.functions._

/** Day-granularity range partitioning: `__range=yyyy-MM-dd` directories,
  * 30× finer pruning for day-window queries than the month default —
  * the Kudu arbitrary-range-bounds analog at a second granularity.
  */
class RangeDaySpec extends SparkSpec {
  import spark.implicits._

  private def eventsFortnight() = Tables.load(spark, sf, "events")
    .filter(col("ts") >= lit("2024-01-01").cast("timestamp") &&
      col("ts") < lit("2024-01-15").cast("timestamp"))
    .select("event_id", "ts", "user_id", "value")

  test("day directories, day-pruned lookups, connector parity") {
    val root = tmpDir("graft_day_")
    val cat = new KuduLikeCatalog(spark, root)
    val ev = eventsFortnight()
    cat.createTable(TableDef("ev", ev.schema, Seq("event_id"),
      buckets = 2, rangeCol = Some("ts"), rangeGranularity = "day"))
    cat.insert("ev", ev)
    assert(cat.rangeGranularityOf("ev") === "day")
    // layout: __range= values are full dates
    val dirs = new java.io.File(cat.dataLocation("ev")).listFiles()
      .filter(_.getName.startsWith("__range=")).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("__range=\\d{4}-\\d{2}-\\d{2}")),
      s"expected day dirs, got: ${dirs.mkString(",")}")
    assert(dirs.length >= 10, s"a fortnight should span many day dirs: ${dirs.length}")
    // day-window lookup: exact rows
    val from = java.sql.Timestamp.valueOf("2024-01-03 00:00:00")
    val to = java.sql.Timestamp.valueOf("2024-01-06 00:00:00")
    val got = cat.lookupRange("ev", from, to)
    val expect = ev.filter(col("ts") >= lit(from) && col("ts") < lit(to))
    assert(got.count() === expect.count())
    assert(got.exceptAll(expect.select(got.columns.map(col): _*)).count() === 0)
    // connector read with a day predicate: planning-time pruning + parity
    val viaConnector = spark.read.format("graft").option("root", root).load("ev")
      .filter(col("ts") >= lit(from) && col("ts") < lit(to))
    assert(viaConnector.count() === expect.count())
    // mutations keep working across day layers
    val someId = ev.orderBy("event_id").head().getLong(0)
    cat.delete("ev", col("event_id") === someId)
    assert(cat.table("ev").filter(col("event_id") === someId).count() === 0)
    cat.compact("ev")
    assert(cat.table("ev").count() === ev.count() - 1)
  }

  test("SQL face: graft.range_granularity property, SHOW CREATE round trip") {
    val cat = new KuduLikeCatalog(spark, tmpDir("graft_day_"))
    def sql(s: String) = GraftSql.execute(spark, cat, s)
    sql("""CREATE TABLE evd (id BIGINT, ts TIMESTAMP, v DOUBLE)
          |STORED BY 'handler'
          |TBLPROPERTIES('kudu.key_columns'='id', 'graft.hash_buckets'='2',
          |  'graft.range_column'='ts', 'graft.range_granularity'='day')""".stripMargin)
    assert(cat.rangeGranularityOf("evd") === "day")
    sql("INSERT INTO evd VALUES (1, TIMESTAMP'2024-03-05 10:00:00', 1.0)," +
      "(2, TIMESTAMP'2024-03-06 10:00:00', 2.0)")
    assert(sql("SELECT count(*) FROM evd").head().getLong(0) === 2L)
    val ddl = sql("SHOW CREATE TABLE evd").collect().map(_.getString(0)).mkString("\n")
    assert(ddl.contains("'graft.range_granularity' = 'day'"), s"missing in:\n$ddl")
    intercept[IllegalArgumentException] {
      cat.createTable(TableDef("bad", eventsFortnight().schema, Seq("event_id"),
        rangeCol = Some("ts"), rangeGranularity = "hour"))
    }
  }
}
