package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-partitioning on a PK SUBSET — Kudu's actual partitioning model
  * (`HASH (host) PARTITIONS n` under a PK of (host, metric, ts)): one
  * entity's rows co-locate in one tablet while the key stays unique.
  * Contracts: write/merge/lookup agree on the subset hash, the layout
  * really co-locates, and SPJ joins on the subset column run exchange-free.
  */
class HashSubsetSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (
    for (h <- 1 to 40; m <- Seq("cpu", "mem"); t <- 1 to 5)
      yield (s"host$h", m, t.toLong, h * 100.0 + t)
    ).toDF("host", "metric", "ts", "value")

  private def metricsTable(cat: KuduLikeCatalog): Unit = {
    cat.createTable(TableDef("metrics", rows.schema,
      keyCols = Seq("host", "metric", "ts"), buckets = 8,
      hashCols = Seq("host")))
    cat.insert("metrics", rows)
  }

  test("one entity, one bucket: subset hashing co-locates; mutations merge") {
    val root = tmpDir("graft_hsub_")
    val cat = new KuduLikeCatalog(spark, root)
    metricsTable(cat)
    assert(cat.hashColsOf("metrics") === Seq("host"))
    // layout: every row of a host lands in exactly one bucket dir
    val buckets = spark.read.parquet(cat.dataLocation("metrics"))
      .select(col("host"), input_file_name().as("f"))
      .withColumn("b", regexp_extract(col("f"), "__bucket=(\\d+)", 1))
      .groupBy("host").agg(countDistinct("b").as("nb"))
      .agg(max("nb")).head().getLong(0)
    assert(buckets === 1L, "a host's rows must co-locate in one bucket")
    // merge-on-read across the subset hash
    cat.upsert("metrics", Seq(("host7", "cpu", 3L, 9999.0))
      .toDF("host", "metric", "ts", "value"))
    cat.delete("metrics", col("host") === "host9" && col("metric") === "mem")
    val t = cat.table("metrics")
    assert(t.count() === rows.count() - 5)
    assert(t.filter(col("host") === "host7" && col("metric") === "cpu" && col("ts") === 3)
      .head().getDouble(3) === 9999.0)
    // full-key lookup routes through the subset hash
    val hit = cat.lookup("metrics", "host7", "cpu", 3L)
    assert(hit.count() === 1 && hit.head().getDouble(3) === 9999.0)
    // compact folds and keeps the layout
    cat.compact("metrics")
    assert(cat.deltaLayers("metrics").isEmpty)
    assert(cat.table("metrics").count() === rows.count() - 5)
  }

  test("SPJ on the subset column: metrics x host-dim joins with zero exchange") {
    val root = tmpDir("graft_hsub_")
    val cat = new KuduLikeCatalog(spark, root)
    metricsTable(cat)
    cat.compact("metrics")
    val dims = (1 to 40).map(h => (s"host$h", s"rack${h % 4}")).toDF("host", "rack")
    cat.createTable(TableDef("hosts", dims.schema, Seq("host"), buckets = 8))
    cat.insert("hosts", dims)
    cat.compact("hosts")
    val cn = s"hsub${System.identityHashCode(this)}"
    spark.conf.set(s"spark.sql.catalog.$cn",
      classOf[graft.sources.GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$cn.root", root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        s"SELECT m.host, m.metric, m.ts, h.rack FROM $cn.metrics m JOIN $cn.hosts h ON m.host = h.host")
      assert(j.count() === rows.count())
      val exchanges = j.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      assert(exchanges === 0,
        s"subset-hash SPJ expected:\n${j.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    }
  }

  test("SQL face: graft.hash_columns property, SHOW CREATE round trip") {
    val cat = new KuduLikeCatalog(spark, tmpDir("graft_hsub_"))
    def sql(s: String): DataFrame = GraftSql.execute(spark, cat, s)
    sql("""CREATE TABLE ev (host STRING, ts BIGINT, v DOUBLE)
          |STORED BY 'handler'
          |TBLPROPERTIES('kudu.key_columns'='host,ts',
          |  'graft.hash_buckets'='4', 'graft.hash_columns'='host')""".stripMargin)
    assert(cat.hashColsOf("ev") === Seq("host"))
    sql("INSERT INTO ev VALUES ('a', 1, 1.0), ('a', 2, 2.0), ('b', 1, 3.0)")
    assert(sql("SELECT count(*) FROM ev").head().getLong(0) === 3L)
    val ddl = sql("SHOW CREATE TABLE ev").collect().map(_.getString(0)).mkString("\n")
    assert(ddl.contains("'graft.hash_columns' = 'host'"), s"missing hash cols in:\n$ddl")
    // invalid subset rejected
    intercept[IllegalArgumentException] {
      cat.createTable(TableDef("bad", rows.schema, Seq("host"), buckets = 2,
        hashCols = Seq("value")))
    }
  }
}
