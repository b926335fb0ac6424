package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import org.apache.spark.sql.types._

/** The reference's own end-to-end acceptance test, replayed verbatim.
  *
  * `simple_test.sql` (reference: README.md:13-44) with its golden CLI
  * transcript (README.md:46-218) is the ONLY test the reference ships:
  * CREATE TABLE test_drop (id INT, name STRING) keyed on id → INSERT VALUES
  * (1,'a'),(2,'b'),(3,'a') → count(*) = 3 (golden rows README.md:155-158) →
  * SELECT id WHERE name='a' = {1,3} (README.md:176-180) → GROUP BY name =
  * (a,2),(b,1) (README.md:205-209) → DROP TABLE. Same DDL + DML + queries
  * here, through the catalog and Spark SQL over the registered view.
  */
class GoldenTranscriptSpec extends SparkSpec {

  test("reference simple_test.sql transcript reproduces, golden rows included") {
    import spark.implicits._
    val cat = new KuduLikeCatalog(spark, tmpDir("graft_golden_"))

    // CREATE TABLE test_drop (id INT, name STRING) ... kudu.key_columns=id
    cat.createTable(TableDef("test_drop",
      StructType(Seq(StructField("id", IntegerType), StructField("name", StringType))),
      Seq("id")))

    // INSERT INTO test_drop VALUES (1,'a'),(2,'b'),(3,'a')
    assert(cat.insert("test_drop", Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "name")) === 3)

    // queries go through SQL, like the Hive CLI did
    cat.table("test_drop").createOrReplaceTempView("test_drop")

    // SELECT count(*) FROM test_drop  → 3
    assert(spark.sql("SELECT count(*) FROM test_drop").head().getLong(0) === 3L)

    // SELECT id FROM test_Drop WHERE name = 'a'  → 1, 3
    val ids = spark.sql("SELECT id FROM test_Drop WHERE name = 'a'")
      .collect().map(_.getInt(0)).sorted
    assert(ids.toSeq === Seq(1, 3))

    // SELECT name, count(*) FROM test_drop GROUP BY name → (a,2),(b,1)
    val grouped = spark.sql("SELECT name, count(*) FROM test_drop GROUP BY name")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(grouped.toSeq === Seq(("a", 2L), ("b", 1L)))

    // PK duplicate-ignore on the same table shape (the handler's one
    // non-standard write semantic): re-inserting key 1 adds nothing
    assert(cat.insert("test_drop", Seq((1, "zzz")).toDF("id", "name")) === 0)
    assert(spark.sql("SELECT count(*) FROM test_drop").head().getLong(0) === 3L)

    // DROP TABLE test_drop
    cat.dropTable("test_drop")
    assert(!cat.exists("test_drop"))
  }

  test("the same transcript drives end-to-end through the SQL entry point") {
    // the reference's user surface is SQL text, not an API
    // (simple_test.sql, README.md:13-44) — replay it as statements through
    // GraftSql, golden rows included
    val cat = new KuduLikeCatalog(spark, tmpDir("graft_golden_sql_"))
    def sql(s: String) = GraftSql.execute(spark, cat, s)

    sql("""CREATE TABLE test_drop (id INT, name STRING)
          |STORED BY 'org.kududb.hive.KuduStorageHandler'
          |TBLPROPERTIES(
          |  'kudu.table_name' = 'test_drop',
          |  'kudu.master_addresses' = '127.0.0.1:7051',
          |  'kudu.key_columns' = 'id'
          |);""".stripMargin)
    assert(cat.exists("test_drop"))
    assert(cat.keyColsOf("test_drop") === Seq("id"))

    // describe formatted test_drop — the transcript's step 2
    // (README.md:33, golden output README.md:76-110): column rows plus the
    // detailed sections carrying the kudu.* parameters and storage handler
    val desc = sql("describe formatted test_drop")
    assert(desc.columns.toSeq === Seq("col_name", "data_type", "comment"))
    val rows = desc.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.contains(("id", "int", "primary key")))
    assert(rows.contains(("name", "string", "")))
    assert(rows.contains(("", "kudu.table_name", "test_drop")))
    assert(rows.contains(("", "kudu.key_columns", "id")))
    assert(rows.contains(("", "storage_handler", "graft.catalog.KuduLikeCatalog")))
    assert(rows.contains(("Table Type:", "MANAGED_TABLE", "")))
    assert(rows.exists(r => r._1 == "Location:" && r._2.endsWith("test_drop")))
    assert(rows.contains(("# Detailed Table Information", "", "")))
    assert(rows.contains(("# Storage Information", "", "")))
    assert(rows.contains(("Num Buckets:", "-1", "")))
    // plain DESCRIBE: just the column rows
    assert(sql("DESCRIBE test_drop").collect().length === 2)

    val ins = sql("INSERT INTO TABLE test_drop VALUES (1,'a'),(2,'b'),(3,'a')")
    assert(ins.head().getLong(2) === 3L)

    assert(sql("SELECT count(*) FROM test_drop").head().getLong(0) === 3L)
    assert(sql("SELECT id FROM test_Drop WHERE name = 'a'")
      .collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
    assert(sql("SELECT name, count(*) FROM test_drop GROUP BY name")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      === Seq(("a", 2L), ("b", 1L)))

    // PK duplicate-ignore through SQL: re-inserting key 1 adds nothing
    assert(sql("INSERT INTO test_drop VALUES (1,'zzz')").head().getLong(2) === 0L)
    assert(sql("SELECT count(*) FROM test_drop").head().getLong(0) === 3L)

    // the two Hive verbs a reference user reaches for next (delegated to
    // hive-exec in the reference, pom.xml:28-31): derive a summary table
    // with CTAS, then refresh it with INSERT OVERWRITE
    val ctas = sql("""CREATE TABLE name_counts
          |STORED BY 'org.kududb.hive.KuduStorageHandler'
          |TBLPROPERTIES('kudu.key_columns' = 'name')
          |AS SELECT name, count(*) AS n FROM test_drop GROUP BY name""".stripMargin)
    assert(ctas.head().getLong(2) === 2L)
    assert(sql("SELECT name, n FROM name_counts ORDER BY name")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("a", 2L), ("b", 1L)))
    assert(sql("""INSERT OVERWRITE TABLE name_counts
          |SELECT name, count(*) FROM test_drop WHERE id > 1 GROUP BY name"""
      .stripMargin).head().getLong(2) === 2L)
    assert(sql("SELECT name, n FROM name_counts ORDER BY name")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("a", 1L), ("b", 1L)))
    sql("DROP TABLE name_counts")

    sql("DROP TABLE test_drop")
    assert(!cat.exists("test_drop"))
    // IF EXISTS on a gone table is a no-op, not an error
    sql("DROP TABLE IF EXISTS test_drop")
  }
}
