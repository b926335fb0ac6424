package graft

import graft.catalog.{CatalogException, FaultInjection, KuduLikeCatalog, TableDef}

import org.apache.spark.sql.functions._

/** RESTORE TABLE t VERSION AS OF v — in-place history truncation, the
  * write-back face of time travel. Contract under test: the live table
  * becomes exactly the snapshot, truncated version ids are BURNED (a
  * post-restore mutation never aliases a deleted change set), history
  * below the delta floor refuses loudly, and a crash mid-truncation
  * leaves a legal snapshot that a retry converges from.
  */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private def build(): (KuduLikeCatalog, String) = {
    val root = tmpDir("graft_restore_")
    val cat = new KuduLikeCatalog(spark, root)
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    cat.createTable(TableDef("t", df.schema, Seq("id"), buckets = 2))
    cat.insert("t", df) // version 0 (base)
    cat.upsert("t", Seq((1L, "v1")).toDF("id", "payload")) // version 1
    cat.delete("t", col("id") >= 50) // version 2
    cat.upsert("t", Seq((2L, "v3")).toDF("id", "payload")) // version 3
    (cat, root)
  }

  test("restore truncates to the snapshot; burned ids never alias old change sets") {
    val (cat, _) = build()
    assert(cat.table("t").count() === 50)

    val expected = cat.tableAsOf("t", 1).orderBy("id").collect().map(_.toSeq).toSeq
    assert(GraftSql.execute(spark, cat, "RESTORE TABLE t VERSION AS OF 1")
      .head().getLong(2) === 2L) // layers 2 and 3 truncated
    assert(cat.table("t").orderBy("id").collect().map(_.toSeq).toSeq === expected)
    assert(cat.table("t").count() === 100, "the truncated delete never happened")
    assert(cat.table("t").where(col("id") === 2).head().getString(1) === "v2",
      "the truncated upsert never happened")

    // a new mutation must commit ABOVE the burned ids: replaying the
    // changelog from version 1 sees exactly the new layer, under a version
    // id no truncated layer ever used
    cat.upsert("t", Seq((3L, "after")).toDF("id", "payload"))
    val newSeqs = cat.changesBetween("t", 1, Int.MaxValue)
      .select("version").distinct().collect().map(_.getInt(0)).toSeq
    assert(newSeqs === Seq(4), s"burned ids 2,3 must stay dead, got $newSeqs")
    assert(cat.table("t").where(col("id") === 3).head().getString(1) === "after")
  }

  test("restore below the delta floor refuses loudly; restore to HEAD is a no-op") {
    val (cat, _) = build()
    assert(cat.restoreTable("t", 3) === 0L)
    cat.compact("t") // floor rises past every layer
    val e = intercept[CatalogException] { cat.restoreTable("t", 1) }
    assert(e.getMessage.contains("compacted"))
    assert(cat.restoreTable("t", cat.currentVersion("t")) === 0L)
  }

  test("crash mid-truncation leaves a legal snapshot; retry converges") {
    val (cat, _) = build()
    // kill after the FIRST deletion (highest layer first): state must be
    // exactly version 2 — a legal snapshot, not a torn overlay
    FaultInjection.arm(_ == "restore.step")
    try intercept[FaultInjection.InjectedCrash] { cat.restoreTable("t", 1) }
    finally FaultInjection.disarm()
    val v2 = cat.tableAsOf("t", 2).orderBy("id").collect().map(_.toSeq).toSeq
    assert(cat.table("t").orderBy("id").collect().map(_.toSeq).toSeq === v2,
      "highest-first deletion keeps every crash state a legal snapshot")

    // retry converges to the requested version
    assert(cat.restoreTable("t", 1) === 1L)
    assert(cat.table("t").count() === 100)

    // and the burned markers from the crashed attempt still hold: the next
    // mutation version is above everything ever committed
    cat.upsert("t", Seq((9L, "post")).toDF("id", "payload"))
    assert(cat.currentVersion("t") === 4)
  }
}
