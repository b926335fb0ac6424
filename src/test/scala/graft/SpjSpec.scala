package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-partitioned joins through the connector: two co-bucketed graft
  * tables joined on their full key plan with ZERO exchange — the tablet
  * layout is the join distribution (Kudu's co-located-scan promise through
  * the V2 planner). Negative cases keep correctness: mismatched bucket
  * counts fall back to a shuffle, pending deltas keep SPJ (a key's bucket
  * is a pure key hash, merge-on-read stays inside its bucket).
  */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  // Spark's CatalogManager caches plugin instances by name, so a reused
  // name would keep pointing at the first test's root — unique name per
  // call.
  private val catSeq = new java.util.concurrent.atomic.AtomicInteger()
  private def withCatalog[T](f: (KuduLikeCatalog, String, String) => T): T = {
    val root = tmpDir("graft_spj_")
    val cat = new KuduLikeCatalog(spark, root)
    val name = s"spjcat${catSeq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalogPlugin].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    try f(cat, root, name)
    finally spark.conf.unset(s"spark.sql.catalog.$name")
  }

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  private val facts = (1 to 2000)
    .map(i => (i.toLong, i * 3, s"f$i")).toDF("id", "x", "tag")
  private val dims = (1 to 500)
    .map(i => (i.toLong, s"d$i")).toDF("id", "name")

  test("co-bucketed equi-join on the full key plans with zero exchange") {
    withCatalog { (cat, _, cn) =>
      cat.createTable(TableDef("a", facts.schema, Seq("id"), buckets = 8))
      cat.insert("a", facts)
      cat.createTable(TableDef("b", dims.schema, Seq("id"), buckets = 8))
      cat.insert("b", dims)
      withSpj {
        val j = spark.sql(
          s"SELECT a.id, a.x, b.name FROM $cn.a a JOIN $cn.b b ON a.id = b.id")
        assert(j.count() === 500)
        assert(exchanges(j) === 0,
          s"expected a storage-partitioned join:\n${j.queryExecution.executedPlan}")
        val expect = facts.join(dims, "id").count()
        assert(j.count() === expect)
      }
    }
  }

  test("incompatible bucket counts fall back to a shuffled join, still correct") {
    withCatalog { (cat, _, cn) =>
      cat.createTable(TableDef("a", facts.schema, Seq("id"), buckets = 8))
      cat.insert("a", facts)
      // 3 does not divide 8: not even bucket-coalescing can align these
      cat.createTable(TableDef("b", dims.schema, Seq("id"), buckets = 3))
      cat.insert("b", dims)
      withSpj {
        val j = spark.sql(
          s"SELECT a.id, b.name FROM $cn.a a JOIN $cn.b b ON a.id = b.id")
        assert(j.count() === 500)
        assert(exchanges(j) > 0, "incompatible layouts must shuffle")
      }
    }
  }

  test("pending deltas keep the storage-partitioned plan and merge correctly") {
    withCatalog { (cat, _, cn) =>
      cat.createTable(TableDef("a", facts.schema, Seq("id"), buckets = 8))
      cat.insert("a", facts)
      cat.createTable(TableDef("b", dims.schema, Seq("id"), buckets = 8))
      cat.insert("b", dims)
      cat.upsert("b", Seq((7L, "UPDATED")).toDF("id", "name"))
      cat.delete("b", col("id") === 9L)
      withSpj {
        val j = spark.sql(
          s"SELECT a.id, b.name FROM $cn.a a JOIN $cn.b b ON a.id = b.id")
        assert(exchanges(j) === 0,
          s"deltas must not break SPJ:\n${j.queryExecution.executedPlan}")
        val got = j.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got.size === 499) // id 9 deleted
        assert(got(7L) === "UPDATED")
        assert(!got.contains(9L))
      }
    }
  }

  private def withSpj[T](body: => T): T = {
    val conf = "spark.sql.sources.v2.bucketing.enabled"
    val auto = "spark.sql.autoBroadcastJoinThreshold"
    val prevAuto = spark.conf.get(auto)
    spark.conf.set(conf, "true")
    spark.conf.set(auto, "-1") // force a non-broadcast join so SPJ is observable
    try body
    finally { spark.conf.set(conf, "false"); spark.conf.set(auto, prevAuto) }
  }

  test("compacted key order: sort-merge join skips exchanges AND sorts") {
    withCatalog { (cat, _, cn) =>
      cat.createTable(TableDef("a", facts.schema, Seq("id"), buckets = 8))
      cat.insert("a", facts)
      cat.createTable(TableDef("b", dims.schema, Seq("id"), buckets = 8))
      cat.insert("b", dims)
      cat.compact("a"); cat.compact("b") // one key-sorted file per bucket + _sort proof
      withSpj {
        val prefer = "spark.sql.join.preferSortMergeJoin"
        val prev = spark.conf.get(prefer)
        spark.conf.set(prefer, "true")
        try {
          val j = spark.sql(
            s"SELECT a.id, b.name FROM $cn.a a JOIN $cn.b b ON a.id = b.id")
          val plan = j.queryExecution.executedPlan.toString
          assert(j.count() === 500)
          assert(exchanges(j) === 0, s"expected SPJ:\n$plan")
          assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
          assert(!plan.linesIterator.exists(l => l.trim.startsWith("+- Sort ")
            || l.trim.startsWith(":- Sort ") || l.trim.startsWith("*(") && l.contains(" Sort ")),
            s"reported key order must eliminate the SMJ sorts:\n$plan")
        } finally spark.conf.set(prefer, prev)
      }
    }
  }

  test("clustered layout never claims key order (sorts stay in the plan)") {
    withCatalog { (cat, _, cn) =>
      cat.createTable(TableDef("a", facts.schema, Seq("id"), buckets = 8))
      cat.insert("a", facts)
      cat.compact("a", Seq("x")) // sorted by (x, id): NOT key order
      cat.createTable(TableDef("b", dims.schema, Seq("id"), buckets = 8))
      cat.insert("b", dims)
      cat.compact("b")
      withSpj {
        val prefer = "spark.sql.join.preferSortMergeJoin"
        val prev = spark.conf.get(prefer)
        spark.conf.set(prefer, "true")
        try {
          val j = spark.sql(
            s"SELECT a.id, b.name FROM $cn.a a JOIN $cn.b b ON a.id = b.id")
          val plan = j.queryExecution.executedPlan.toString
          assert(j.count() === 500)
          assert(plan.contains("Sort "),
            s"a clustered base must not claim key order:\n$plan")
        } finally spark.conf.set(prefer, prev)
      }
    }
  }

  test("an empty append after clustered compact cannot forge the key-order claim") {
    withCatalog { (cat, root, _) =>
      cat.createTable(TableDef("a", facts.schema, Seq("id"), buckets = 4))
      cat.insert("a", facts)
      cat.compact("a", Seq("x")) // base sorted by (x, id), marker = "x,id"
      // all-duplicate insert: zero files land, but the write path runs
      cat.insert("a", facts.limit(50))
      val marker = java.nio.file.Paths.get(cat.dataLocation("a")).resolve("_sort")
      assert(!java.nio.file.Files.exists(marker) ||
        java.nio.file.Files.readString(marker) != "id",
        "append must never assert a key-order marker over a clustered base")
    }
  }
}
