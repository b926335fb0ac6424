package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Runtime (DPP-style) filtering through the connector: the realized join
  * key set prunes fact-side buckets at execution time — the V2 face of
  * Kudu's scan-token re-scoping.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: DataFrame): BatchScanExec = {
    df.collect() // finalize the adaptive plan AND run the runtime filter
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case b: BatchScanExec => Seq(b)
        case other => other.children.flatMap(walk) ++
          other.subqueries.flatMap(walk)
      }
    val found = walk(df.queryExecution.executedPlan)
    assert(found.nonEmpty,
      s"no BatchScanExec in:\n${df.queryExecution.executedPlan.toString}")
    found.head
  }

  test("broadcast-join runtime filter prunes fact buckets to the routed set") {
    val root = tmpDir("graft_rtf_")
    val cat = new KuduLikeCatalog(spark, root)
    val facts = (1 to 4000).map(i => (i.toLong, i % 97)).toDF("id", "x")
    cat.createTable(TableDef("fact", facts.schema, Seq("id"), buckets = 16))
    cat.insert("fact", facts)
    // two probe keys -> at most two buckets can hold them. The dim side
    // must be a SOURCED relation with a selective filter, or the DPP rule
    // sees no benefit (a bare LocalRelation folds its filter away).
    val dimDir = tmpDir("graft_rtf_dim_")
    (1L to 1000L).toDF("id").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("id").isin(5L, 6L))
    val fact = spark.read.format("graft").option("root", root).load("fact")
    val j = fact.join(broadcast(dim), "id")
    val planStr = j.queryExecution.executedPlan.toString
    val scan = scanOf(j)
    assert(scan.scan.toString.contains("GraftScan"), s"unexpected scan: ${scan.scan}")
    assert(j.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 6L))
    // the runtime filter must have landed on the scan...
    assert(scanOf(j).toString.contains("RuntimeFilters: [dynamicpruning"),
      s"no runtime filter in:\n$planStr")
    // ...and actually dropped buckets: <= 2 of the 16 partitions survive
    val kept = scanOf(j).scan.toBatch.planInputPartitions().length
    assert(kept <= 2, s"runtime filter kept $kept of 16 bucket partitions")
  }

  test("runtime filtering never under-scans: merged deltas survive routing") {
    val root = tmpDir("graft_rtf_")
    val cat = new KuduLikeCatalog(spark, root)
    val facts = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    cat.createTable(TableDef("fact", facts.schema, Seq("id"), buckets = 8))
    cat.insert("fact", facts)
    cat.upsert("fact", Seq((42L, "UPDATED")).toDF("id", "v"))
    cat.delete("fact", col("id") === 43L)
    val dim = Seq(42L, 43L, 44L).toDF("id")
    val fact = spark.read.format("graft").option("root", root).load("fact")
    val got = fact.join(broadcast(dim), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(42L -> "UPDATED", 44L -> "v44"))
  }
}
