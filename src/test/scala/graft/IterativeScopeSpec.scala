package graft

import graft.operators.{Dedup, IterativeScope}
import org.apache.spark.sql.functions._

/** Round-16 optimization: iterative operators (connectedComponents,
  * pageRankInt) run their loops under IterativeScope — data-derived
  * partition count, AQE off for the loop's plans, confs restored on exit.
  * This spec pins the scope mechanics the operators now rely on.
  */
class IterativeScopeSpec extends SparkSpec {

  test("partitionsFor: 1 for tiny, core-bound for medium, size-bound for huge") {
    val p = spark.sparkContext.defaultParallelism // local[4] = 4
    assert(IterativeScope.partitionsFor(spark, 0L) === 1)
    assert(IterativeScope.partitionsFor(spark, 200L) === 1)
    // medium: fills cores at ~64k rows/task, capped by defaultParallelism
    assert(IterativeScope.partitionsFor(spark, 130000L) === 2)
    // 10M rows: size bound ceil(10M/2M)=5 already exceeds the core bound
    assert(IterativeScope.partitionsFor(spark, 10L * 1000 * 1000) === math.max(p, 5))
    assert(IterativeScope.partitionsFor(spark, 400000L) === p)
    // huge: ~2M rows per partition, beyond the core count
    assert(IterativeScope.partitionsFor(spark, 100L * 1000 * 1000) === 48)
  }

  test("withLoopConfs: sets AQE off + shuffle partitions, restores both, exception-safe") {
    val conf = spark.conf
    val aqe0 = conf.get("spark.sql.adaptive.enabled", "true")
    val sp0 = conf.get("spark.sql.shuffle.partitions")
    val seen = IterativeScope.withLoopConfs(spark, 7) {
      (conf.get("spark.sql.adaptive.enabled"), conf.get("spark.sql.shuffle.partitions"))
    }
    assert(seen === (("false", "7")))
    assert(conf.get("spark.sql.adaptive.enabled", "true") === aqe0)
    assert(conf.get("spark.sql.shuffle.partitions") === sp0)
    intercept[RuntimeException] {
      IterativeScope.withLoopConfs(spark, 3)(throw new RuntimeException("boom"))
    }
    assert(conf.get("spark.sql.adaptive.enabled", "true") === aqe0)
    assert(conf.get("spark.sql.shuffle.partitions") === sp0)
  }

  test("localCheckpoint carries hash partitioning: co-partitioned agg plans no Exchange") {
    IterativeScope.withLoopConfs(spark, 3) {
      val ck = spark.range(10000).selectExpr("id % 97 as k", "id as v")
        .repartition(3, col("k")).localCheckpoint()
      val plan = ck.groupBy("k").agg(sum(col("v"))).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free agg, got:\n$plan")
    }
  }

  test("withLoopConfs: concurrent scopes on one session serialize and restore exactly") {
    // round-17 (advice): two overlapping scopes used to interleave
    // set/restore and could leave the session misconfigured after both
    // exit. Scopes now hold a per-session lock: every scope must observe
    // ITS OWN n for its whole body, and the original confs survive any
    // interleaving of many concurrent scopes.
    val conf = spark.conf
    val aqe0 = conf.get("spark.sql.adaptive.enabled", "true")
    val sp0 = conf.get("spark.sql.shuffle.partitions")
    val bad = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (1 to 40).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = IterativeScope.withLoopConfs(spark, i) {
            // the scope's settings must be stable across its body even
            // while 3 other threads open/close their own scopes
            if (conf.get("spark.sql.shuffle.partitions") != i.toString) bad.incrementAndGet()
            if (conf.get("spark.sql.adaptive.enabled") != "false") bad.incrementAndGet()
            Thread.sleep(1)
            if (conf.get("spark.sql.shuffle.partitions") != i.toString) bad.incrementAndGet()
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(bad.get() === 0)
    assert(conf.get("spark.sql.adaptive.enabled", "true") === aqe0)
    assert(conf.get("spark.sql.shuffle.partitions") === sp0)
  }

  test("connectedComponents under the scope: correct on a chain+star mix, confs restored") {
    import spark.implicits._
    val sp0 = spark.conf.get("spark.sql.shuffle.partitions")
    val edges = ((0 until 30).map(i => (i.toLong, (i + 1).toLong)) ++
      Seq((100L, 101L), (100L, 102L), (200L, 201L))).toDF("a", "b")
    val cc = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 to 30).forall(i => cc(i.toLong) == 0L))
    assert(cc(101L) == 100L && cc(102L) == 100L && cc(201L) == 200L)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === sp0)
  }
}
