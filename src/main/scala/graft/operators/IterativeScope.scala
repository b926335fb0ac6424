package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared harness for ITERATIVE operators (connected components, PageRank,
  * k-means): run a fixpoint/iteration loop with partitioning derived from
  * the measured input size and with AQE disabled for the loop's plans.
  *
  * Why (round-16 measurement, OPTIMIZATION_r16.md): with AQE on, every
  * Exchange in every round's plan executes as its OWN driver job — a
  * 6-round component loop over a tiny candidate graph ran 60 jobs / 60
  * stages, ~80 ms of driver scheduling+replanning each, with the actual
  * task work in the milliseconds. AQE's per-stage re-optimization buys
  * nothing here: the loop's frames are localCheckpointed every round, so
  * their sizes are KNOWN when the round is planned, and the right
  * partition count is a pure function of the materialized edge/row count.
  * Deriving `n` from the data (not from `spark.sql.shuffle.partitions`,
  * a constant tuned for either local mode or the cluster) is the
  * scale-adaptive discipline of the optimization guide §2: at 100 TB the
  * same formula yields tens of thousands of partitions; on a 60-document
  * fixture it yields 1.
  *
  * The conf flips are scoped and restored in `finally`; plans BUILT and
  * EXECUTED inside the scope (each round's localCheckpoint + probe) use
  * the loop settings, while frames returned to the caller are already
  * materialized, so downstream consumers plan under the caller's own
  * session settings.
  */
object IterativeScope {

  /** Partition count for a loop over `rows` materialized rows of a narrow
    * (few-column numeric) frame. Two regimes, one formula:
    *
    *  - big data: ~2M rows ≈ 64 MB per partition, no ceiling — at corpus
    *    scale the count grows with the data (guide §2.2: partitions in the
    *    100 MB-1 GB range, never a constant);
    *  - small/medium data: enough partitions to use the cluster's cores,
    *    but never fewer than ~64k rows per task (a 200-edge candidate
    *    graph gets 1 partition, not defaultParallelism empty ones; a
    *    1M-edge graph gets ~16, not 1 — per-task CPU work in a join round
    *    is row-bound, so a single giant partition serializes the round).
    */
  def partitionsFor(spark: SparkSession, rows: Long): Int = {
    // defaultParallelism caveat: under dynamic allocation with no executors
    // registered yet this can read ~2 and derate the core-fill bound for
    // the whole loop invocation; on such clusters pass an explicit floor
    // via spark.default.parallelism (local mode always reports the master's
    // core count, so the bench/driver path is unaffected).
    val bigData = (rows + (2L << 20) - 1) / (2L << 20) // ≥1 per 2M rows
    val coreFill = math.min(
      (rows + 65535) / 65536, // ≤1 per 64k rows
      spark.sparkContext.defaultParallelism.toLong)
    math.max(1L, math.max(bigData, coreFill)).min(Int.MaxValue).toInt
  }

  /** One lock per SparkSession (sessions are few and long-lived — the map
    * never grows past the session count): overlapping scopes on the SAME
    * session from two threads could interleave set/restore and leave the
    * session misconfigured after both exit (round-16 advice). Scopes on
    * DIFFERENT sessions stay independent.
    */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.util.concurrent.locks.ReentrantLock]()

  /** Run `body` with AQE off and `spark.sql.shuffle.partitions` = n,
    * restoring both on exit (exception-safe). Re-entrant within a thread
    * (ReentrantLock): nested scopes restore whatever the outer scope had
    * set. Concurrent scopes on one session SERIALIZE — two overlapping
    * loops can no longer restore each other's values out of order.
    *
    * Residual caveat (documented, not solved): the flips are session-global
    * while held, so an UNRELATED query planned on the same session from
    * another thread mid-loop plans with AQE off and the loop's partition
    * count — correct, just differently partitioned. Callers that interleave
    * ad-hoc planning with these loops should run the loops on their own
    * session (`spark.newSession()` shares the block store the checkpointed
    * frames live in, so the frames themselves stay valid).
    */
  def withLoopConfs[A](spark: SparkSession, n: Int)(body: => A): A = {
    val lock = locks.computeIfAbsent(spark,
      _ => new java.util.concurrent.locks.ReentrantLock())
    lock.lock()
    try {
      val conf = spark.conf
      val aqeWas = conf.get("spark.sql.adaptive.enabled", "true")
      val spWas = conf.get("spark.sql.shuffle.partitions", "200")
      try {
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", n.toString)
        body
      } finally {
        conf.set("spark.sql.adaptive.enabled", aqeWas)
        conf.set("spark.sql.shuffle.partitions", spWas)
      }
    } finally lock.unlock()
  }
}
