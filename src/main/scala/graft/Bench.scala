package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line.
  *
  * Each query is materialized through the `noop` sink — unlike `count()`,
  * this executes the full plan with all output columns (count() lets
  * Catalyst prune projections and skip result decoding, which would
  * flatter the numbers).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // JIT/session warmup

    // Measurement design (the product of three rounds of bench forensics):
    // one warmup sweep, then `groups` SPACED sweeps each running a query
    // several times back-to-back, reporting the MIN across all samples.
    //  - Round 2 (1 pass/query): a single GC pause branded a code-identical
    //    query 3.2x slower.
    //  - Round 3 (3 consecutive passes, median): a multi-second transient
    //    host disturbance covered all 3 back-to-back passes, so the median
    //    kept the inflated number — the "d18_l2_normalize 6x regression"
    //    was exactly this (adjacent run positions inflated together; solo
    //    reruns reproduced the fast numbers on identical code).
    //  - Plain pass-major interleaving with a median fixed the robustness
    //    but added a flat ~0.18 s/query: Spark's generated-class cache
    //    holds ~100 entries, so with 123 queries between samples every
    //    sample re-compiled its codegen.
    // The grouped design gets both properties: later runs in each group are
    // codegen-hot (the group's 1st run just compiled it), groups sit
    // minutes apart so a short disturbance cannot cover them all, and MIN
    // is the right estimator for a deterministic workload — timing noise
    // (GC, host contention, recompile) is strictly additive, so the
    // smallest observation is the least-disturbed hot time.
    val groups = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt).getOrElse(2).max(1)
    val queries = SparkEntry.all
    def run(q: QDef): Unit =
      q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val failed = scala.collection.mutable.Set[String]()
    queries.foreach { q =>
      try run(q) catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          failed += q.name
      }
    }
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    // 3 back-to-back runs per group: the 1st pays any codegen recompile,
    // and CPU-bound queries need a couple of hot iterations for the JIT to
    // finish tiering the generated loops (measured: 2-per-group left
    // regex/hash-heavy queries 1.3-2x above their fully-warm floor).
    for (_ <- 1 to groups; q <- queries if !failed(q.name); _ <- 1 to 3) {
      try {
        val t0 = System.nanoTime()
        run(q)
        val t = (System.nanoTime() - t0) / 1e9
        samples(q.name) = t :: samples(q.name)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          failed += q.name
      }
    }
    val results = queries.map { q =>
      q.name -> (if (failed(q.name) || samples(q.name).isEmpty) -1.0
                 else samples(q.name).min)
    }
    // all-samples median, written to bench.json alongside the headline min
    // so the estimator choice stays auditable from the artifact itself
    def med(xs: List[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n == 0) -1.0 else if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    // Round-1 postmortem: the driver's stdout capture truncated the JSON
    // line (BENCH_r01 "parsed": null, tail mid-JSON). Keep stdout to exactly
    // ONE compact line — timings rounded to ms so the line stays well under
    // typical capture windows — and ALSO write full-precision bench.json to
    // the repo root so the whole artifact is always readable from disk.
    def ms(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    // failed queries are reported as -1 but excluded from the total
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val full = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // same failed/empty guard as the min: a query that failed partway
    // through the timed loop must not report a real-looking median computed
    // from its pre-failure samples (the artifact would be internally
    // inconsistent with the -1.0 in `queries`)
    val fullMed = queries.map { q =>
      val v = if (failed(q.name)) -1.0 else med(samples(q.name))
      "\"" + q.name + "\":" + v
    }.mkString("{", ",", "}")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BENCH_OUT", "bench.json")),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$full,""" +
        s""""queries_med":$fullMed,"sf":"$sfDir"}""" + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: $e") }
    println(line)
    spark.stop()
  }
}
