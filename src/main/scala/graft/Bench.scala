package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR.
  *
  * Each query is materialized through the `noop` sink — unlike `count()`,
  * this executes the full plan with all output columns (count() lets
  * Catalyst prune projections and skip result decoding, which would
  * flatter the numbers).
  *
  * Output contract (round-5 verdict: the driver's stdout capture truncated
  * the per-query map five rounds running):
  *  - stdout: ONE SHORT line — totals and counts only, no per-query map.
  *  - bench.json (repo root): the full artifact — per-query min/median,
  *    every raw sample per query (`queries_samples`, in run order), and the
  *    solo-rerun pass (`queries_solo`) for suspects.
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

    // Measurement design (the product of four rounds of bench forensics):
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
    //  - Round 5: min-of-6 across 2 spaced groups still branded 3 adjacent
    //    queries 1.7-4.3x slower on code-identical operators — a
    //    DETERMINISTIC in-sweep disturbance (same predecessors every group)
    //    is invisible to any number of spaced groups. Hence round 6: 3
    //    groups (default), every raw sample logged to bench.json, and a
    //    SOLO rerun pass for any query whose sweep min is suspicious vs the
    //    prior round's bench.json — solo timing is the ground truth a
    //    deterministic sweep disturbance cannot touch.
    // The grouped design gets both properties: later runs in each group are
    // codegen-hot (the group's 1st run just compiled it), groups sit
    // minutes apart so a short disturbance cannot cover them all, and MIN
    // is the right estimator for a deterministic workload — timing noise
    // (GC, host contention, recompile) is strictly additive, so the
    // smallest observation is the least-disturbed hot time.
    val groups = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt).getOrElse(3).max(1)
    val queries = SparkEntry.all
    // benchFn (when present) is the query minus its one-time setup — table
    // builds belong outside the timed lambda (QDef.benchFn scaladoc).
    def run(q: QDef): Unit =
      q.benchFn.getOrElse(q.fn)(spark, sfDir).write.mode("overwrite").format("noop").save()
    def timed(q: QDef): Double = {
      val t0 = System.nanoTime()
      run(q)
      val s = (System.nanoTime() - t0) / 1e9
      // stderr breadcrumb for pathological samples (round-17: a stall class
      // 10-100x a query's floor was invisible in the artifact until after
      // the run; the trace timestamps it for forensics against GC/cleaner
      // logs). Threshold high enough to stay silent on a healthy sweep.
      if (s > 5.0) System.err.println(
        f"[bench] SLOW ${q.name} ${s}%.1f s at ${java.time.Instant.now()}")
      s
    }
    val failed = scala.collection.mutable.Set[String]()
    // full stack, not getMessage (round-16: an in-bench analysis
    // INTERNAL_ERROR's cause was swallowed, leaving the failure undiagnosable)
    def logFailure(name: String, e: Throwable): Unit = {
      System.err.println(s"[bench] $name failed: ${e.getMessage}")
      e.printStackTrace(System.err)
    }
    queries.foreach { q =>
      try run(q) catch {
        case e: Throwable =>
          logFailure(q.name, e)
          failed += q.name
      }
    }
    // samples appended in run order (group-major), so the artifact preserves
    // the run sequence a future forensic pass needs
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // 3 back-to-back runs per group: the 1st pays any codegen recompile,
    // and CPU-bound queries need a couple of hot iterations for the JIT to
    // finish tiering the generated loops (measured: 2-per-group left
    // regex/hash-heavy queries 1.3-2x above their fully-warm floor).
    for (_ <- 1 to groups; q <- queries if !failed(q.name); _ <- 1 to 3) {
      try samples(q.name) = samples(q.name) :+ timed(q)
      catch {
        case e: Throwable =>
          logFailure(q.name, e)
          failed += q.name
      }
    }
    val sweepMin = queries.map { q =>
      q.name -> (if (failed(q.name) || samples(q.name).isEmpty) -1.0
                 else samples(q.name).min)
    }.toMap

    // Solo-rerun pass (round-5 verdict item 1a): any query whose sweep min
    // exceeds 1.5x its previous-round min (prior bench.json, if readable)
    // or exceeds 2 s gets re-run alone — min of 3 — AFTER the sweep, when
    // no deterministic predecessor can disturb it. Both numbers are
    // reported; the headline `queries` min takes the smaller (min over all
    // observations is the design's estimator).
    val prevMin: Map[String, Double] = {
      val p = java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_BENCH_OUT", "bench.json"))
      try {
        val txt = java.nio.file.Files.readString(p)
        // minimal extraction of the prior "queries" object — the artifact is
        // machine-written flat JSON, so a regex over "name":value suffices
        val obj = """"queries"\s*:\s*\{([^}]*)\}""".r
          .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
        """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9.Ee+-]+)""".r.findAllMatchIn(obj)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    }
    val suspects = queries.filter { q =>
      val v = sweepMin(q.name)
      v >= 0 && (v > 2.0 || prevMin.get(q.name).exists(p => p > 0 && v > 1.5 * p))
    }
    val solo = suspects.map { q =>
      val runs = (1 to 3).flatMap { _ =>
        try Some(timed(q)) catch { case _: Throwable => None }
      }
      q.name -> (if (runs.isEmpty) -1.0 else runs.min)
    }.toMap
    solo.foreach { case (n, v) =>
      System.err.println(f"[bench] solo rerun $n: sweep ${sweepMin(n)}%.3f s, solo $v%.3f s")
    }
    val results = queries.map { q =>
      val s = sweepMin(q.name)
      q.name -> (solo.get(q.name).filter(v => v >= 0 && v < s).getOrElse(s))
    }

    def med(xs: Vector[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n == 0) -1.0 else if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    def jnum(v: Double): String = if (v < 0) "-1" else v.toString
    def jmap(m: Seq[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed queries are reported as -1 but excluded from the total
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalR = BigDecimal(total).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val full = jmap(results.map { case (k, v) => k -> jnum(v) })
    // same failed/empty guard as the min: a query that failed partway
    // through the timed loop must not report a real-looking median computed
    // from its pre-failure samples (the artifact would be internally
    // inconsistent with the -1.0 in `queries`)
    val fullMed = jmap(queries.map(q =>
      q.name -> jnum(if (failed(q.name)) -1.0 else med(samples(q.name)))))
    val fullSamples = jmap(queries.map(q =>
      q.name -> samples(q.name).map(_.toString).mkString("[", ",", "]")))
    val fullSolo = jmap(solo.toSeq.sortBy(_._1).map { case (k, v) => k -> jnum(v) })
    val out = sys.env.getOrElse("GRAFT_BENCH_OUT", "bench.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$full,""" +
        s""""queries_med":$fullMed,"queries_samples":$fullSamples,""" +
        s""""queries_solo":$fullSolo,"groups":$groups,"sf":"$sfDir"}""" + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: $e") }
    // stdout: ONE SHORT LINE (totals only). Five rounds of driver capture
    // truncated any line carrying the 125-key map; the map lives in
    // bench.json, which the line names.
    println(
      s"""{"metric":"total","value":$totalR,"unit":"sec","sf":"$sfDir",""" +
        s""""n_queries":${queries.size},"n_failed":${failed.size},""" +
        s""""queries_in":"$out"}""")
    spark.stop()
  }
}
