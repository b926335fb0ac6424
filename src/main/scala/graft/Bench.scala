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

    // One warmup sweep (JIT + codegen cache + page cache), then `passes`
    // full sweeps over the whole query list, per-query median ACROSS sweeps.
    // Round-2 ran one pass per query: a single GC pause branded a
    // code-identical query 3.2x slower. Round-3 ran 3 CONSECUTIVE passes per
    // query: a multi-second transient host disturbance (CPU contention from
    // co-scheduled driver work) covers all 3 back-to-back passes, so the
    // median keeps the inflated number — that is exactly the r3
    // d18_l2_normalize "6x regression": adjacent run positions d3/d4/d5 and
    // d15..d18 were inflated together, and solo reruns plus a full local
    // re-bench reproduce the r1/r2 numbers bit-for-code-identical plans.
    // Pass-major interleaving separates a query's measurements by a whole
    // sweep (~60 s), so any short disturbance lands on different queries in
    // each sweep and the per-query median rejects it.
    val passes = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt).getOrElse(3).max(1)
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
    for (_ <- 1 to passes; q <- queries if !failed(q.name)) {
      try {
        val t0 = System.nanoTime()
        run(q)
        samples(q.name) = ((System.nanoTime() - t0) / 1e9) :: samples(q.name)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          failed += q.name
      }
    }
    val results = queries.map { q =>
      val ts = samples(q.name).sorted
      q.name -> (if (failed(q.name) || ts.isEmpty) -1.0 else ts(ts.length / 2))
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
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BENCH_OUT", "bench.json")),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$full,"sf":"$sfDir"}""" + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: $e") }
    println(line)
    spark.stop()
  }
}
