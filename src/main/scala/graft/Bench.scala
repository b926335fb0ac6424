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

    // One warmup execution (JIT + codegen cache + page cache), then the
    // median of several measured passes — a single GC pause in a long
    // session branded a code-identical query 3.2x slower in round 2's
    // one-pass artifact, so one outlier pass must not decide the number.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val results = SparkEntry.all.map { q =>
      def run(): Unit =
        q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      try {
        run()
        val times = Array.fill(passes) {
          val t0 = System.nanoTime()
          run()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        q.name -> times(times.length / 2)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          q.name -> -1.0
      }
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
