package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and/or wall time for named
  * declared queries. `tools/run_explain.sh <sfDir> [-t] [-nK] <query>...`
  * (`-t` also executes and times through the noop sink; `-nK` runs K hot
  * iterations after the cold run and reports the min — the same estimator
  * Bench uses, so solo numbers are comparable to bench.json).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val time = args.contains("-t")
    // only a well-formed -n<digits> is a flag; anything else stays a query
    // name (and a bare "-n" gets a usage error, not a NumberFormatException)
    def isRepFlag(a: String) = a.startsWith("-n") && a.length > 2 && a.drop(2).forall(_.isDigit)
    require(!args.contains("-n"), "usage: -n<count>, e.g. -n6")
    val reps = args.find(isRepFlag).map(_.drop(2).toInt).getOrElse(1)
    val names = args.drop(1).filterNot(a => a == "-t" || isRepFlag(a))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val targets = SparkEntry.all.filter(q => names.isEmpty || names.contains(q.name))
    targets.foreach { q =>
      println(s"===== ${q.name} =====")
      val df = q.fn(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (time) {
        // cold + reps hot runs (bench methodology: warmup, then min-of-N)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val cold = (System.nanoTime() - t0) / 1e9
        val hot = (1 to reps).map { _ =>
          val t1 = System.nanoTime()
          q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t1) / 1e9
        }
        println(f"[time] ${q.name}: cold $cold%.2f s, min ${hot.min}%.2f s " +
          s"(samples ${hot.map(v => f"$v%.2f").mkString(",")})")
      }
    }
    spark.stop()
  }
}
