package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and/or wall time for named
  * declared queries. `tools/run_explain.sh <sfDir> [-t] <query>...`
  * (`-t` also executes and times through the noop sink).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val time = args.contains("-t")
    val names = args.drop(1).filterNot(_ == "-t")
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
        // cold + warm (bench methodology: one warmup, then the measured run)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[time] ${q.name}: cold $cold%.2f s, warm ${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
