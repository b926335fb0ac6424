package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: profile ONE declared query by name — build/plan/execute split,
  * N hot repeats — so bench regressions can be decomposed without a full
  * sweep. Usage: runMain graft.Profile <queryName> [repeats].
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: Profile <queryName> [repeats]"))
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.all.find(_.name == name).getOrElse(
      sys.error(s"no query named $name"))
    val fn = q.benchFn.getOrElse(q.fn)
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (i <- 1 to repeats) {
      val df = t(s"run$i build")(fn(spark, sfDir))
      t(s"run$i plan")(df.queryExecution.executedPlan)
      t(s"run$i exec")(df.write.mode("overwrite").format("noop").save())
    }
    val df = fn(spark, sfDir)
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
