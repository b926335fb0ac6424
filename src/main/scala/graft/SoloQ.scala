package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: solo-time named queries outside the bench sweep (4 hot runs
  * each, optional EXPLAIN=1 for the formatted plan). Solo timing is the
  * ground truth when a sweep sample looks disturbed — the bench's own
  * solo-rerun pass automates the same idea; this main is the interactive
  * loop. Usage: java -cp &lt;spark jars + target classes&gt; graft.SoloQ q1 q2
  * (add-opens flags as in tools/run_verify.sh; SPARK_GRAFT_SF_DIR picks
  * the fixture scale.)
  */
object SoloQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = args.toSeq
    val qs = SparkEntry.all.filter(q => names.contains(q.name))
    val unknown = names.filterNot(qs.map(_.name).contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    qs.foreach { q =>
      val fn = q.benchFn.getOrElse(q.fn)
      try {
        for (i <- 1 to 4) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          println(f"${q.name} run$i: ${(System.nanoTime()-t0)/1e9}%.3f s")
        }
        if (sys.env.contains("EXPLAIN")) fn(spark, sfDir).explain("formatted")
      } catch {
        // one broken query must not void the whole batch's timings (the
        // retime/ratchet harnesses parse per-line results)
        case e: Exception =>
          println(s"${q.name} FAILED: ${e.toString.linesIterator.next()}")
      }
    }
  }
}
