package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL runner over the fixture tables — the analog of the Hive CLI
  * session in the reference's demo (reference: README.md:46-218).
  *
  * `tools/run_sql.sh <sfDir> "SELECT ..."` — registers every fixture table
  * as a view plus the graft SQL functions, executes, prints rows.
  */
object Sql {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Sql <sfDir> <sql> [maxRows]")
    val (sfDir, sql) = (args(0), args(1))
    val maxRows = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    GraftExtensions.register(spark)
    spark.sql(sql).show(maxRows, truncate = false)
    spark.stop()
  }
}
