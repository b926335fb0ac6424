package graft

import org.apache.spark.sql.SparkSession

/** Driver-style smoke: calls SparkEntry.entry the way the harness does and
  * prints the row count (driver checks rows > 0). `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRY_ROWS=${rows.length}")
    rows.foreach(r => println(s"  $r"))
    spark.stop()
  }
}
