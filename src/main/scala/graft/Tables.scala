package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access (TESTDATA.md / FIXTURES.md).
  *
  * The reference binds Hive tables to Kudu storage via TBLPROPERTIES
  * (reference: KuduStorageHandler.java:223-278); here every fixture table is a
  * parquet directory and the Spark planner provides splits, locality and
  * projection/predicate pushdown natively (SURVEY.md S1-S5).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects; read it as a nanos long and truncate to micros — exactly what
    // DuckDB does when it loads the same file (its TIMESTAMP is micros).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every fixture table as a temp view so `spark.sql` queries can
    * name them exactly like the DuckDB oracle does. Lazy — only parquet
    * footers are touched until an action runs.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Guarantee at least the cluster's default parallelism before a CPU-heavy
    * narrow transform. A small fixture table is a single parquet row-group =
    * a single task, which serializes per-row work (md5 shingling, regex)
    * onto one core; a round-robin repartition fixes that. At production
    * scale the scan already yields >= defaultParallelism partitions and this
    * is a no-op — no shuffle is added on the 100-TB path.
    */
  def parallel(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
