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
    // Timestamp encodings drift across fixture generations: TIMESTAMP_MICROS
    // isAdjustedToUTC=1 (Spark TimestampType), isAdjustedToUTC=0 (Spark
    // TimestampNTZType), and TIMESTAMP(NANOS) (rejected by the vectorized
    // reader unless read as a long). Normalize ALL of them to TimestampType
    // here, at the storage seam — the reference does the same in its type
    // bridge (HiveKuduBridgeUtils.java:134-137,192-196: every timestamp
    // becomes a long at the boundary). The session zone is pinned to UTC in
    // every entry point, so the NTZ->TZ cast is a lossless reinterpretation.
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case TimestampNTZType =>
          df.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if name == "events" && f.name == "ts" =>
          // nanos-as-long legacy branch: truncate to micros, like DuckDB.
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => df
      }
    }
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
