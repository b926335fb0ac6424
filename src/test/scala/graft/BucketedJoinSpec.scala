package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the "pre-partition to avoid the shuffle"
  * lever from SURVEY.md §4 / DESIGN.md. Both sides written with bucketBy on
  * the join key: the sort-merge join then reads bucket files directly with
  * NO Exchange on either side — at 100 TB that deletes the dominant cost of
  * a repeated fact-fact join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables runs without any shuffle exchange") {
    // (warehouse dir is a static conf, set to a temp dir in SparkSpec)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(1200)}")
      // and it is still correct
      val expect = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
