package graft.queries

import graft.{QDef, Tables}
import graft.QDef._
import org.apache.spark.sql.functions._

/** Classic TPC-H query shapes (Q1, Q3, Q6) adapted to the fixture schema
  * (FIXTURES.md lacks a few standard columns — o_shippriority, l_commitdate —
  * so the nearest present column stands in). These are the recognizable
  * headline aggregation/join/filter benchmarks over the fact table; all
  * money math in DECIMAL per the engine's determinism discipline.
  */
object TpchQueries {

  val defs: Seq[QDef] = Seq(

    // Q1: pricing summary report.
    QDef("tpch_q1",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(d182(col("l_quantity"))).cast("decimal(38,4)").as("sum_qty"),
          sum(d182(col("l_extendedprice"))).cast("decimal(38,4)").as("sum_base_price"),
          sum(expr(revenueExpr)).cast("decimal(38,4)").as("sum_disc_price"),
          // natural scale 6 — downscaling would round an exact half-tie
          // differently in the two engines (Spark HALF_UP vs DuckDB truncate)
          sum(expr(s"($revenueExpr) * (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"))
            .cast("decimal(38,6)").as("sum_charge"),
          avg(d182(col("l_quantity"))).cast("decimal(38,4)").as("avg_qty"),
          avg(d182(col("l_extendedprice"))).cast("decimal(38,4)").as("avg_price"),
          avg(d182(col("l_discount"))).cast("decimal(38,4)").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_qty,
              |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_base_price,
              |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS sum_disc_price,
              |  CAST(sum(($revenueExpr) * (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DECIMAL(38,6)) AS sum_charge,
              |  CAST(avg(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS avg_qty,
              |  CAST(avg(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS avg_price,
              |  CAST(avg(CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS avg_disc,
              |  count(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q3: shipping-priority revenue (o_orderpriority stands in for
    // o_shippriority, which the fixture lacks).
    QDef("tpch_q3",
      (s, dir) => Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.load(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < "1997-01-01")
        .join(Tables.load(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > "1997-01-01")
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(expr(revenueExpr)).cast("decimal(38,4)").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10),
      Some(s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
              |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
              |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
              |GROUP BY 1, 2, 3
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // Q6: forecasting revenue change — pure scan+filter+agg.
    QDef("tpch_q6",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24.0)
        .agg(sum(expr(
          "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))"))
          .cast("decimal(38,4)").as("revenue")),
      Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.03 AND 0.07
             |  AND l_quantity < 24.0""".stripMargin)),
  )
}
