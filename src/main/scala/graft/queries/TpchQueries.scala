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

    // Q5: local-supplier volume — the classic 6-way snowflake join. The two
    // dimension chains (customer→nation→region, supplier→nation) are tiny
    // and broadcast; only the orders⋈lineitem edge shuffles. The
    // c_nationkey = s_nationkey theta condition rides the supplier join as
    // an equi-key (both sides expose a nationkey), keeping the whole plan
    // hash-join-able — no nested-loop anywhere.
    QDef("tpch_q5",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
        val ord = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
          .select("o_orderkey", "o_custkey")
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val nat = Tables.load(s, dir, "nation")
        val reg = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
        ord.join(li, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(expr(revenueExpr)).cast("decimal(38,4)").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name, CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS revenue
              |FROM customer
              |JOIN orders   ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |JOIN nation   ON s_nationkey = n_nationkey
              |JOIN region   ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
              |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin)),

    // Q10: returned-item revenue ranking — fact-side filter (l_returnflag)
    // before the join, customer+nation broadcast, top-20 by revenue.
    QDef("tpch_q10",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        val ord = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= "1996-07-01" && col("o_orderdate") < "1996-10-01")
          .select("o_orderkey", "o_custkey")
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        ord.join(li, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"),
            d182(col("c_acctbal")).as("c_acctbal"), col("n_name"))
          .agg(sum(expr(revenueExpr)).cast("decimal(38,4)").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal, n_name,
              |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS revenue
              |FROM customer
              |JOIN orders   ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |JOIN nation   ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
              |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
              |GROUP BY 1, 2, 3, 4
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // Q18: large-volume customers — the "big agg feeding a semi-join"
    // shape. The qualifying-order set comes from a keys-only groupBy over
    // the fact table (map-side combine; threshold tuned to the fixture's
    // 1-7 lines/order so the answer is non-empty), then semi-joins back.
    QDef("tpch_q18",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        val big = li.groupBy("l_orderkey")
          .agg(sum(d182(col("l_quantity"))).as("sum_qty"))
          .filter(col("sum_qty") > 150)
        val ord = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_name")
        ord.join(big, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            d182(col("o_totalprice")).as("o_totalprice"),
            col("sum_qty").cast("decimal(38,4)").as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             |  CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
             |  CAST(sum_qty AS DECIMAL(38,4)) AS sum_qty
             |FROM orders
             |JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
             |      FROM lineitem GROUP BY 1 HAVING sum_qty > 150) big
             |  ON o_orderkey = big.l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),
  )
}
