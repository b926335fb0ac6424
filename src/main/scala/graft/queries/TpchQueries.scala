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

  /** s23's table: the whole lineitem fact in a bucketed graft table,
    * compacted so the connector's columnar (vectorized) read path serves
    * the scan.
    */
  private val benchTables = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def builtLineitemTable(s: org.apache.spark.sql.SparkSession, dir: String): String =
    benchTables.computeIfAbsent(dir, { _ =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_s23_").toString
      val cat = new graft.catalog.KuduLikeCatalog(s, tmp)
      // the fixture's (l_orderkey, l_linenumber) is NOT unique (the
      // generator repeats line numbers), so ingesting under it would
      // dup-ignore real rows — a deterministic md5 surrogate over the full
      // row is the honest key (rows ARE distinct), the standard move when
      // migrating keyless fact data into a keyed store
      val li = Tables.load(s, dir, "lineitem")
      val keyed = li.withColumn("l_rowid", md5(to_json(struct(li.columns.map(col): _*))))
      cat.createTable(graft.catalog.TableDef("lineitem_g", keyed.schema,
        Seq("l_rowid"), buckets = 8))
      cat.insert("lineitem_g", keyed)
      cat.compact("lineitem_g")
      tmp
    })

  private def q1Body(li: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    li.filter(col("l_shipdate") <= "1998-09-02")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(d182(col("l_quantity"))).cast("decimal(38,4)").as("sum_qty"),
        sum(d182(col("l_extendedprice"))).cast("decimal(38,4)").as("sum_base_price"),
        sum(expr(revenueExpr)).cast("decimal(38,4)").as("sum_disc_price"),
        // sum_charge carries 17 significant digits at sf1 — past double's ~16
        // — so a decimal output would round differently through the two
        // engines' decimal→double output casts (round-10 verdict). Emitted as
        // exact BIGINT cents instead: floor(x*100) is identical in both
        // engines (DuckDB's decimal downcast truncates, Spark's rounds
        // HALF_UP, so a DECIMAL(18,2) output cast would still diverge on
        // >=half-cent residues); the internal sum stays exact DECIMAL(38,6).
        floor(sum(expr(s"($revenueExpr) * (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"))
            .cast("decimal(38,6)") * lit(100))
          .cast("long").as("sum_charge_cents"),
        avg(d182(col("l_quantity"))).cast("decimal(38,4)").as("avg_qty"),
        avg(d182(col("l_extendedprice"))).cast("decimal(38,4)").as("avg_price"),
        avg(d182(col("l_discount"))).cast("decimal(38,4)").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val defs: Seq[QDef] = Seq(

    // The flagship analytic scan THROUGH THE CONNECTOR: TPC-H Q1 over
    // lineitem stored in a bucketed graft table (compacted — the
    // vectorized columnar read path). Same oracle as tpch_q1: the storage
    // round trip plus merge-on-read planning must be invisible to the
    // aggregation. Bench memoizes the table build, so the timed lambda is
    // the columnar scan + aggregation the query is named for — comparing
    // its time to tpch_q1's measures the connector's overhead over a raw
    // parquet scan directly.
    QDef("s23_connector_tpch_q1",
      (s, dir) => {
        val root = builtLineitemTable(s, dir)
        q1Body(s.read.format("graft").option("root", root).load("lineitem_g"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_qty,
              |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_base_price,
              |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS sum_disc_price,
              |  CAST(floor(CAST(sum(($revenueExpr) * (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DECIMAL(38,6)) * 100) AS BIGINT) AS sum_charge_cents,
              |  CAST(avg(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS avg_qty,
              |  CAST(avg(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS avg_price,
              |  CAST(avg(CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS avg_disc,
              |  count(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q1: pricing summary report.
    QDef("tpch_q1",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(d182(col("l_quantity"))).cast("decimal(38,4)").as("sum_qty"),
          sum(d182(col("l_extendedprice"))).cast("decimal(38,4)").as("sum_base_price"),
          sum(expr(revenueExpr)).cast("decimal(38,4)").as("sum_disc_price"),
          // exact BIGINT cents — see q1Body's sum_charge_cents comment
          floor(sum(expr(s"($revenueExpr) * (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"))
              .cast("decimal(38,6)") * lit(100))
            .cast("long").as("sum_charge_cents"),
          avg(d182(col("l_quantity"))).cast("decimal(38,4)").as("avg_qty"),
          avg(d182(col("l_extendedprice"))).cast("decimal(38,4)").as("avg_price"),
          avg(d182(col("l_discount"))).cast("decimal(38,4)").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_qty,
              |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_base_price,
              |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS sum_disc_price,
              |  CAST(floor(CAST(sum(($revenueExpr) * (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DECIMAL(38,6)) * 100) AS BIGINT) AS sum_charge_cents,
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

    // Q4: order-priority checking — the EXISTS shape. The fixture lacks
    // l_commitdate/l_receiptdate, so "late" is l_shipdate > o_orderdate.
    // EXISTS compiles to a left-semi join: the fact side is never duplicated
    // by multi-line orders, and only (orderkey) crosses the shuffle.
    QDef("tpch_q4",
      (s, dir) => {
        val ord = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= "1996-07-01" && col("o_orderdate") < "1996-10-01")
        val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        ord.join(li,
            col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Q8: national market share — two nation roles in one plan (supplier
    // nation for the share, customer nation→region for the scope), every
    // dimension broadcast, one fact-fact shuffle (orders⋈lineitem). The
    // ratio is computed as exact DECIMAL sums cast to DOUBLE at the end, so
    // the division is a single deterministic IEEE op in both engines; the
    // no-supplier-rows year degenerates to 0.0 via coalesce, not NULL.
    QDef("tpch_q8",
      (s, dir) => {
        val nat = Tables.load(s, dir, "nation")
        val custSide = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
          .join(broadcast(nat.select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val suppSide = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
          .join(broadcast(nat.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        val partStd = Tables.load(s, dir, "part")
          .filter(col("p_type") === "STANDARD").select("p_partkey")
        Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
          .select("o_orderkey", "o_custkey", "o_orderdate")
          .join(Tables.load(s, dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(partStd), col("l_partkey") === col("p_partkey"))
          .join(broadcast(custSide), col("o_custkey") === col("c_custkey"), "left_semi")
          .join(broadcast(suppSide), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(
            (coalesce(
              sum(when(col("supp_nation") === "NATION_5", expr(revenueExpr))).cast("double"),
              lit(0.0)) /
              sum(expr(revenueExpr)).cast("double")).as("mkt_share"))
          .orderBy("o_year")
      },
      Some(s"""SELECT year(o_orderdate) AS o_year,
              |  COALESCE(CAST(sum(CASE WHEN n2.n_name = 'NATION_5' THEN $revenueExpr END) AS DOUBLE), 0.0)
              |    / CAST(sum($revenueExpr) AS DOUBLE) AS mkt_share
              |FROM orders
              |JOIN lineitem ON o_orderkey = l_orderkey
              |JOIN part ON l_partkey = p_partkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n2 ON s_nationkey = n2.n_nationkey
              |WHERE p_type = 'STANDARD'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              |  AND o_custkey IN (SELECT c_custkey FROM customer
              |                    JOIN nation n1 ON c_nationkey = n1.n_nationkey
              |                    JOIN region ON n1.n_regionkey = r_regionkey
              |                    WHERE r_name = 'ASIA')
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Q12: shipping-mode priority counts (l_linestatus stands in for the
    // fixture's missing l_shipmode) — join + conditional aggregation; the
    // CASE folds into the partial agg so only (status, two longs) shuffle.
    QDef("tpch_q12",
      (s, dir) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.load(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .join(Tables.load(s, dir, "lineitem")
            .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
            .select("l_orderkey", "l_linestatus"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Q13: customer order-count distribution — LEFT OUTER with a join-side
    // predicate (kept in the ON clause so no-match customers still appear),
    // then a second, tiny aggregation over the counts. The first agg shuffles
    // (custkey, long); the distribution agg is over ≤ a few hundred rows.
    QDef("tpch_q13",
      (s, dir) => {
        val perCust = Tables.load(s, dir, "customer").select("c_custkey")
          .join(Tables.load(s, dir, "orders")
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust.groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer LEFT OUTER JOIN orders
             |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |      GROUP BY 1) counts
             |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // Q14: promo revenue ratio — broadcast part join, conditional DECIMAL
    // sums cast to DOUBLE for one deterministic division.
    QDef("tpch_q14",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-09-01" && col("l_shipdate") < "1996-10-01")
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(broadcast(Tables.load(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          ((coalesce(
            sum(when(col("p_type") === "PROMO", expr(revenueExpr))).cast("double"),
            lit(0.0)) * lit(100.0)) /
            sum(expr(revenueExpr)).cast("double")).as("promo_revenue")),
      Some(s"""SELECT (COALESCE(CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revenueExpr END) AS DOUBLE), 0.0) * 100.0)
              |    / CAST(sum($revenueExpr) AS DOUBLE) AS promo_revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
              |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin)),

    // Q17: small-quantity-order revenue — the correlated-average shape.
    // Scale plan: filter part FIRST (broadcast, ~thousandth of the table),
    // left-semi restrict lineitem to those parts, and only then compute the
    // per-part average over the restricted fact slice — the per-part agg
    // shuffles (partkey, sum, count) for qualifying parts only, never the
    // whole fact table. The threshold (0.2×avg) is assembled in DOUBLE from
    // exact DECIMAL sums so both engines cut the same rows.
    QDef("tpch_q17",
      (s, dir) => {
        val parts = broadcast(Tables.load(s, dir, "part")
          .filter(col("p_brand") === "Brand#23" && col("p_size") < 5)
          .select("p_partkey"))
        val li = Tables.load(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
        val thresholds = li.groupBy(col("l_partkey").as("t_partkey"))
          .agg(((sum(d182(col("l_quantity"))).cast("double") /
            count(lit(1)).cast("double")) * lit(0.2)).as("qty_threshold"))
        li.join(broadcast(thresholds), col("l_partkey") === col("t_partkey"))
          .filter(col("l_quantity") < col("qty_threshold"))
          .agg(coalesce(sum(d182(col("l_extendedprice"))).cast("double") / lit(7.0),
            lit(0.0)).as("avg_yearly"))
      },
      Some("""SELECT COALESCE(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 0.0) AS avg_yearly
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |JOIN (SELECT l_partkey AS t_partkey,
             |        (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |           / CAST(count(*) AS DOUBLE)) * 0.2 AS qty_threshold
             |      FROM lineitem
             |      WHERE l_partkey IN (SELECT p_partkey FROM part
             |                          WHERE p_brand = 'Brand#23' AND p_size < 5)
             |      GROUP BY 1) t ON l_partkey = t_partkey
             |WHERE p_brand = 'Brand#23' AND p_size < 5
             |  AND l_quantity < qty_threshold""".stripMargin)),

    // Q19: discounted revenue under disjunctive brand/size/quantity triples
    // (p_size stands in for the fixture's missing p_container). The brand/
    // size half of each disjunct prunes part BEFORE the broadcast join; the
    // residual OR over (brand, quantity) stays a codegen'd filter.
    QDef("tpch_q19",
      (s, dir) => {
        val p = Tables.load(s, dir, "part").select("p_partkey", "p_brand", "p_size")
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)) ||
              (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)) ||
              (col("p_brand") === "Brand#7" && col("p_size").between(1, 15)))
        Tables.load(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#7" && col("l_quantity").between(20, 30)))
          .agg(coalesce(sum(expr(revenueExpr)).cast("double"), lit(0.0)).as("revenue"))
      },
      Some(s"""SELECT COALESCE(CAST(sum($revenueExpr) AS DOUBLE), 0.0) AS revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
              |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
              |   OR (p_brand = 'Brand#7'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // Q7: volume shipping between two nations — BOTH nation roles filtered
    // to a two-element set before anything joins, so each dimension chain
    // (supplier→n1, customer→n2) broadcasts at a fraction of its table; the
    // symmetric (A,B)/(B,A) disjunction is a residual on the joined pair.
    QDef("tpch_q7",
      (s, dir) => {
        val nat = Tables.load(s, dir, "nation")
          .filter(col("n_name").isin("NATION_3", "NATION_7"))
        val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
          .join(broadcast(nat.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
          .join(broadcast(nat.select(col("n_nationkey").as("n2k"), col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("n2k"))
          .select("c_custkey", "cust_nation")
        Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
          .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .filter(
            (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
              (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("bigint").as("l_year"))
          .agg(sum(expr(revenueExpr)).cast("decimal(38,4)").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  year(l_shipdate) AS l_year,
              |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS revenue
              |FROM supplier
              |JOIN lineitem ON s_suppkey = l_suppkey
              |JOIN orders ON o_orderkey = l_orderkey
              |JOIN customer ON c_custkey = o_custkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
              |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // Q15: top supplier by period revenue — the argmax-via-scalar shape.
    // The per-supplier aggregate is computed ONCE and reused for both the
    // max (1-row broadcast) and the equality probe; ties all surface
    // (ORDER BY makes that deterministic). Exact DECIMAL revenue makes the
    // max-equality well-defined — an argmax on floats would be engine-
    // dependent at ties.
    QDef("tpch_q15",
      (s, dir) => {
        val rev = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
          .groupBy(col("l_suppkey"))
          .agg(sum(expr(revenueExpr)).as("total_revenue"))
        val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
        Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
          .join(rev, col("s_suppkey") === col("l_suppkey"))
          .crossJoin(broadcast(top))
          .filter(col("total_revenue") === col("max_revenue"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_revenue").cast("decimal(38,4)").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey AS supplier_no, sum($revenueExpr) AS total_revenue
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
              |  GROUP BY 1)
              |SELECT s_suppkey, s_name, CAST(total_revenue AS DECIMAL(38,4)) AS total_revenue
              |FROM supplier JOIN rev ON s_suppkey = supplier_no
              |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
              |ORDER BY s_suppkey""".stripMargin)),

    // Q22: dormant high-balance customers (every fixture customer has
    // orders, so "no orders at all" would be vacuous — the anti-join is
    // against RECENT orders instead; c_nationkey stands in for the missing
    // phone country code). Global average rides in as a broadcast 1-row
    // cross join — no driver-side collect; the anti join shuffles only
    // (custkey) after the date filter prunes the orders side.
    QDef("tpch_q22",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val avgBal = cust.filter(col("c_acctbal") > 0.0)
          .agg((sum(d182(col("c_acctbal"))).cast("double") /
            count(lit(1)).cast("double")).as("avg_bal"))
        val recent = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= "2000-01-01").select("o_custkey")
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").as("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            sum(d182(col("c_acctbal"))).cast("double").as("totacctbal"))
          .orderBy("cntrycode")
      },
      Some("""SELECT c_nationkey AS cntrycode, count(*) AS numcust,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             |                          / CAST(count(*) AS DOUBLE)
             |                   FROM customer WHERE c_acctbal > 0.0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Q2: minimum-cost supplier — the correlated-min shape. The fixture has
    // no partsupp; the part-supplier catalog is DERIVED from lineitem as
    // min(l_extendedprice) per (part, supplier) — a keys-only groupBy with
    // map-side combine. Qualifying parts are filtered FIRST and broadcast,
    // so the per-part min is computed only over qualifying parts' European
    // suppliers; the min-equality probe is on exact DECIMAL (float argmax
    // would be engine-dependent at ties).
    QDef("tpch_q2",
      (s, dir) => {
        val esupp = Tables.load(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"),
            d182(col("s_acctbal")).as("s_acctbal"), col("n_name"))
        val qualParts = broadcast(Tables.load(s, dir, "part")
          .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
          .select("p_partkey", "p_type"))
        // ONE pass over lineitem (the 100-TB side): the broadcast part
        // filter lands BELOW the aggregation, so the shuffle carries only
        // qualified-part rows, and the per-part minimum is a window over
        // the already-tiny qualified set instead of a groupBy + self-join
        // (which scanned and aggregated lineitem twice and sort-merge
        // self-joined the results — 2.4x slower on the regenerated
        // fixtures). Per-part min is unchanged by the pushdown: both the
        // part filter and the window partition key are l_partkey.
        val ps = Tables.load(s, dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice")
          .join(qualParts, col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"), col("p_partkey"), col("p_type"))
          .agg(min(d182(col("l_extendedprice"))).as("cost"))
        val ecost = ps.join(broadcast(esupp), col("l_suppkey") === col("s_suppkey"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
        ecost.withColumn("min_cost", min(col("cost")).over(w))
          .filter(col("cost") === col("min_cost"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_type"),
            col("cost").cast("decimal(38,4)").as("supplycost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
             |  FROM lineitem GROUP BY 1, 2),
             |esupp AS (
             |  SELECT s_suppkey, s_name, CAST(s_acctbal AS DECIMAL(18,2)) AS s_acctbal, n_name
             |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
             |ecost AS (SELECT ps.partkey, ps.suppkey, ps.cost
             |          FROM ps JOIN esupp ON ps.suppkey = s_suppkey),
             |mincost AS (SELECT partkey, min(cost) AS min_cost FROM ecost GROUP BY 1)
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
             |       CAST(e.cost AS DECIMAL(38,4)) AS supplycost
             |FROM ecost e JOIN mincost m ON e.partkey = m.partkey AND e.cost = m.min_cost
             |JOIN esupp ON e.suppkey = esupp.s_suppkey
             |JOIN part ON p_partkey = e.partkey
             |WHERE p_size = 15 AND p_type = 'STANDARD'
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin)),

    // Q9: product-type profit by nation and year. ps_supplycost (no partsupp
    // in the fixture) stands in as p_retailprice × quantity, all DECIMAL so
    // the profit term is exact in both engines. Part (name-filtered) and the
    // supplier→nation chain broadcast; the single shuffle is orders⋈lineitem.
    QDef("tpch_q9",
      (s, dir) => {
        val redParts = broadcast(Tables.load(s, dir, "part")
          .filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice"))
        val suppNat = broadcast(Tables.load(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "n_name"))
        Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount")
          .join(redParts, col("l_partkey") === col("p_partkey"))
          .join(suppNat, col("l_suppkey") === col("s_suppkey"))
          .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(sum(expr(s"$revenueExpr - " +
            "CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))"))
            .cast("decimal(38,4)").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""SELECT nation, o_year, CAST(sum(amount) AS DECIMAL(38,4)) AS sum_profit FROM (
              |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
              |    $revenueExpr
              |      - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS amount
              |  FROM lineitem
              |  JOIN orders ON o_orderkey = l_orderkey
              |  JOIN part ON p_partkey = l_partkey
              |  JOIN supplier ON s_suppkey = l_suppkey
              |  JOIN nation ON n_nationkey = s_nationkey
              |  WHERE p_name LIKE '%red%') t
              |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)),

    // Q11: important stock — per-part value vs a fraction of the global
    // total. Inventory value (no partsupp) is Σ extendedprice × quantity of
    // the target nation's suppliers' lineitems. The nation's supplier keys
    // broadcast as a semi-join; the global total rides back in as a 1-row
    // broadcast (no collect). The fraction compare crosses to DOUBLE from
    // identical exact decimal sums, so both engines cut the same parts.
    QDef("tpch_q11",
      (s, dir) => {
        val natSupp = broadcast(Tables.load(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")
          .join(broadcast(Tables.load(s, dir, "nation").filter(col("n_name") === "NATION_9")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey"))
        val value = Tables.load(s, dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
          .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy(col("l_partkey").as("ps_partkey"))
          .agg(sum(expr(
            "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))"))
            .as("value"))
        val total = value.agg(sum(col("value")).cast("double").as("total"))
        value.crossJoin(broadcast(total))
          .filter(col("value").cast("double") > col("total") * 0.001)
          .select(col("ps_partkey"), col("value").cast("decimal(38,4)").as("value"))
          .orderBy(col("value").desc, col("ps_partkey"))
      },
      Some("""WITH val AS (
             |  SELECT l_partkey AS ps_partkey,
             |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS value
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  WHERE n_name = 'NATION_9' GROUP BY 1)
             |SELECT ps_partkey, CAST(value AS DECIMAL(38,4)) AS value FROM val
             |WHERE CAST(value AS DOUBLE) > (SELECT CAST(sum(value) AS DOUBLE) * 0.001 FROM val)
             |ORDER BY value DESC, ps_partkey""".stripMargin)),

    // Q16: supplier relationship — distinct suppliers per part attribute
    // triple, minus complaint suppliers (s_acctbal < 0 stands in for the
    // fixture's missing s_comment). The part-supplier pairs are a keys-only
    // DISTINCT over the fact table; part and the excluded-supplier set both
    // broadcast (the NOT IN is an anti join — key columns are non-null, so
    // the semantics coincide).
    QDef("tpch_q16",
      (s, dir) => {
        val ps = Tables.load(s, dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct()
        val parts = broadcast(Tables.load(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#23" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size"))
        val excluded = broadcast(Tables.load(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey"))
        ps.join(parts, col("l_partkey") === col("p_partkey"))
          .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
             |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // Q20: potential part promotion — suppliers who DOMINATE shipments of a
    // name-class of parts in a year window (> half a part's shipped quantity;
    // the fixture has no ps_availqty, so dominance replaces the stock-excess
    // test — same nested correlated-aggregate shape). The per-part total
    // comes from a window over the already-aggregated (part, supplier) frame
    // — one keys-only shuffle, no second scan, no join. The dominant-supplier
    // set semi-joins into the nation-filtered supplier dimension.
    QDef("tpch_q20",
      (s, dir) => {
        val smallParts = broadcast(Tables.load(s, dir, "part")
          .filter(col("p_name").like("small%")).select("p_partkey"))
        val qty = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
          .select("l_partkey", "l_suppkey", "l_quantity")
          .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_partkey", "l_suppkey")
          .agg(sum(d182(col("l_quantity"))).as("sq"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
        val dominant = qty
          .withColumn("tq", sum(col("sq")).over(w))
          .filter(col("sq").cast("double") > col("tq").cast("double") * 0.5)
          .select("l_suppkey").distinct()
        Tables.load(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
          .join(broadcast(Tables.load(s, dir, "nation")
            .filter(col("n_name").isin("NATION_6", "NATION_9", "NATION_11"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_name", "n_name")
          .orderBy("s_name")
      },
      Some("""WITH qty AS (
             |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
             |  GROUP BY 1, 2),
             |tot AS (SELECT l_partkey AS tp, sum(sq) AS tq FROM qty GROUP BY 1)
             |SELECT s_name, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE s_suppkey IN (SELECT l_suppkey FROM qty JOIN tot ON l_partkey = tp
             |                    WHERE CAST(sq AS DOUBLE) > CAST(tq AS DOUBLE) * 0.5)
             |  AND n_name IN ('NATION_6', 'NATION_9', 'NATION_11')
             |ORDER BY s_name""".stripMargin)),

    // Q21: suppliers who kept orders waiting — the hardest semi-join shape
    // in the suite: EXISTS + NOT EXISTS against the SAME fact. "Late" is
    // l_shipdate > o_orderdate (the fixture lacks commit/receipt dates, as
    // in Q4). A supplier is counted per late line in a finished order where
    // ANOTHER supplier shares the order (EXISTS → left-semi with a
    // same-order/different-supplier residual) but NO other supplier was late
    // on it (NOT EXISTS → left-anti on the same late-lines frame). Only
    // (orderkey, suppkey) pairs cross any shuffle; the supplier dimension
    // broadcasts.
    QDef("tpch_q21",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
        val late = li
          .join(Tables.load(s, dir, "orders")
            .filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate"))
          .select("l_orderkey", "l_suppkey")
        val suppNat = broadcast(Tables.load(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey")
          .join(broadcast(Tables.load(s, dir, "nation").filter(col("n_name") === "NATION_9")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name"))
        late.join(suppNat, col("l_suppkey") === col("s_suppkey"))
          .join(li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2")),
            col("l_orderkey") === col("k2") && col("s2") =!= col("l_suppkey"), "left_semi")
          .join(late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3")),
            col("l_orderkey") === col("k3") && col("s3") =!= col("l_suppkey"), "left_anti")
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""WITH l1 AS (
             |  SELECT l_orderkey, l_suppkey FROM lineitem
             |  JOIN orders ON o_orderkey = l_orderkey
             |  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate)
             |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
             |FROM l1
             |JOIN supplier ON s_suppkey = l1.l_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name = 'NATION_9'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM l1 l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey)
             |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)),
  )
}
