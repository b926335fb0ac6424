package graft.queries

import graft.{QDef, Tables}
import graft.QDef._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS-derived query shapes (round-15 verdict item 6): the decision-
  * support patterns TPC-H lacks — GROUPING-SETS rollups with rank-within-
  * grouping-level (q36/q70/q86), top-N per category over a partial rollup
  * (q67), cumulative full-outer crossover (q51), dual-ranked ratio reports
  * (q49), cross-channel set intersection (q14), multi-channel union
  * rollups (q5), and correlated EXISTS chains (q35/q10) — adapted to the
  * fixture star schema. Determinism discipline as everywhere: DECIMAL
  * money math, ratios as double division of exact decimals (one IEEE op —
  * identical in both engines), grouping flags ordered explicitly so NULL
  * rollup rows never depend on dialect NULL placement.
  */
object TpcdsQueries {

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tables.load(s, dir, "orders")

  /** Rollup-with-rank core shared by the q70s/q86s faces: total per
    * (r_name, n_name) ROLLUP level, ranked within its grouping level and
    * parent — TPC-DS's `rank() over (partition by lochierarchy, CASE WHEN
    * grouping(county)=1 THEN state END ...)`.
    */
  private def hierarchyRank(joined: DataFrame, valueCol: org.apache.spark.sql.Column,
      measureName: String): DataFrame = {
    // Pre-aggregate per (r_name, n_name) BEFORE the rollup (optimization
    // guide §2.3 "aggregate before you shuffle"): Expand multiplies its
    // input 3x, so rolling up the raw fact rows pushed 3x the fact table
    // through the decimal hash aggregate. DECIMAL sums are exact and
    // associative — sum-of-group-sums is bit-identical to the direct
    // rollup — so Expand now runs over |regions x nations| pre-aggregated
    // rows instead of the fact table.
    val base = joined.groupBy(col("r_name"), col("n_name"))
      .agg(sum(graft.QDef.d182(valueCol)).as("__m"))
    val g = base.rollup(col("r_name"), col("n_name"))
      .agg(
        sum(col("__m")).cast("decimal(38,2)").as(measureName),
        grouping(col("r_name")).cast("int").as("g_r"),
        grouping(col("n_name")).cast("int").as("g_n"))
      .withColumn("lochierarchy", col("g_r") + col("g_n"))
    val w = Window
      .partitionBy(col("lochierarchy"),
        when(col("g_n") === 1, lit("(all)"))
          .otherwise(coalesce(col("r_name"), lit("(all)"))))
      .orderBy(col(measureName).desc)
    g.withColumn("rnk", rank().over(w))
      .select(
        col("lochierarchy"),
        coalesce(col("r_name"), lit("(all)")).as("region"),
        coalesce(col("n_name"), lit("(all)")).as("nation"),
        col(measureName), col("rnk"))
      .orderBy(col("lochierarchy").desc, col("region"), col("rnk"), col("nation"))
  }

  private def hierarchyRankSql(fromSql: String, measureSql: String,
      measureName: String): String =
    s"""SELECT lochierarchy, region, nation, $measureName, rnk FROM (
       |  SELECT
       |    CAST(grouping(r_name) + grouping(n_name) AS INTEGER) AS lochierarchy,
       |    coalesce(r_name, '(all)') AS region,
       |    coalesce(n_name, '(all)') AS nation,
       |    $measureSql AS $measureName,
       |    rank() OVER (
       |      PARTITION BY grouping(r_name) + grouping(n_name),
       |        CASE WHEN grouping(n_name) = 1 THEN '(all)'
       |             ELSE coalesce(r_name, '(all)') END
       |      ORDER BY $measureSql DESC) AS rnk
       |  FROM $fromSql
       |  GROUP BY ROLLUP(r_name, n_name)) t
       |ORDER BY lochierarchy DESC, region, rnk, nation""".stripMargin

  def defs: Seq[QDef] = Seq(

    // q5 style: multi-channel union, rolled up over (channel, nation).
    // Channels are derived views of the same facts unioned BEFORE the
    // rollup — the cross-channel report shape. One shuffle for the union'd
    // aggregate; dimensions broadcast.
    QDef("tpcds_q5s_channel_rollup",
      (s, dir) => {
        val o = ord(s, dir).withColumn("channel",
          when(col("o_orderstatus") === "F", "store")
            .when(col("o_orderstatus") === "O", "web")
            .otherwise("catalog"))
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        val j = o.join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
        // pre-aggregate per (channel, nation) before the rollup's Expand —
        // sum-of-sums / sum-of-counts are exact (hierarchyRank scaladoc)
        j.groupBy(col("channel"), col("n_name"))
          .agg(sum(d182(col("o_totalprice"))).as("__s"),
            count(lit(1)).as("__n"))
          .rollup(col("channel"), col("n_name"))
          .agg(
            sum(col("__s")).cast("decimal(38,2)").as("sales"),
            sum(col("__n")).as("n_orders"),
            grouping(col("channel")).cast("int").as("g_c"),
            grouping(col("n_name")).cast("int").as("g_n"))
          .select(
            coalesce(col("channel"), lit("(all)")).as("channel"),
            coalesce(col("n_name"), lit("(all)")).as("nation"),
            col("g_c"), col("g_n"), col("sales"), col("n_orders"))
          .orderBy("g_c", "g_n", "channel", "nation")
      },
      Some("""SELECT coalesce(channel, '(all)') AS channel,
             |  coalesce(n_name, '(all)') AS nation,
             |  CAST(grouping(channel) AS INTEGER) AS g_c,
             |  CAST(grouping(n_name) AS INTEGER) AS g_n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sales,
             |  count(*) AS n_orders
             |FROM (SELECT o.*, n.n_name,
             |        CASE WHEN o_orderstatus = 'F' THEN 'store'
             |             WHEN o_orderstatus = 'O' THEN 'web'
             |             ELSE 'catalog' END AS channel
             |      FROM orders o
             |      JOIN customer c ON o_custkey = c_custkey
             |      JOIN nation n ON c_nationkey = n_nationkey) t
             |GROUP BY ROLLUP(channel, n_name)
             |ORDER BY g_c, g_n, channel, nation""".stripMargin)),

    // q14 style: cross-channel item intersection — parts that move in BOTH
    // the deep-discount and the premium-tax channel, then revenue over
    // exactly that intersection. INTERSECT is the set seam; the follow-up
    // aggregate joins back through it (a semi-join at plan level).
    QDef("tpcds_q14s_cross_channel_intersect",
      (s, dir) => {
        val l = li(s, dir)
        // INTERSECT of two filtered projections of the SAME fact table =
        // one flag aggregation over one scan: a part is in both channels
        // iff some row clears each filter. Replaces two filtered scans +
        // two distinct exchanges + a join with one scan + one partial-
        // aggregated exchange (round-16, guide §2.3/§2.4) — identical set.
        val both = l
          .groupBy(col("l_partkey"))
          .agg(max(when(col("l_discount") > 0.06, 1).otherwise(0)).as("__d"),
            max(when(col("l_tax") > 0.05, 1).otherwise(0)).as("__t"))
          .filter(col("__d") === 1 && col("__t") === 1)
          .select(col("l_partkey"))
        val p = Tables.load(s, dir, "part")
        l.join(both, Seq("l_partkey"), "left_semi")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(expr(revenueExpr)).cast("decimal(38,4)").as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy("p_brand")
      },
      Some(s"""SELECT p_brand,
              |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS revenue,
              |  count(*) AS n_lines
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE l_partkey IN (
              |  SELECT l_partkey FROM lineitem WHERE l_discount > 0.06
              |  INTERSECT
              |  SELECT l_partkey FROM lineitem WHERE l_tax > 0.05)
              |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // q36 style: gross-margin rollup over the part hierarchy, ranked
    // WITHIN each grouping level and parent. The margin is double division
    // of two exact DECIMAL sums — one IEEE op, bit-identical cross-engine;
    // ranks are computed on the raw double, display rounds to 4 decimals.
    QDef("tpcds_q36s_margin_rollup_rank",
      (s, dir) => {
        val p = Tables.load(s, dir, "part")
        val j = li(s, dir).join(p, col("l_partkey") === col("p_partkey"))
        // pre-aggregate per (p_type, p_brand) before the rollup's Expand:
        // the decimal revenue product and both sums run once per fact row
        // instead of once per expanded copy, and Expand multiplies a
        // |types x brands| frame, not the fact table (exact: decimal
        // sum-of-sums — hierarchyRank scaladoc)
        val g = j.groupBy(col("p_type"), col("p_brand"))
          .agg(sum(expr(revenueExpr)).as("__r"),
            sum(d182(col("l_quantity"))).as("__q"))
          .rollup(col("p_type"), col("p_brand"))
          .agg(
            sum(col("__r")).cast("decimal(38,4)").as("disc_price"),
            sum(col("__q")).cast("decimal(38,2)").as("qty"),
            grouping(col("p_type")).cast("int").as("g_t"),
            grouping(col("p_brand")).cast("int").as("g_b"))
          .withColumn("lochierarchy", col("g_t") + col("g_b"))
          .withColumn("margin",
            col("disc_price").cast("double") / col("qty").cast("double"))
        val w = Window
          .partitionBy(col("lochierarchy"),
            when(col("g_b") === 1, lit("(all)"))
              .otherwise(coalesce(col("p_type"), lit("(all)"))))
          .orderBy(col("margin").asc)
        g.withColumn("rnk", rank().over(w))
          .select(col("lochierarchy"),
            coalesce(col("p_type"), lit("(all)")).as("p_type"),
            coalesce(col("p_brand"), lit("(all)")).as("p_brand"),
            dec4(col("margin")).as("margin"), col("rnk"))
          .orderBy(col("lochierarchy").desc, col("p_type"), col("rnk"),
            col("p_brand"))
      },
      Some(s"""SELECT lochierarchy, p_type, p_brand, CAST(margin AS DECIMAL(38,4)) AS margin, rnk FROM (
              |  SELECT CAST(grouping(p_type) + grouping(p_brand) AS INTEGER) AS lochierarchy,
              |    coalesce(p_type, '(all)') AS p_type,
              |    coalesce(p_brand, '(all)') AS p_brand,
              |    CAST(CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS DOUBLE)
              |      / CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS margin,
              |    rank() OVER (
              |      PARTITION BY grouping(p_type) + grouping(p_brand),
              |        CASE WHEN grouping(p_brand) = 1 THEN '(all)'
              |             ELSE coalesce(p_type, '(all)') END
              |      ORDER BY CAST(CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS DOUBLE)
              |        / CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) ASC) AS rnk
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  GROUP BY ROLLUP(p_type, p_brand)) t
              |ORDER BY lochierarchy DESC, p_type, rnk, p_brand""".stripMargin)),

    // q49 style: the "worst performers by two orderings" report — per
    // brand, the returned-quantity ratio AND the returned-revenue ratio,
    // each ranked; a brand surfaces if it is in the bottom 10 of EITHER
    // ranking. Ratios are double division of exact decimals.
    QDef("tpcds_q49s_return_ratio_ranks",
      (s, dir) => {
        val p = Tables.load(s, dir, "part")
        val g = li(s, dir).join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            sum(when(col("l_returnflag") === "R", d182(col("l_quantity")))
              .otherwise(lit(0).cast("decimal(18,2)")))
              .cast("decimal(38,2)").as("ret_qty"),
            sum(d182(col("l_quantity"))).cast("decimal(38,2)").as("qty"),
            sum(when(col("l_returnflag") === "R", expr(revenueExpr))
              .otherwise(expr(s"CAST(0 AS DECIMAL(12,2)) * CAST(0 AS DECIMAL(3,2))")))
              .cast("decimal(38,4)").as("ret_amt"),
            sum(expr(revenueExpr)).cast("decimal(38,4)").as("amt"))
          .withColumn("qty_ratio",
            col("ret_qty").cast("double") / col("qty").cast("double"))
          .withColumn("amt_ratio",
            col("ret_amt").cast("double") / col("amt").cast("double"))
        // both rankings are global but the order is STRICT (p_brand is
        // unique after the groupBy), so rank() == row_number() and the
        // shared DistributedRank recipe applies — no unpartitioned
        // WindowExec; the frame is #brands rows, but the shape must not
        // teach the next author the single-task form
        val r1 = graft.operators.DistributedRank.withRank(g,
          Seq(col("qty_ratio").desc, col("p_brand").asc), "rnk_qty")
        graft.operators.DistributedRank.withRank(r1,
            Seq(col("amt_ratio").desc, col("p_brand").asc), "rnk_amt")
          .withColumn("rnk_qty", col("rnk_qty").cast("int"))
          .withColumn("rnk_amt", col("rnk_amt").cast("int"))
          .filter(col("rnk_qty") <= 10 || col("rnk_amt") <= 10)
          .select(col("p_brand"), dec4(col("qty_ratio")).as("qty_ratio"),
            dec4(col("amt_ratio")).as("amt_ratio"),
            col("rnk_qty"), col("rnk_amt"))
          .orderBy("p_brand")
      },
      Some(s"""SELECT p_brand, CAST(qty_ratio AS DECIMAL(38,4)) AS qty_ratio,
              |  CAST(amt_ratio AS DECIMAL(38,4)) AS amt_ratio, rnk_qty, rnk_amt
              |FROM (
              |  SELECT p_brand, qty_ratio, amt_ratio,
              |    rank() OVER (ORDER BY qty_ratio DESC, p_brand ASC) AS rnk_qty,
              |    rank() OVER (ORDER BY amt_ratio DESC, p_brand ASC) AS rnk_amt
              |  FROM (
              |    SELECT p_brand,
              |      CAST(CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS DOUBLE)
              |        / CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS qty_ratio,
              |      CAST(CAST(sum(CASE WHEN l_returnflag = 'R' THEN $revenueExpr ELSE CAST(0 AS DECIMAL(12,2)) * CAST(0 AS DECIMAL(3,2)) END) AS DECIMAL(38,4)) AS DOUBLE)
              |        / CAST(CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS DOUBLE) AS amt_ratio
              |    FROM lineitem JOIN part ON l_partkey = p_partkey
              |    GROUP BY p_brand) r) t
              |WHERE rnk_qty <= 10 OR rnk_amt <= 10
              |ORDER BY p_brand""".stripMargin)),

    // q51 style: two cumulative series full-outer-joined on their common
    // axis, keeping the crossover region (running clicks ahead of running
    // purchases). The corpus-sized work is the per-(series, day) count;
    // the cumulative windows run on #days rows per series.
    QDef("tpcds_q51s_cumulative_crossover",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .withColumn("day", to_date(col("ts")))
        val daily = e.groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n"))
        val cum = daily.withColumn("cum", sum(col("n")).over(
          Window.partitionBy(col("event_type")).orderBy(col("day"))))
        val c = cum.filter(col("event_type") === "click")
          .select(col("day"), col("cum").as("cum_clicks"))
        val p = cum.filter(col("event_type") === "purchase")
          .select(col("day"), col("cum").as("cum_purchases"))
        c.join(p, Seq("day"), "full_outer")
          .filter(coalesce(col("cum_clicks"), lit(0L)) >
            coalesce(col("cum_purchases"), lit(0L)))
          .select(col("day"),
            coalesce(col("cum_clicks"), lit(0L)).as("cum_clicks"),
            coalesce(col("cum_purchases"), lit(0L)).as("cum_purchases"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
             |  FROM events WHERE event_type IN ('click', 'purchase')
             |  GROUP BY 1, 2),
             |cum AS (
             |  SELECT event_type, day,
             |    sum(n) OVER (PARTITION BY event_type ORDER BY day) AS cum
             |  FROM daily),
             |c AS (SELECT day, cum AS cum_clicks FROM cum WHERE event_type = 'click'),
             |p AS (SELECT day, cum AS cum_purchases FROM cum WHERE event_type = 'purchase')
             |SELECT coalesce(c.day, p.day) AS day,
             |  coalesce(cum_clicks, 0) AS cum_clicks,
             |  coalesce(cum_purchases, 0) AS cum_purchases
             |FROM c FULL OUTER JOIN p ON c.day = p.day
             |WHERE coalesce(cum_clicks, 0) > coalesce(cum_purchases, 0)
             |ORDER BY day""".stripMargin)),

    // q67 style: top-3 months per part type over a PARTIAL rollup — the
    // (type, month) detail rows and the (type) all-months row compete in
    // one ranking, exactly the q67 "which slice of the rollup leads each
    // category" shape. GROUPING SETS, not full ROLLUP: the grand total
    // never competes.
    QDef("tpcds_q67s_topn_per_category",
      (s, dir) => {
        val p = Tables.load(s, dir, "part")
        val j = li(s, dir).join(p, col("l_partkey") === col("p_partkey"))
          .withColumn("m", month(col("l_shipdate")))
        // pre-aggregate per (p_type, m) before the grouping-sets Expand —
        // decimal sum-of-sums is exact (hierarchyRank scaladoc)
        val g = j
          .groupBy(col("p_type"), col("m"))
          .agg(sum(d182(col("l_quantity"))).as("__q"))
          .groupingSets(Seq(Seq(col("p_type"), col("m")), Seq(col("p_type"))),
            col("p_type"), col("m"))
          .agg(sum(col("__q")).cast("decimal(38,2)").as("qty"),
            grouping(col("m")).cast("int").as("g_m"))
        val w = Window.partitionBy(col("p_type"))
          .orderBy(col("qty").desc, col("g_m").asc, col("m").asc_nulls_first)
        g.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("p_type"), coalesce(col("m"), lit(0)).as("m"),
            col("g_m"), col("qty"), col("rn"))
          .orderBy("p_type", "rn")
      },
      Some("""SELECT p_type, coalesce(m, 0) AS m, g_m, qty, rn FROM (
             |  SELECT p_type, m, CAST(grouping(m) AS INTEGER) AS g_m,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty,
             |    row_number() OVER (PARTITION BY p_type
             |      ORDER BY CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) DESC,
             |        CAST(grouping(m) AS INTEGER) ASC, m ASC NULLS FIRST) AS rn
             |  FROM (SELECT p_type, month(l_shipdate) AS m, l_quantity
             |        FROM lineitem JOIN part ON l_partkey = p_partkey) t
             |  GROUP BY GROUPING SETS ((p_type, m), (p_type))) r
             |WHERE rn <= 3 ORDER BY p_type, rn""".stripMargin)),

    // q70 style: rank-within-grouping-level over the supplier geography
    // rollup (who leads each region; which regions lead the world).
    QDef("tpcds_q70s_supplier_hierarchy_rank",
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region")
        val j = sup.join(n, col("s_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
        hierarchyRank(j, col("s_acctbal"), "total_bal")
      },
      Some(hierarchyRankSql(
        """supplier JOIN nation ON s_nationkey = n_nationkey
          |        JOIN region ON n_regionkey = r_regionkey""".stripMargin,
        "CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2))",
        "total_bal"))),

    // q86 style: the same lochierarchy rank over the ORDER fact routed
    // through the customer geography — the revenue-side twin of q70s.
    QDef("tpcds_q86s_revenue_hierarchy_rank",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region")
        val j = ord(s, dir).join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
        hierarchyRank(j, col("o_totalprice"), "revenue")
      },
      Some(hierarchyRankSql(
        """orders JOIN customer ON o_custkey = c_custkey
          |        JOIN nation ON c_nationkey = n_nationkey
          |        JOIN region ON n_regionkey = r_regionkey""".stripMargin,
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))",
        "revenue"))),

    // q35/q10 style: correlated EXISTS chain — customers active in the
    // window (EXISTS), with a returned line among their orders (EXISTS
    // through two levels), and no jumbo order (NOT EXISTS) — reported by
    // geography and segment. Plans as two semi-joins and an anti-join;
    // every probe side is key-distinct before the join.
    QDef("tpcds_q35s_exists_chain",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = ord(s, dir)
        val n = Tables.load(s, dir, "nation")
        val active = o.filter(col("o_orderdate") >= "1997-01-01" &&
          col("o_orderdate") < "1999-01-01").select(col("o_custkey"))
        val returned = o.join(
          li(s, dir).filter(col("l_returnflag") === "R").select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_custkey"))
        val jumbo = o.filter(col("o_totalprice") > 400000.0).select(col("o_custkey"))
        c.join(active, col("c_custkey") === active("o_custkey"), "left_semi")
          .join(returned, col("c_custkey") === returned("o_custkey"), "left_semi")
          .join(jumbo, col("c_custkey") === jumbo("o_custkey"), "left_anti")
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"),
            sum(d182(col("c_acctbal"))).cast("decimal(38,2)").as("total_bal"))
          .orderBy("n_name", "c_mktsegment")
      },
      Some("""SELECT n_name, c_mktsegment, count(*) AS n_cust,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_bal
             |FROM customer c JOIN nation n ON c_nationkey = n_nationkey
             |WHERE EXISTS (SELECT 1 FROM orders o
             |    WHERE o.o_custkey = c.c_custkey
             |      AND o.o_orderdate >= '1997-01-01' AND o.o_orderdate < '1999-01-01')
             |  AND EXISTS (SELECT 1 FROM orders o JOIN lineitem l
             |      ON o.o_orderkey = l.l_orderkey
             |    WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
             |GROUP BY n_name, c_mktsegment
             |ORDER BY n_name, c_mktsegment""".stripMargin)),
  )
}
