package graft.queries

import graft.{QDef, Tables}
import graft.QDef._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 — aggregations (A1-A10).
  *
  * A1/A2 are the reference's own demo queries (`select count(*)`,
  * `select name, count(*) ... group by name` — reference: README.md:37,41);
  * the rest is the HiveQL aggregate surface served by delegation. All run as
  * Spark partial+final HashAggregate with one exchange (the Hive-on-MR
  * equivalent was the 1-map/1-reduce job in reference README.md:146-153).
  * Money/quantity columns are DECIMAL(18,2)-cast before summing so the
  * aggregate is exact and shuffle-order-independent — required both for the
  * DuckDB oracle and for reproducible results on a real cluster.
  */
object AggQueries {

  val defs: Seq[QDef] = Seq(

    QDef("a1_global_agg",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .agg(count(lit(1)).as("n"),
          sum(d182(col("l_quantity"))).cast("decimal(38,4)").as("sum_qty")),
      Some("""SELECT count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_qty
             |FROM lineitem""".stripMargin)),

    // Flagship: the reference's `SELECT name, count(*) GROUP BY name`
    // (reference: README.md:41, golden rows README.md:205-209).
    QDef("a2_groupby_count",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1")),

    QDef("a3_sum_avg_min_max",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(d182(col("l_quantity"))).cast("decimal(38,4)").as("sum_qty"),
          avg(d182(col("l_extendedprice"))).cast("decimal(38,4)").as("avg_price"),
          d182(min(col("l_discount"))).as("min_disc"),
          d182(max(col("l_discount"))).as("max_disc"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_qty,
             |  CAST(avg(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS avg_price,
             |  CAST(min(l_discount) AS DECIMAL(18,2)) AS min_disc,
             |  CAST(max(l_discount) AS DECIMAL(18,2)) AS max_disc
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QDef("a4_count_distinct",
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A5 declared with the EXACT distinct count (the approx_count_distinct
    // variant is asserted within 5% of this in ApproxAggSpec — SURVEY.md A5).
    QDef("a5_distinct_exact_for_approx",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    QDef("a6_having",
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 18)
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, count(*) AS n FROM orders
             |GROUP BY 1 HAVING count(*) >= 18 ORDER BY 1""".stripMargin)),

    // ROLLUP with grouping() flags; grouping-null keys are coalesced to a
    // sentinel so null-ordering dialect differences cannot bite.
    QDef("a7_rollup",
      // pre-aggregated per (rf, ls) before the rollup's 3x Expand; decimal
      // sum-of-sums and count-as-sum are exact (round-16 optimization —
      // the Expand now multiplies 6 rows, not the fact table)
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("__n"),
          sum(d182(col("l_quantity"))).as("__q"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          sum(col("__n")).as("n"),
          sum(col("__q")).cast("decimal(38,4)").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
        .orderBy("g_rf", "g_ls", "rf", "ls"),
      Some("""SELECT coalesce(l_returnflag, '(all)') AS rf, coalesce(l_linestatus, '(all)') AS ls,
             |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
             |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
             |  count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY g_rf, g_ls, rf, ls""".stripMargin)),

    QDef("a7_cube",
      // pre-aggregated per (status, priority) before the cube's 4x Expand
      // (same exactness argument as a7_rollup)
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("__n"))
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_st"),
          grouping(col("o_orderpriority")).cast("int").as("g_pr"),
          sum(col("__n")).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("st"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("pr"),
          col("g_st"), col("g_pr"), col("n"))
        .orderBy("g_st", "g_pr", "st", "pr"),
      Some("""SELECT coalesce(o_orderstatus, '(all)') AS st,
             |  coalesce(o_orderpriority, '(all)') AS pr,
             |  CAST(grouping(o_orderstatus) AS INTEGER) AS g_st,
             |  CAST(grouping(o_orderpriority) AS INTEGER) AS g_pr,
             |  count(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY g_st, g_pr, st, pr""".stripMargin)),

    QDef("a8_stats_agg",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          dec4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          dec4(var_samp(col("l_quantity"))).as("var_qty"),
          dec4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(stddev_samp(l_quantity) AS DECIMAL(38,4)) AS sd_qty,
             |  CAST(var_samp(l_quantity) AS DECIMAL(38,4)) AS var_qty,
             |  CAST(corr(l_quantity, l_extendedprice) AS DECIMAL(38,4)) AS corr_qp
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    QDef("a9_median",
      // EXACT median via graft.operators.ExactMedian (value-histogram +
      // cumulative counts), not Spark's median() aggregate — the built-in
      // buffers every group's values in one executor's heap; see the
      // operator's scaladoc for the 100-TB rationale. The two measure
      // columns melt by union (stays inside whole-stage codegen; an
      // explode(map(...)) melt allocates a map object per input row).
      (s, dir) => {
        val t = Tables.load(s, dir, "lineitem")
        val melted =
          t.select(col("l_returnflag"), lit("q").as("m"),
            col("l_quantity").cast("double").as("v"))
            .unionAll(t.select(col("l_returnflag"), lit("p").as("m"),
              col("l_extendedprice").cast("double").as("v")))
        graft.operators.ExactMedian.groupedMedian(melted, Seq("l_returnflag", "m"), "v")
          .groupBy("l_returnflag")
          .agg(dec4(max(when(col("m") === "q", col("med")))).as("med_qty"),
            dec4(max(when(col("m") === "p", col("med")))).as("med_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(median(l_quantity) AS DECIMAL(38,4)) AS med_qty,
             |  CAST(median(l_extendedprice) AS DECIMAL(38,4)) AS med_price
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Pivot (wide aggregation) — Hive's conditional-aggregation idiom.
    QDef("a11_pivot",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ordered full collect_list (bounded input) serialized to a string.
    QDef("a10_collect_ordered",
      (s, dir) => Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 20)
        .groupBy("o_custkey")
        .agg(array_join(
          transform(array_sort(collect_list(col("o_orderkey"))), x => x.cast("string")),
          ",").as("order_keys"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
             |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys
             |FROM orders WHERE o_custkey < 20
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bounded collect: sorted-distinct list serialized to a string so the
    // cross-engine comparison is a plain VARCHAR.
    QDef("a10_collect_list",
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A12 explicit GROUPING SETS (the general form a7's ROLLUP/CUBE are
    // shorthand for) — one pass, one shuffle: Catalyst expands the sets
    // into a single Expand + partial/final aggregate, not one job per set.
    QDef("a12_grouping_sets",
      // pre-aggregated per (rf, ls) before the grouping-sets Expand (same
      // exactness argument as a7_rollup)
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("__n"),
          sum(d182(col("l_quantity"))).as("__q"))
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          sum(col("__n")).as("n"),
          sum(col("__q")).cast("decimal(38,4)").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
        .orderBy("g_rf", "g_ls", "rf", "ls"),
      Some("""SELECT coalesce(l_returnflag, '(all)') AS rf, coalesce(l_linestatus, '(all)') AS ls,
             |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
             |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
             |  count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             |ORDER BY g_rf, g_ls, rf, ls""".stripMargin)),
  )
}
