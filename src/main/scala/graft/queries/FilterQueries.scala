package graft.queries

import graft.{QDef, Tables}
import graft.QDef._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — projections, filters, predicates (P1-P10).
  *
  * The reference demonstrates projection + string-equality filtering
  * (reference: README.md:39 `select id from test_Drop where name = 'a'`) and
  * serves the rest of the HiveQL predicate surface by delegation; here each
  * predicate family is declared as a Catalyst-pushed filter over parquet.
  */
object FilterQueries {

  val defs: Seq[QDef] = Seq(

    QDef("p1_projection_alias",
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_mktsegment").as("segment"))
        .orderBy("id"),
      Some("""SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
             |FROM customer ORDER BY id""".stripMargin)),

    // Reference demo analog: project key where string column equals constant.
    QDef("p2_filter_eq_string",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_returnflag = 'A' AND l_linestatus = 'F'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QDef("p3_filter_range",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity").between(10.0, 15.0) &&
          col("l_extendedprice") < 5000.0 && col("l_discount") >= 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), d182(col("l_extendedprice")).as("price"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
             |FROM lineitem
             |WHERE l_quantity BETWEEN 10.0 AND 15.0 AND l_extendedprice < 5000.0 AND l_discount >= 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QDef("p4_filter_in_list",
      (s, dir) => Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          !col("o_orderstatus").isin("P"))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority", "o_orderstatus"),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n FROM orders
             |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_orderstatus NOT IN ('P')
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Fixtures are null-free (key columns non-null by construction,
    // reference: KuduStorageHandler.java:251-255), so nulls are derived via
    // nullif and then tested with IS NULL / IS NOT NULL.
    QDef("p5_filter_null_pred",
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("st", expr("nullif(o_orderstatus, 'O')"))
        .filter(col("st").isNull && col("o_orderkey").isNotNull)
        .select(col("o_orderkey"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey FROM orders
             |WHERE nullif(o_orderstatus, 'O') IS NULL AND o_orderkey IS NOT NULL
             |ORDER BY o_orderkey""".stripMargin)),

    QDef("p6_filter_boolean_ops",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter((col("l_returnflag") === "R" || col("l_returnflag") === "A") &&
          !(col("l_quantity") > 10.0) && col("l_discount") > 0.02)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
        // l_returnflag completes a total order (T2_INORDER caught the tie).
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
             |WHERE (l_returnflag = 'R' OR l_returnflag = 'A')
             |  AND NOT (l_quantity > 10.0) AND l_discount > 0.02
             |ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin)),

    QDef("p7_filter_like_regex",
      (s, dir) => Tables.load(s, dir, "customer")
        .filter(col("c_name").like("%00001%") && col("c_name").rlike("1[0-9]$"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_name LIKE '%00001%' AND regexp_matches(c_name, '1[0-9]$')
             |ORDER BY c_custkey""".stripMargin)),

    QDef("p8_case_when",
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 100000.0, "small")
            .when(col("o_totalprice") < 300000.0, "medium")
            .otherwise("large"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT CASE WHEN o_totalprice < 100000.0 THEN 'small'
             |            WHEN o_totalprice < 300000.0 THEN 'medium'
             |            ELSE 'large' END AS bucket, count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Casts across the closed type lattice (SURVEY.md §1.2). DuckDB rounds on
    // double→int casts where Spark truncates, so integer conversion goes
    // through floor() in both dialects.
    QDef("p9_type_casts",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 50)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).as("qty_int"),
          col("l_linenumber").cast("string").as("ln_str"),
          col("l_linenumber").cast("double").cast("decimal(18,2)").as("ln_dbl"),
          col("l_shipdate").cast("date").as("ship_day"),
          expr("unix_millis(cast(l_shipdate as timestamp))").as("ship_ms"),
          (col("l_quantity") > 25.0).cast("int").as("big_flag"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(floor(l_quantity) AS BIGINT) AS qty_int,
             |  CAST(l_linenumber AS VARCHAR) AS ln_str,
             |  CAST(CAST(l_linenumber AS DOUBLE) AS DECIMAL(18,2)) AS ln_dbl,
             |  CAST(l_shipdate AS DATE) AS ship_day,
             |  epoch_ms(l_shipdate) AS ship_ms,
             |  CAST(l_quantity > 25.0 AS INTEGER) AS big_flag
             |FROM lineitem WHERE l_orderkey < 50
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Null-safe equality: Spark `<=>` ≡ DuckDB IS NOT DISTINCT FROM.
    QDef("p11_null_safe_eq",
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("st", expr("nullif(o_orderstatus, 'O')"))
        .filter(col("st") <=> lit("F") || col("st") <=> lit(null))
        .groupBy(coalesce(col("st"), lit("(null)")).as("st"))
        .agg(count(lit(1)).as("n"))
        .orderBy("st"),
      Some("""SELECT coalesce(st, '(null)') AS st, count(*) AS n FROM (
             |  SELECT nullif(o_orderstatus, 'O') AS st FROM orders) t
             |WHERE st IS NOT DISTINCT FROM 'F' OR st IS NOT DISTINCT FROM NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QDef("p10_distinct",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY 1, 2""".stripMargin)),
  )
}
