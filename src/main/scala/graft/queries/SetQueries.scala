package graft.queries

import graft.{QDef, Tables}
import graft.QDef._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 — sorts, limits, set operations, subqueries (O1-O5). */
object SetQueries {

  // Summed n is integral (exact in double for any order), so the scalar
  // subquery comparison is deterministic across engines.
  private val subqSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey, count(*) AS n,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS spend
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT c.c_custkey, p.n, p.spend
      |FROM customer c
      |JOIN per_cust p ON p.o_custkey = c.c_custkey
      |WHERE p.n > (SELECT avg(n * 1.0) FROM per_cust)
      |  AND EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c.c_custkey""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Total sort with a tiebreak chain making the order unique.
    QDef("o1_order_by",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), d182(col("l_extendedprice")).as("price"))
        .orderBy(col("price").desc, col("l_orderkey").asc, col("l_linenumber").asc),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
             |FROM lineitem
             |ORDER BY price DESC, l_orderkey, l_linenumber""".stripMargin)),

    // Top-k: Spark plans TakeOrderedAndProject — no full sort materialized.
    QDef("o2_top_k",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), d182(col("l_extendedprice")).as("price"))
        .orderBy(col("price").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
             |FROM lineitem
             |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    QDef("o3_union_all",
      (s, dir) => Tables.load(s, dir, "customer").select(col("c_nationkey").as("k"))
        .unionAll(Tables.load(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT k, count(*) AS n FROM (
             |  SELECT c_nationkey AS k FROM customer
             |  UNION ALL
             |  SELECT s_nationkey AS k FROM supplier) t
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QDef("o3_union_distinct",
      (s, dir) => Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 50).select(col("c_custkey").as("k"))
        .union(Tables.load(s, dir, "orders")
          .filter(col("o_custkey") < 80).select(col("o_custkey").as("k")))
        .distinct()
        .orderBy("k"),
      Some("""SELECT c_custkey AS k FROM customer WHERE c_custkey < 50
             |UNION
             |SELECT o_custkey FROM orders WHERE o_custkey < 80
             |ORDER BY k""".stripMargin)),

    // INTERSECT and EXCEPT in one result, tagged.
    QDef("o4_intersect_except",
      (s, dir) => {
        val cn = Tables.load(s, dir, "customer").select(col("c_nationkey").as("k"))
        val sn = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("k"))
        cn.intersect(sn).withColumn("op", lit("intersect"))
          .unionAll(cn.except(sn).withColumn("op", lit("except")))
          .select("op", "k")
          .orderBy("op", "k")
      },
      Some("""SELECT 'intersect' AS op, k FROM
             |  (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) a
             |UNION ALL
             |SELECT 'except' AS op, k FROM
             |  (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) b
             |ORDER BY op, k""".stripMargin)),

    // Correlated scalar subquery in the SELECT list — same ANSI text in
    // both engines.
    QDef("o7_correlated_scalar",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql(
          """SELECT n_nationkey, n_name,
            |  (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_customers,
            |  (SELECT count(*) FROM supplier sp WHERE sp.s_nationkey = n.n_nationkey) AS n_suppliers
            |FROM nation n ORDER BY n_nationkey""".stripMargin)
      },
      Some("""SELECT n_nationkey, n_name,
             |  (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_customers,
             |  (SELECT count(*) FROM supplier sp WHERE sp.s_nationkey = n.n_nationkey) AS n_suppliers
             |FROM nation n ORDER BY n_nationkey""".stripMargin)),

    // NOT IN against a set containing NULL — the classic three-valued-logic
    // trap: the result must be empty in both engines.
    QDef("p12_not_in_null",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql(
          """SELECT count(*) AS n FROM customer
            |WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 7) FROM orders)""".stripMargin)
      },
      Some("""SELECT count(*) AS n FROM customer
             |WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 7) FROM orders)""".stripMargin)),

    // Skyline / Pareto frontier (operators.Skyline, two-phase BNL): orders
    // minimizing (price, date) — no other order is both cheaper and earlier.
    QDef("o6_skyline",
      (s, dir) => {
        val sub = Tables.load(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_orderkey"), d182(col("o_totalprice")).as("p"),
            col("o_orderdate").cast("date").as("d"))
        graft.operators.Skyline.skyline(sub, Seq("p", "d"))
          .orderBy("o_orderkey")
      },
      Some("""WITH sub AS (
             |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             |         CAST(o_orderdate AS DATE) AS d
             |  FROM orders WHERE o_custkey < 100)
             |SELECT o_orderkey, p, d FROM sub a
             |WHERE NOT EXISTS (SELECT 1 FROM sub b
             |                  WHERE b.p <= a.p AND b.d <= a.d
             |                    AND (b.p < a.p OR b.d < a.d))
             |ORDER BY o_orderkey""".stripMargin)),

    // CTE + scalar subquery + EXISTS + derived table: one ANSI SQL text that
    // parses identically in Spark SQL and DuckDB.
    QDef("o5_subqueries",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql(SetQueries.subqSql)
      },
      Some(subqSql)),
  )
}
