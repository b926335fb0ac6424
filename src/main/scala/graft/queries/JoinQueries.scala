package graft.queries

import graft.{QDef, Tables}
import graft.QDef._
import graft.functions.VectorFunctions
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 — joins (J1-J10).
  *
  * The reference implements no joins (single-table storage plugin); the full
  * join surface is Hive delegation over its scans
  * (reference: pom.xml:28-31, DesignDocument.md:13-19). Here Catalyst picks
  * broadcast vs sort-merge; small dimensions are explicitly broadcast where
  * the 100-TB plan demands it (fact tables never build the hash side).
  */
object JoinQueries {

  val defs: Seq[QDef] = Seq(

    QDef("j1_inner_join_agg",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy("o_orderpriority")
        .agg(sum(expr(revenueExpr)).cast("decimal(38,4)").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority,
              |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS revenue,
              |  count(*) AS n
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Broadcast (map-side) join — Hive 1.1's "mapjoin". part is a dimension:
    // at 100 TB the fact side streams, the dim hash map ships to executors.
    QDef("j2_broadcast_join",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")),
          col("l_partkey") === col("p_partkey"), "inner")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(d182(col("l_quantity"))).cast("decimal(38,4)").as("sum_qty"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Left outer: customers keep rows with zero orders (count(col) skips null).
    QDef("j3_left_outer_join",
      (s, dir) => Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QDef("j3_right_outer_join",
      (s, dir) => Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(max(col("o_orderstatus")), lit("-")).as("max_status"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             |  coalesce(max(o_orderstatus), '-') AS max_status
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Full outer over two deliberately-mismatched sides; every nullable output
    // is coalesced so null-representation differences cannot bite.
    QDef("j3_full_outer_join",
      (s, dir) => {
        val perCust = Tables.load(s, dir, "orders")
          .filter(col("o_custkey") < 800)
          .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        val custs = Tables.load(s, dir, "customer")
          .filter(col("c_custkey").between(700, 1000))
          .select(col("c_custkey"), col("c_name"))
        perCust.join(custs, col("o_custkey") === col("c_custkey"), "full")
          .select(
            coalesce(col("o_custkey"), col("c_custkey")).as("k"),
            coalesce(col("n"), lit(-1L)).as("n"),
            coalesce(col("c_name"), lit("(none)")).as("name"))
          .orderBy("k")
      },
      Some("""SELECT coalesce(a.o_custkey, b.c_custkey) AS k,
             |  coalesce(a.n, -1) AS n, coalesce(b.c_name, '(none)') AS name
             |FROM (SELECT o_custkey, count(*) AS n FROM orders WHERE o_custkey < 800 GROUP BY 1) a
             |FULL JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey BETWEEN 700 AND 1000) b
             |  ON a.o_custkey = b.c_custkey
             |ORDER BY k""".stripMargin)),

    // Left semi — HiveQL LEFT SEMI JOIN / IN-subquery rewrite.
    QDef("j4_semi_join",
      (s, dir) => Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders").filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Left anti — Hive NOT IN rewrite; also the engine of the S6 dup-ignore insert.
    QDef("j5_anti_join",
      (s, dir) => Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders").filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Cross join with a theta (non-equi) predicate.
    QDef("j6_cross_theta_join",
      (s, dir) => {
        val r = Tables.load(s, dir, "region")
        val n = Tables.load(s, dir, "nation")
        r.join(n, col("r_regionkey") =!= col("n_regionkey"))
          .select(col("r_name"), col("n_name"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             |WHERE r_regionkey <> n_regionkey ORDER BY 1, 2""".stripMargin)),

    // Multi-way star join: fact → 4 dimensions. nation/region broadcast;
    // AQE reorders at runtime on a real cluster.
    QDef("j7_star_join",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(expr(revenueExpr)).cast("decimal(38,4)").as("revenue"))
        .orderBy("r_name", "n_name"),
      Some(s"""SELECT r_name, n_name,
              |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS revenue
              |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Range/interval join: purchase within 30 minutes after a view, same user.
    // Equi key (user) + range residual → hash-partitioned join, no cross blowup.
    QDef("j8_range_join",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        val buys = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
        views.join(buys, col("v_user") === col("b_user") &&
            col("b_ts") > col("v_ts") &&
            col("b_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTE"))
          .groupBy(col("v_user").as("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      Some("""SELECT v.user_id AS user_id, count(*) AS n_pairs
             |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
             |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') b
             |  ON v.user_id = b.user_id AND b.ts > v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // As-of join via graft.operators.AsOfJoin (union + single window pass).
    // For each purchase: timestamp of that user's latest click at-or-before it.
    QDef("j9_asof_join",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = e.filter(col("event_type") === "click")
          .select("user_id", "ts")
        AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts",
          Seq("ts" -> "click_ts"))
          .select(col("event_id"),
            coalesce(expr("unix_millis(click_ts)"), lit(-1L)).as("last_click_ms"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id,
             |  coalesce(epoch_ms((SELECT max(c.ts) FROM events c
             |                     WHERE c.event_type = 'click'
             |                       AND c.user_id = p.user_id AND c.ts <= p.ts)), -1) AS last_click_ms
             |FROM events p WHERE p.event_type = 'purchase'
             |ORDER BY p.event_id""".stripMargin)),

    // Similarity self-join: embedding pairs with cosine ≥ τ. Both engines
    // evaluate the same fold-ordered cosine, so the threshold cut is exact.
    QDef("j10_similarity_self_join",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 80)
        val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("cos", VectorFunctions.cosine(col("a_emb"), col("b_emb")))
          .filter(col("cos") >= 0.25)
          .select(col("a_id"), col("b_id"), dec4(col("cos")).as("cos"))
          .orderBy("a_id", "b_id")
      },
      Some(s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              |  CAST(${VectorFunctions.oracleCosineSql("a.embedding", "b.embedding")} AS DECIMAL(38,4)) AS cos
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |WHERE a.vec_id < 80 AND b.vec_id < 80
              |  AND ${VectorFunctions.oracleCosineSql("a.embedding", "b.embedding")} >= 0.25
              |ORDER BY a_id, b_id""".stripMargin)),

    // Salted skew join: the hot-key fallback when AQE's skew splitting is
    // not enough (power-law keys at 100 TB). Oracle = the PLAIN join — the
    // salt must be semantically invisible; spreading is deterministic
    // (hash(l_linenumber), never rand()) so retried tasks stay exactly-once.
    QDef("j11_salted_join",
      (s, dir) => {
        val fat = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            d182(col("l_extendedprice")).as("price"))
        val thin = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.operators.SkewJoin
          .saltedInnerJoin(fat, thin, Seq("l_orderkey"), "l_linenumber")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("price")).cast("decimal(38,4)").as("total"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS total
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Hot-key-only salting — the production form: keys above the frequency
    // threshold are detected with a keys-only agg, broadcast, and salted;
    // everything else takes the normal join path (no thin-side explosion).
    // Threshold 4 splits the fixture's 1-7 lines-per-order distribution into
    // a real hot slice and a real cold slice, so both paths are exercised.
    // Oracle = the PLAIN join again: the split must be semantically invisible.
    QDef("j12_salted_hot_join",
      (s, dir) => {
        val fat = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            d182(col("l_extendedprice")).as("price"))
        val thin = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.operators.SkewJoin
          .saltedInnerJoinHotKeys(fat, thin, Seq("l_orderkey"), "l_linenumber",
            salts = 8, hotThreshold = 4L)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("price")).cast("decimal(38,4)").as("total"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS total
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
