package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list, in exactly-reproducible integer arithmetic.
  *
  * The reference stack offers no graph operator at all (its whole relational
  * surface delegates to hive-exec); PageRank joins connectedComponents
  * ([[Dedup.connectedComponents]]) as the second graph primitive a corpus
  * pipeline needs — ranking near-dup cluster members / hub documents by link
  * structure instead of keeping the arbitrary min-id survivor.
  *
  * Determinism contract (the same one every oracle-gated query here obeys):
  * all rank math is BIGINT — ranks are scaled by `scale`, per-edge
  * contributions use truncating integer division (`div` in Spark, `//` in
  * DuckDB: identical on non-negative operands), and damping 0.85 is applied
  * as `(85 * x) div 100`. Integer sums are shuffle-order independent, so a
  * retried/speculated task produces bit-identical ranks — no
  * floating-point accumulation-order drift between engines or between runs.
  *
  * Scale shape (100 TB): per iteration exactly one aggregation shuffle of the
  * edge-sized contribution frame plus two node-sized hash joins (rank and
  * degree are |V|-sized — AQE broadcasts them when small). The edge set and
  * degree frame are materialized once via `localCheckpoint` (same staged-slot
  * discipline as [[Dedup.connectedComponents]]: an iterative frame must
  * truncate lineage or round N's plan nests every prior round's). Nothing
  * data-sized ever reaches the driver.
  */
object PageRank {

  /** Integer-scaled PageRank.
    *
    * @param edges      directed edge list; dangling nodes (out-degree 0, i.e.
    *                   never appearing as src) receive rank but contribute
    *                   none — pass a symmetrized edge list if the graph is
    *                   undirected.
    * @param iterations fixed iteration count (deterministic output, and the
    *                   unrolled-CTE oracle mirrors it exactly)
    * @param scale      rank 1.0 ≡ `scale`; headroom: max rank < |V|·scale,
    *                   and the damping step multiplies by 85, so
    *                   |V|·scale·85 must stay below 2^63 (1e9 default leaves
    *                   room for ~10^8 nodes).
    * @return (id, pr) for every node that appears as a SOURCE of some edge —
    *         ranks are anchored on the out-degree frame; with a symmetrized
    *         edge list that is every node of the graph.
    */
  def pageRankInt(
      edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      iterations: Int = 3, scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 30,
      s"iterations must be in [1, 30] (got $iterations)")
    // Materialize the caller's edge list ONCE, raw — NO distinct here
    // (round-17): the dedup used to run as its own corpus-sized exchange
    // before the src-repartition re-shuffled the same bytes again; it now
    // rides the src-shuffle below as a partition-local aggregate
    // (hash(src) clusters every duplicate (src, dst) row into one
    // partition, so an Aggregate keyed (src, dst) needs no exchange of its
    // own). One edge-sized exchange total, was two.
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint() // reused below: one upstream execution, O(1) plan
    // Iteration partitioning from the measured edge count (pre-dedup — an
    // upper bound on the distinct count, which only errs toward smaller
    // partitions); AQE off for the loop's plans (IterativeScope scaladoc —
    // per-Exchange AQE jobs are pure driver overhead on an unrolled loop
    // of known, static sizes).
    val n = IterativeScope.partitionsFor(e0.sparkSession, e0.count())
    IterativeScope.withLoopConfs(e0.sparkSession, n) {
      // The degree is STATIC across iterations — attach it to the edge
      // frame at the SAME materialization (round-17: it used to be a
      // groupBy + join + re-sort + second checkpoint; a count window over
      // the src-sorted partitions is one pass, no join, no extra
      // exchange), so each iteration joins the edge table exactly once.
      val eDeg = e0.repartition(n, col("src"))
        .distinct() // partition-local dedup: no exchange, the frame is (src, dst)
        .withColumn("deg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")))
        .localCheckpoint() // static (src, dst, deg), hash(src, n), sorted by src (the window's sort)
      val base = scale * 15L / 100L // (1 - d) mass, d = 0.85, truncating like both engines
      // distinct sources: partition-local again (hash(src, n) satisfies)
      val nodes = eDeg.select(col("src").as("id")).distinct()
        .localCheckpoint() // hash(src→id, n)
      // eDeg and nodes are materialized — their input is dead; release
      // deterministically (Staged scaladoc: GC'd checkpoints leaked one
      // edge-sized block set per call across bench sweeps)
      Staged.free(e0)
      var rank = nodes.select(col("id"), lit(scale).as("pr"))
      for (_ <- 1 to iterations) {
        val contrib = eDeg
          .join(rank.select(col("id").as("src"), col("pr")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(expr("pr div deg")).as("c")) // integer per-edge share, order-free sum
        rank = nodes
          .join(contrib, Seq("id"), "left") // sources with no in-edges keep base mass
          .select(col("id"),
            expr(s"$base + (85 * coalesce(c, 0L)) div 100").as("pr"))
      }
      // materialize inside the scope: the caller's top-k/sort then plans
      // under its own session settings over the finished rank table
      val out = rank.localCheckpoint()
      Staged.free(eDeg) // the loop's static frames are dead once out exists
      Staged.free(nodes)
      // the rank table is the caller's result — released at the NEXT
      // pageRankInt call (Staged.handoff scaladoc)
      Staged.handoff("pagerank-rank", out)
    }
  }

  /** The unrolled-CTE DuckDB oracle for [[pageRankInt]] over a symmetrized
    * bipartite supplier↔part graph from `lineitem` — generated by the same
    * loop so the Spark plan and the SQL can never drift. `//` is DuckDB's
    * truncating integer division; SUM over BIGINT widens to HUGEINT in
    * DuckDB, so each sum is cast back to BIGINT (Spark's sum(long) is long).
    */
  def oracleSqlLineitemBipartite(
      iterations: Int, topK: Int, scale: Long = 1000000000L): String = {
    val base = scale * 15L / 100L
    val head =
      s"""WITH fwd AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
         |                             CAST(l_partkey AS BIGINT) + 100000000 AS dst
         |             FROM lineitem),
         |edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
         |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT src AS id, CAST($scale AS BIGINT) AS pr FROM deg)""".stripMargin
    val rounds = (1 to iterations).map { i =>
      s"""c$i AS (SELECT e.dst AS id, CAST(SUM(r.pr // d.deg) AS BIGINT) AS c
         |        FROM edges e
         |        JOIN r${i - 1} r ON e.src = r.id
         |        JOIN deg d ON e.src = d.src
         |        GROUP BY e.dst),
         |r$i AS (SELECT d.src AS id,
         |               CAST($base + (85 * COALESCE(c.c, 0)) // 100 AS BIGINT) AS pr
         |        FROM deg d LEFT JOIN c$i c ON c.id = d.src)""".stripMargin
    }
    val tail =
      s"""SELECT id AS node_id, pr FROM r$iterations
         |ORDER BY pr DESC, id LIMIT $topK""".stripMargin
    (head +: rounds).mkString(",\n") + "\n" + tail
  }
}
