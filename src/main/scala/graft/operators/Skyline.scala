package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Distributed skyline (Pareto frontier) over numeric/temporal dimensions —
  * all dims minimized. Pattern follows the published Spark-SQL skyline
  * work (EDBT 2023, "Integration of Skyline Queries into Spark SQL" — see
  * PAPERS.md): a row is in the skyline iff no other row is ≤ in every
  * dimension and < in at least one.
  *
  * Two phases: (1) partition-local block-nested-loop pruning — narrow, no
  * shuffle, eliminates the overwhelming majority of rows (the local skyline
  * is a superset of each partition's contribution to the global one);
  * (2) global BNL over the union of local skylines. Phase 2's input is
  * |local skylines| ≈ d-th order log-power of n for random data — tiny
  * relative to 100 TB inputs — so the normal path is one single-task merge.
  * Anti-correlated data can make local skylines huge, so phase 2 counts the
  * survivors first and falls back to TOURNAMENT HALVING: each round
  * shuffles survivors into half as many partitions and BNL-prunes again,
  * bounding per-task memory at (survivors / partitions) per round instead
  * of putting the entire un-pruned union on one node. Rounds stop when the
  * survivor set fits the single merge or a round fails to shrink it — the
  * latter means the TRUE skyline is simply that large (output-bound by
  * problem definition, not by plan choice).
  *
  * This is a deliberate `mapPartitions` operator (SURVEY.md §2 preference
  * (d)): the BNL window is per-partition imperative state that neither
  * joins nor windows express without an O(n²) shuffle.
  */
object Skyline {

  /** EAGER: the skyline is computed at call time (survivor counting per
    * tournament round, then the final single-task merge) and returned as a
    * materialized, lineage-truncated frame. Every intermediate cached frame
    * is released before this returns — there is no cross-call retained
    * cache; the result's own blocks are reclaimed by Spark's ContextCleaner
    * once the returned frame is unreferenced.
    */
  def skyline(df0: DataFrame, dims: Seq[String],
      mergeThreshold: Long = 100000L): DataFrame =
    skylineWithRounds(df0, dims, mergeThreshold)._1

  /** [[skyline]] plus the number of tournament-halving rounds taken —
    * 0 on the normal path (local skylines fit the single merge directly).
    * Exposed for tests asserting the fallback actually engages.
    */
  private[graft] def skylineWithRounds(df0: DataFrame, dims: Seq[String],
      mergeThreshold: Long = 100000L): (DataFrame, Int) = {
    // Rows with NULL in any skyline dimension are excluded up front: NULL
    // has no place in a dominance order, and the comparator would NPE.
    import org.apache.spark.sql.functions.col
    val df = df0.filter(dims.map(col(_).isNotNull).reduce(_ && _))
    val schema = df.schema
    val idx = dims.map(schema.fieldIndex).toArray

    def cmp(x: Any, y: Any): Int =
      x.asInstanceOf[Comparable[Any]].compareTo(y)

    // true iff b dominates a: b <= a on all dims, b < a on at least one
    def dominates(b: Row, a: Row): Boolean = {
      var strict = false
      var i = 0
      while (i < idx.length) {
        val c = cmp(b.get(idx(i)), a.get(idx(i)))
        if (c > 0) return false
        if (c < 0) strict = true
        i += 1
      }
      strict
    }

    def bnl(it: Iterator[Row]): Iterator[Row] = {
      val window = scala.collection.mutable.ArrayBuffer[Row]()
      it.foreach { r =>
        if (!window.exists(w => dominates(w, r))) {
          var i = 0
          while (i < window.length) {
            if (dominates(r, window(i))) window.remove(i) else i += 1
          }
          window += r
        }
      }
      window.iterator
    }

    val enc = Encoders.row(schema)
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    // Phase 2: count survivors before committing to a single-task merge.
    // Each tournament round materializes its output (count) BEFORE the
    // parent round is released, so no round ever recomputes the scan.
    var cur = df.mapPartitions(bnl)(enc).persist(MEMORY_AND_DISK)
    var cnt = cur.count()
    var parts = cur.rdd.getNumPartitions
    var prev = Long.MaxValue
    var rounds = 0
    while (cnt > mergeThreshold && parts > 1 && cnt < prev) {
      prev = cnt
      rounds += 1
      parts = math.max(1, parts / 2)
      val next = cur.repartition(parts).mapPartitions(bnl)(enc).persist(MEMORY_AND_DISK)
      cnt = next.count()
      cur.unpersist(false)
      cur = next
    }
    // Materialize the final merge NOW (localCheckpoint(eager): one job over
    // the cached survivors, result stored as its own blocks with the lineage
    // truncated), then release the survivor frame immediately — nothing is
    // parked for a later call, and the result's blocks go away with the
    // returned frame itself (ContextCleaner unpersists GC'd RDDs).
    val out = cur.repartition(1).mapPartitions(bnl)(enc).localCheckpoint(true)
    cur.unpersist(false)
    (out, rounds)
  }
}
