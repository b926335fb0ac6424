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
  * (2) global BNL over the union of local skylines on a single partition.
  * Phase 2's input is |local skylines| ≈ d-th order log-power of n for
  * random data — tiny relative to 100 TB inputs; for adversarial (fully
  * anti-correlated) data where the skyline itself is huge, phase 2 becomes
  * the bottleneck by problem definition, not by plan choice.
  *
  * This is a deliberate `mapPartitions` operator (SURVEY.md §2 preference
  * (d)): the BNL window is per-partition imperative state that neither
  * joins nor windows express without an O(n²) shuffle.
  */
object Skyline {

  def skyline(df0: DataFrame, dims: Seq[String]): DataFrame = {
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
    val local = df.mapPartitions(bnl)(enc)
    local.repartition(1).mapPartitions(bnl)(enc)
  }
}
