package graft.operators

import graft.catalog.KuduLikeCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped sum/count aggregate over a keyed
  * catalog table, driven by the CDC feed ([[KuduLikeCatalog.changesBetween]])
  * instead of recomputation.
  *
  * The maintained aggregate is `groupBy(groupCols).agg(count(*) AS n,
  * sum(valueCol) AS total)` — the count makes empty groups detectable (a
  * group whose n reaches 0 is dropped, exactly like a recompute would).
  *
  * Correctness hinges on retraction: an upsert REPLACES its key's row, so
  * the old row's contribution must be subtracted — including when the upsert
  * MOVES the key to a different group. The CDC feed carries after-images
  * only; before-images come from an as-of read at `fromVersion`
  * **semi-joined down to the changed keys**. That is the 100-TB design
  * point: changed keys per batch are tiny relative to the table, the as-of
  * read is bucket/range-pruned by the same keys, and everything downstream
  * is sized by |changes| + |touched groups| — never by |table|. A full
  * recompute is O(table) per refresh; this is O(delta).
  *
  * At-most-one change per key per version batch is guaranteed by the
  * catalog (in-batch dedup); across versions in (from, to] only the LATEST
  * change per key is applied against the from-state (intermediate states
  * cancel telescopically).
  */
object IncrementalAgg {

  /** Net per-group change in (n, total) caused by versions (from, to].
    *
    * `baseEpoch` is the value of [[KuduLikeCatalog.baseEpoch]] the consumer
    * captured when it bootstrapped: inserts into a table with no pending
    * delta layers append to the BASE without emitting CDC or bumping the
    * version, so without this check the maintained aggregate would go
    * silently stale (the rows exist but the changelog never reports them).
    */
  def delta(
      cat: KuduLikeCatalog, table: String, fromVersion: Int, toVersion: Int,
      baseEpoch: Long, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(0 <= fromVersion && fromVersion <= toVersion,
      s"bad version window ($fromVersion, $toVersion]")
    // a compact() folds the changelog away and resets version numbering —
    // a stale window would silently read an EMPTY delta and corrupt the
    // maintained aggregate; fail loudly and make the consumer re-bootstrap
    val current = cat.currentVersion(table)
    require(toVersion <= current,
      s"toVersion $toVersion exceeds current changelog version $current " +
        s"(table compacted?) — re-bootstrap the aggregate with recompute()")
    val epochNow = cat.baseEpoch(table)
    require(epochNow == baseEpoch,
      s"base epoch moved ($baseEpoch -> $epochNow): rows were inserted via the " +
        "base-append path, which the changelog does not cover — re-bootstrap " +
        "the aggregate with recompute()")
    val keys = cat.keyColsOf(table)
    val changes = cat.changesBetween(table, fromVersion, toVersion)
    // latest change per key wins vs the from-state (ties impossible: the
    // catalog dedups within a batch, versions are distinct by construction)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("version").desc)
    val last = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val after = last.filter(col("op") === "upsert")
    val changedKeys = last.select(keys.map(col): _*)
    val before = cat.tableAsOf(table, fromVersion)
      .join(changedKeys, keys, "left_semi")
    val weighted = after.select(
      (groupCols.map(col) :+ col(valueCol).as("__v") :+ lit(1L).as("__w")): _*)
      .unionByName(before.select(
        (groupCols.map(col) :+ col(valueCol).as("__v") :+ lit(-1L).as("__w")): _*))
    weighted.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__w")).as("d_n"),
        sum(col("__v") * col("__w")).cast("double").as("d_total"))
      // groups net-untouched by the batch (e.g. value unchanged) still emit
      // a zero row here; harmless to merge, but dropping them keeps the
      // writeback strictly |touched groups|-sized
      .filter(col("d_n") =!= 0L || col("d_total") =!= 0.0)
  }

  /** Merge a [[delta]] into the previous aggregate frame: full outer join on
    * the group key — new groups appear, emptied groups (n = 0) vanish. The
    * join is sized by |agg| + |delta|, never by the fact table.
    *
    * The join is NULL-SAFE (`<=>`): group columns are ordinary nullable
    * columns, and a null-keyed group must meet its own delta row — a
    * null-unsafe join would drop its retractions (losing deletes) or
    * duplicate the group (on additions).
    */
  def merge(prevAgg: DataFrame, d: DataFrame, groupCols: Seq[String]): DataFrame = {
    val p = prevAgg.select(
      (groupCols.map(g => col(g).as(s"__p_$g")) :+ col("n") :+ col("total")): _*)
    val cond = groupCols.map(g => col(s"__p_$g") <=> col(g)).reduce(_ && _)
    p.join(d, cond, "full_outer")
      .select(
        (groupCols.map(g => coalesce(col(s"__p_$g"), col(g)).as(g)) :+
          (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n") :+
          (coalesce(col("total"), lit(0.0)) + coalesce(col("d_total"), lit(0.0))).as("total")): _*)
      .filter(col("n") > 0L)
  }

  /** The aggregate this operator maintains, computed from scratch — the
    * oracle for tests and the bootstrap for version 0.
    */
  def recompute(rows: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).cast("double").as("total"))

  /** Production writeback: maintain the aggregate AS a keyed catalog table
    * (group cols = primary key). Only touched groups are written — an
    * upsert for surviving groups, tombstones for emptied ones — so refresh
    * cost is O(touched groups), and readers see the aggregate through the
    * ordinary merge-on-read path.
    *
    * Because the group columns ARE the aggregate table's primary key (and
    * the catalog rejects null keys), null-valued groups cannot be
    * represented here — maintain those through the frame-level [[merge]],
    * which is null-safe.
    */
  def maintainInto(
      cat: KuduLikeCatalog, aggTable: String,
      srcCat: KuduLikeCatalog, srcTable: String,
      fromVersion: Int, toVersion: Int, baseEpoch: Long,
      groupCols: Seq[String], valueCol: String): Unit = {
    val d = delta(srcCat, srcTable, fromVersion, toVersion, baseEpoch, groupCols, valueCol)
    val touched = merge(
      cat.table(aggTable).join(d.select(groupCols.map(col): _*), groupCols, "left_semi"),
      d, groupCols)
    cat.upsert(aggTable, touched)
    val emptied = d.join(touched.select(groupCols.map(col): _*), groupCols, "left_anti")
      .select(groupCols.map(col): _*)
    // emptied groups are a handful per batch by construction (they are a
    // subset of touched groups), so collecting the TUPLES to build an exact
    // OR-of-ANDs delete predicate is bounded — per-column isin() would
    // over-delete cross combinations on composite keys
    val emptiedRows = emptied.collect()
    if (emptiedRows.nonEmpty) {
      val pred = emptiedRows.map { r =>
        groupCols.zipWithIndex.map { case (g, i) => col(g) <=> lit(r.get(i)) }
          .reduce(_ && _)
      }.reduce(_ || _)
      cat.delete(aggTable, pred): Unit
    }
  }
}
