package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global 1-based ranking WITHOUT an unpartitioned window — the shared
  * operator extracted from the round-15 Hamilton-rank recipe in
  * [[Curation.sqrtTemperatureAllocation]] (round-16 verdict item 4), so
  * every "rank the whole frame" site plans the same distributed shape
  * instead of `Window.orderBy(...)`, which funnels the entire input
  * through ONE task (Spark logs `WindowExec: No Partition Defined` for a
  * reason: at 10^7+ rows that task is the job).
  *
  * Shape: range-partition on the order, rank locally per partition (each a
  * bounded ~N/P slice), then add the earlier partitions' row counts — a
  * P-row summary self-join (P = shuffle partitions), broadcast back.
  * Global rank = local rank + offset holds exactly because the range
  * partitioner places every row of an earlier partition strictly before
  * any row of a later one in the same total order.
  *
  * The ranged frame is `localCheckpoint`ed (eager) so the per-partition
  * ranks and the partition-size summary read ONE materialized
  * partitioning. Without it the two branches only agree via Catalyst
  * exchange reuse; if the range exchange re-executes (reuse disabled,
  * block eviction mid-job, plan divergence) `repartitionByRange`
  * re-SAMPLES its bounds and the local ranks and offsets silently
  * disagree. A lost checkpoint block fails the job loudly instead —
  * the correct trade for a correctness-critical partitioning.
  *
  * Contract: `order` must be a STRICT total order (include a unique
  * tiebreaker column) — under a strict order `rank`, `dense_rank`, and
  * `row_number` coincide, so one verb serves all callers. Ordering
  * columns must be plain column references (they are re-resolved by name
  * inside the local window).
  */
object DistributedRank {

  /** Append column `as` = each row's 1-based global rank under `order`
    * (a strict total order; see class doc). LongType.
    */
  def withRank(df: DataFrame, order: Seq[Column], as: String): DataFrame = {
    require(order.nonEmpty, "DistributedRank: order must not be empty")
    // handoff AFTER the checkpoint materializes: a chained call (rank a
    // ranked frame again, as q49s does) consumes the previous call's
    // blocks during THIS materialization, so the previous frame is only
    // released once it is structurally dead (Staged scaladoc)
    val ranged = Staged.handoff("distributed-rank", df
      .repartitionByRange(order: _*)
      .withColumn("__dr_pid", spark_partition_id())
      .localCheckpoint())
    val local = ranged.withColumn("__dr_lr", row_number().over(
      Window.partitionBy(col("__dr_pid")).orderBy(order: _*)))
    val sizes = ranged.groupBy(col("__dr_pid")).agg(count(lit(1)).as("__dr_cnt"))
    // offsets over the P-row summary: a tiny triangular self-join (at most
    // P^2 pairs, broadcast), never an unpartitioned window
    val offsets = sizes.as("a")
      .join(broadcast(sizes.as("b")), col("b.__dr_pid") < col("a.__dr_pid"), "left")
      .groupBy(col("a.__dr_pid").as("__dr_pid"))
      .agg(coalesce(sum(col("b.__dr_cnt")), lit(0L)).as("__dr_off"))
    local
      .join(broadcast(offsets), Seq("__dr_pid"))
      .withColumn(as, (col("__dr_lr") + col("__dr_off")).cast("long"))
      .drop("__dr_pid", "__dr_lr", "__dr_off")
  }
}
