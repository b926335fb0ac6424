package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic lifecycle for the engine's materialized intermediates —
  * staged (persisted) frames and localCheckpoint blocks.
  *
  * Why this exists (round-16 verdict item 1): the driver's bench runs every
  * declared query ~13 times in ONE JVM. Operators that persist or
  * localCheckpoint a frame per CALL and rely on GC + the async
  * ContextCleaner to release it leak thousands of block sets across a
  * sweep — the round-16 bench died (rc=124 at 32 AND 8 cpus, an analysis
  * INTERNAL_ERROR mid-sweep) under exactly that pressure: the block store
  * fills with orphaned checkpoint blocks ("Block rdd_N already exists"
  * warnings), and every leaked `.cache()` adds a CacheManager entry that
  * EVERY later query's analysis walks for plan matching ("Asked to cache
  * already cached data"). A long-lived driver must release what it
  * materializes the moment it is provably dead — GC is not a resource
  * manager.
  *
  * Two disciplines, by frame kind:
  *
  *  - PERSISTED frames ([[stage]]): one slot per operator+side; each call
  *    releases the previous call's frame. Unpersisting a cached frame is
  *    always SAFE (a surviving reader recomputes, never fails), so slot
  *    eviction needs no liveness proof.
  *  - CHECKPOINTED frames ([[free]]/[[handoff]]): a localCheckpoint
  *    TRUNCATES lineage, so its blocks cannot be recomputed — freeing a
  *    live frame fails its reader loudly. [[free]] is for frames the
  *    operator can PROVE dead (a loop's superseded round, a static edge
  *    table after the result materializes). [[handoff]] is for the frame
  *    RETURNED to the caller: it is released when the SAME slot hands off
  *    its next frame, i.e. at the operator's next call — safe because
  *    callers (bench sweeps, verify, the specs) consume a result before
  *    invoking the operator again; an operator output is never held across
  *    a later call to the same operator.
  */
object Staged {

  /** Staged persisted frames, one slot per operator+side: persisting
    * without ever unpersisting would leak a cached copy per CALL. Each new
    * call releases the previous frame for its slot — at most one cached
    * copy per slot per session. `unpersist(blocking = false)` is safe
    * against a concurrent reader of the old frame: missing blocks are
    * recomputed, never wrong.
    *
    * Release order matters (round-6 fix): the previous slot is unpersisted
    * BEFORE the new frame is persisted. Spark's CacheManager keys cache
    * entries by plan, so the reverse order (persist-then-unpersist) dropped
    * the very entry the new persist had just re-registered whenever the two
    * calls carried the same plan. Unpersist-first keeps each call FRESH —
    * an internal cache must never serve a previous corpus snapshot after
    * the input files were rewritten — while the call's own consumers share
    * one materialization.
    */
  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def stage(slot: String, df: DataFrame): DataFrame =
    // atomic per slot: a remove→persist→put sequence under two concurrent
    // callers could interleave and leak a persisted frame nobody tracks;
    // compute() serializes the swap on the slot's bin
    slots.compute(slot, (_, old) => {
      if (old != null) old.unpersist(false)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** The materialized RDD behind a localCheckpointed frame (None when the
    * plan is not a bare LogicalRDD — e.g. a projection over one).
    */
  private def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Release the blocks behind a localCheckpointed frame NOW. The caller
    * must prove the frame — and every lazy plan built over it — is dead:
    * checkpoint blocks cannot be recomputed, so a consumer of a freed
    * frame fails loudly (the correct trade for loop-internal frames whose
    * liveness is structural). No-op for non-checkpoint plans.
    */
  def free(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(false))

  /** Track a checkpointed frame HANDED TO THE CALLER: the previous frame
    * handed off under `slot` is released now, the new one when the slot
    * next turns over. Bounds leaked result checkpoints to one per slot.
    * Call it AFTER every internal frame derived from the previous result
    * has been materialized (the loop operators hand off as their last
    * step, so this holds by construction).
    */
  private val handed =
    new java.util.concurrent.ConcurrentHashMap[String, RDD[_]]()

  def handoff(slot: String, df: DataFrame): DataFrame = {
    checkpointRdd(df).foreach { rdd =>
      val old = handed.put(slot, rdd)
      if (old != null && (old ne rdd)) old.unpersist(false)
    }
    df
  }
}
