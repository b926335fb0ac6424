package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md "salting for skew").
  *
  * AQE's skew-join splitting is the first line of defense and needs no code;
  * salting is the explicit fallback when a handful of hot keys dominate a
  * shuffle (the classic power-law key problem at 100 TB). The fat side gets a
  * deterministic salt in [0, salts) derived from a spreader column — NOT
  * `rand()`, so retried tasks recompute identical salts and the join stays
  * exactly-once under speculation. The thin side is exploded ×salts so every
  * (key, salt) partition finds its match.
  *
  * Result multiset is identical to `fat.join(thin, keys)` — verified in
  * SkewJoinSpec — while the hot key's rows spread over `salts` reducers.
  */
object SkewJoin {

  def saltedInnerJoin(
      fat: DataFrame, thin: DataFrame, keys: Seq[String],
      spreader: String, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val salted = fat.withColumn("__salt", pmod(hash(col(spreader)), lit(salts)))
    // SHUFFLE_HASH pin: salting exists for thin sides too big to broadcast
    // (a broadcastable dim needs no skew handling — broadcast joins don't
    // shuffle on the key at all). Left unpinned, Catalyst sees the
    // pre-explode size estimate and BROADCASTS the ×salts blowup: a
    // single-threaded |thin|×salts hash-table build per query (measured 8 s
    // on a 2.4M-row exploded dim that shuffle-joins in under 1 s), and at
    // real scale a driver/executor OOM. The hint keeps the join in the
    // shuffled path the salt was designed to spread, building the hash
    // table from the exploded side's per-partition slice.
    val exploded = thin.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)))).hint("shuffle_hash")
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }

  /** Salt ONLY the hot keys — the production form of [[saltedInnerJoin]].
    *
    * Exploding the whole thin side ×salts is wasteful when (as in any
    * power-law distribution) only a handful of keys are actually hot: at
    * 100 TB a thin side of 10⁸ dim rows ×16 salts is 1.6×10⁹ shuffled rows
    * to fix a skew that lives in maybe 100 keys. Here hot keys are detected
    * with a keys-only aggregation over the fat side (map-side combine, so
    * the detection shuffle carries one (key, count) pair per map partition
    * per distinct key — never payloads), and the hot set is broadcast to
    * split both inputs:
    *
    *   - hot slice:  salted join (hot fat rows spread over `salts` reducers;
    *     only the hot thin rows are exploded — bounded by |hot| × salts)
    *   - cold slice: plain shuffled join, untouched keys keep their normal
    *     single-reducer path (AQE still free to pick broadcast/SMJ)
    *
    * Inner-join semantics make the union exact: hot and cold key sets are
    * disjoint, so every matched pair lands in exactly one slice. Result
    * multiset is identical to `fat.join(thin, keys)` — verified against a
    * planted-skew oracle in ScaleOpsSpec and the j12 DuckDB oracle.
    *
    * `hotThreshold` is the fat-side row count per key above which a key is
    * salted; size it to a few × the rows-per-reducer you can tolerate. The
    * detection pass is exact; at extreme scale a sampled detection
    * (`fat.sample(f)` with threshold×f) buys a cheaper pass at the cost of
    * missing borderline keys — borderline keys are precisely the ones that
    * don't need salting.
    */
  def saltedInnerJoinHotKeys(
      fat: DataFrame, thin: DataFrame, keys: Seq[String],
      spreader: String, salts: Int = 16, hotThreshold: Long = 1000000L): DataFrame = {
    require(salts > 0 && hotThreshold > 0)
    val keyCols = keys.map(col)
    val hot = fat.groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > hotThreshold)
      .select(keyCols: _*)
    val hotB = broadcast(hot)
    val saltedHot = saltedInnerJoin(
      fat.join(hotB, keys, "left_semi"),
      thin.join(hotB, keys, "left_semi"),
      keys, spreader, salts)
    val plainCold = fat.join(hotB, keys, "left_anti").join(thin, keys)
    saltedHot.unionByName(plainCold)
  }
}
