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
    val exploded = thin.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }
}
