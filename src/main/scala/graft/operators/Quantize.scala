package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/bandwidth scale lever for vector
  * corpora. At 100 TB an `array<float>` embedding column is usually the
  * widest column in the table; symmetric int8 quantization cuts it 4× with
  * a per-vector scale, which is what makes billion-vector ANN sweeps
  * memory-bandwidth-feasible (the reference stores only primitive columns —
  * DesignDocument.md's fixed-width row model — so its analog is "narrow your
  * columns before they hit the scan").
  *
  * Everything here is a per-row narrow transform built from codegen'd
  * higher-order functions (`transform`/`aggregate`): no shuffle, no UDF, and
  * the expression arithmetic is plain IEEE-754 double ops (`abs`, `/`,
  * `floor`) so the DuckDB oracle reproduces it bit-exactly — `round()` is
  * deliberately avoided (engines disagree on tie policy; `floor(x + 0.5)`
  * is half-up-toward-+inf everywhere).
  *
  * Complements [[graft.functions.PqUtil]]: PQ is the sublinear-scan codebook
  * path; int8 is the exact-shape drop-in (same dimension, scalar dequant).
  */
object Quantize {

  /** Largest |element| as double (0.0 for an empty vector). */
  def absMax(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Symmetric int8 codes: q_i = floor(x_i/scale + 0.5) with
    * scale = absmax/127. A zero vector (absmax = 0) quantizes to all-zero
    * codes. |q_i| ≤ 127 by construction (|x_i| ≤ absmax ⇒ |x_i/scale| ≤
    * 127 + ~1e-14, which half-up rounding cannot push past 127).
    */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0L))
        .otherwise(floor(x.cast("double") / scale + lit(0.5)).cast("long")))

  /** Per-element |x_i − q_i·scale| maximum, scaled to integer nano-units
    * (floor(err·1e9)) so the result is exactly comparable across engines.
    * Bounded by scale/2 + float-noise; the d37 oracle gate proves it.
    */
  def maxAbsErrNanos(vec: Column, codes: Column, scale: Column): Column =
    aggregate(
      zip_with(vec, codes, (x, q) =>
        floor(abs(x.cast("double") - q.cast("double") * scale) * lit(1e9)).cast("long")),
      lit(0L), (acc, e) => greatest(acc, e))

  /** Attach int8 quantization columns: `scale` (double), `codes`
    * (array<long> in [-127,127]), plus integer summaries — `q_sum`, `q_min`,
    * `q_max`, `n_sat` (#codes at ±127, ≥1 for any non-zero vector), and
    * `max_err_e9` (reconstruction error in nanos). The summaries are what a
    * pipeline QA gate reads; they are all integers (or the bit-deterministic
    * scale) so the whole frame is oracle-hashable.
    */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    df.withColumn("scale", absMax(v) / lit(127.0))
      .withColumn("codes", int8Codes(v, col("scale")))
      .withColumn("q_sum", aggregate(col("codes"), lit(0L), (a, x) => a + x))
      .withColumn("q_min", array_min(col("codes")))
      .withColumn("q_max", array_max(col("codes")))
      .withColumn("n_sat",
        size(filter(col("codes"), c => abs(c) === 127L)).cast("long"))
      .withColumn("max_err_e9", maxAbsErrNanos(v, col("codes"), col("scale")))
  }
}
