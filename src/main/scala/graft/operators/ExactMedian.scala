package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group median, 100-TB-shaped.
  *
  * Spark's `median()`/`percentile()` aggregates buffer every group's values
  * in an in-memory ObjectHashAggregate buffer: map-side partials shuffle
  * whole value ARRAYS, and a group at 100 TB has to fit one executor's
  * heap. A per-group sort window (`row_number` over the raw rows) fixes the
  * memory bound (SortExec spills) but serializes each group's full data
  * through one task — a 33-TB sort if one group dominates.
  *
  * This operator instead reduces to a VALUE HISTOGRAM first: the only
  * operator that touches full data is a hash aggregate — parallel across
  * all cores with map-side combine — and the cumulative-count window runs
  * over DISTINCT values per group, bounded by the value domain, not the
  * row count. A value v with cumulative count `cum` covers sort ranks
  * `(cum-cnt, cum]`; the median is the mean of the values covering ranks
  * `ceil(n/2)` and `floor(n/2)+1` (the same rank twice for odd n, so the
  * mean degenerates to that value).
  */
object ExactMedian {

  /** Median of `valueCol` (numeric, cast to double) for every distinct
    * combination of `keys`. Output: keys columns + `med` (double). NULL
    * values are skipped, and — matching Spark's `median()` and ANSI
    * `median` exactly — a group whose values are ALL NULL still appears in
    * the output, with a NULL median. (NULL values ride the same histogram
    * with a zero count rather than being pre-filtered, so keeping those
    * groups costs no extra scan or join.)
    */
  def groupedMedian(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val part = keys.map(col)
    val wcum = Window.partitionBy(part: _*).orderBy(col("__mv_v"))
    val wall = Window.partitionBy(part: _*)
    df.groupBy(part :+ v.as("__mv_v"): _*).agg(count(lit(1)).as("__mv_rows"))
      // NULL values carry count 0: they never shift a cumulative rank and
      // never cover one, but their row keeps an all-NULL group visible
      .withColumn("__mv_cnt",
        when(col("__mv_v").isNotNull, col("__mv_rows")).otherwise(lit(0L)))
      .withColumn("__mv_cum", sum("__mv_cnt").over(wcum))
      .withColumn("__mv_n", sum("__mv_cnt").over(wall))
      // `div` (integer division) — Spark's `/` on integers yields DOUBLE,
      // and a rank filter against 2.5 would silently drop the lower middle
      .withColumn("__mv_lo", expr("(__mv_n + 1) div 2"))
      .withColumn("__mv_hi", expr("__mv_n div 2 + 1"))
      // keep rank-covering rows; additionally keep the (single) NULL-value
      // row of a group with zero non-NULL values, which emits a NULL median
      .filter(expr("(__mv_cum - __mv_cnt < __mv_lo AND __mv_lo <= __mv_cum) OR (__mv_cum - __mv_cnt < __mv_hi AND __mv_hi <= __mv_cum) OR __mv_n = 0"))
      .withColumn("__mv_mid",
        when(expr("__mv_n = 0"), lit(null).cast("double")).otherwise(
          (when(expr("__mv_cum - __mv_cnt < __mv_lo AND __mv_lo <= __mv_cum"), col("__mv_v")).otherwise(lit(0.0)) +
            when(expr("__mv_cum - __mv_cnt < __mv_hi AND __mv_hi <= __mv_cum"), col("__mv_v")).otherwise(lit(0.0))) / 2))
      .groupBy(part: _*).agg(sum("__mv_mid").as("med"))
  }
}
