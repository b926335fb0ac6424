package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the most recent right row with
  * `right.ts <= left.ts` in the same key group (SURVEY.md J9).
  *
  * Not efficiently expressible as a single Spark join: an equi-join on key
  * plus a range filter explodes each key group before re-aggregating. This is
  * the scalable composition instead — tag and union both sides, then one
  * window pass per key ordered by time fills each left row with the last-seen
  * right payload. Exactly ONE shuffle (hash by key), O(n log n) per-partition
  * sort, no intermediate blowup — the plan a 1000-executor cluster wants for
  * "latest event ≤ ts" at 100 TB. Skewed keys stay bounded: state per row is
  * the running payload only.
  *
  * Right rows sort before left rows at equal timestamps, so an exactly-tying
  * right row is visible to the left row (inclusive bound). Among right rows
  * with identical (key, ts), the winner is the one with the greatest payload
  * values (window ordering includes the payload columns for determinism).
  *
  * @param payload (rightColumn -> outputColumn) values to carry from the
  *                matched right row; output names must not collide with left.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[(String, String)]): DataFrame = {

    val payloadOut = payload.map(_._2)
    val keepLeft = left.columns.toSeq
    require(payloadOut.intersect(keepLeft).isEmpty, "payload output names collide with left columns")

    val l = payload.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      case (df, (in, out)) => df.withColumn(out, lit(null).cast(right.schema(in).dataType))
    }
    val rTagged = payload.foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))) {
      case (df, (in, out)) => df.withColumn(out, col(in))
    }
    val r = keepLeft.filterNot(rTagged.columns.contains).foldLeft(rTagged) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val cols = (Seq(key, "__ts", "__side") ++ keepLeft.filterNot(_ == key) ++ payloadOut).distinct
    val unioned = l.select(cols.map(col): _*).unionByName(r.select(cols.map(col): _*))

    val w = Window.partitionBy(col(key))
      .orderBy((Seq(col("__ts").asc, col("__side").asc) ++ payloadOut.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The payload is carried as ONE struct so a match fills all columns from
    // the same right row (independent last() calls could mix rows when a
    // payload value is legitimately null).
    val packed = unioned.withColumn("__p",
      when(col("__side") === 0, struct(payloadOut.map(col): _*)))
    val filled = packed.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(keepLeft.map(col) ++ payloadOut.map(o => col(s"__p.$o").as(o)): _*)
  }
}
