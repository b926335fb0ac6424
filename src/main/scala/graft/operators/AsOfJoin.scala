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
  * NULL timestamps (both variants, asserted identical in OperatorSpec):
  * a right row with a null timestamp can never be "the most recent ≤ ts"
  * and is dropped; a left row with a null timestamp survives with a null
  * payload (no right row is ≤ an unknown time).
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
      right.filter(col(rightTs).isNotNull) // null-ts right rows never match
        .withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))) {
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
    backwardFill(unioned, keepLeft, payloadOut, w)
  }

  /** Broadcast variant for a SMALL right side (a dimension timeline): the
    * right rows ship to every executor as a sorted per-key index and each
    * left partition binary-searches it — the LEFT side takes NO shuffle at
    * all (vs one in [[backward]]). Use when right fits in executor memory;
    * semantics identical to [[backward]] (inclusive bound, greatest-payload
    * tie-break), asserted in OperatorSpec.
    *
    * Implementation is `mapPartitions` over rows (SURVEY.md preference (d)) —
    * justified here because the per-partition state is the broadcast index,
    * which no join/window formulation exploits without shuffling the left.
    */
  def backwardBroadcast(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[(String, String)]): DataFrame = {
    val spark = left.sparkSession
    val payloadOut = payload.map(_._2)
    require(payloadOut.intersect(left.columns.toSeq).isEmpty,
      "payload output names collide with left columns")
    val rightCols = Seq(key, rightTs) ++ payload.map(_._1)
    val rightRows = right.filter(col(rightTs).isNotNull) // same rule as [[backward]]
      .select(rightCols.distinct.map(col): _*).collect()
    val tsIdx = rightCols.distinct.indexOf(rightTs)
    val keyIdx = rightCols.distinct.indexOf(key)
    val payIdx = payload.map { case (in, _) => rightCols.distinct.indexOf(in) }
    // per-key timeline sorted by (ts, payload...) — same tie-break as the
    // window variant (ascending payload, nulls first, greatest wins as last)
    val payloadOrdering: Ordering[Seq[Any]] = (a: Seq[Any], b: Seq[Any]) =>
      a.zip(b).iterator.map {
        case (null, null) => 0
        case (null, _) => -1
        case (_, null) => 1
        case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
      }.find(_ != 0).getOrElse(0)
    val index: Map[Any, Array[(Long, Seq[Any])]] = rightRows
      .groupBy(_.get(keyIdx))
      .map { case (k, rows) =>
        k -> rows.map { r =>
          (r.getTimestamp(tsIdx).getTime, payIdx.map(r.get))
        }.sortBy(identity)(Ordering.Tuple2(Ordering.Long, payloadOrdering)).toArray
      }
    val bIndex = spark.sparkContext.broadcast(index)

    val leftSchema = left.schema
    val outSchema = org.apache.spark.sql.types.StructType(
      leftSchema.fields ++ payload.map { case (in, out) =>
        right.schema(in).copy(name = out, nullable = true)
      })
    val keyOrd = leftSchema.fieldIndex(key)
    val tsOrd = leftSchema.fieldIndex(leftTs)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    left.mapPartitions { it =>
      val idx = bIndex.value
      it.map { row =>
        var ans = -1
        var timeline = Array.empty[(Long, Seq[Any])]
        if (!row.isNullAt(tsOrd)) { // null-ts left row → null payload
          timeline = idx.getOrElse(row.get(keyOrd), Array.empty[(Long, Seq[Any])])
          val t = row.getTimestamp(tsOrd).getTime
          // rightmost entry with ts <= t (ties within equal ts resolved by
          // the sort above: the LAST, i.e. greatest payload, wins)
          var lo = 0; var hi = timeline.length - 1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (timeline(mid)._1 <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
          }
        }
        val pay: Seq[Any] =
          if (ans >= 0) timeline(ans)._2 else payload.map(_ => null)
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ pay)
      }
    }(enc)
  }

  private def backwardFill(
      unioned: DataFrame, keepLeft: Seq[String], payloadOut: Seq[String],
      w: org.apache.spark.sql.expressions.WindowSpec): DataFrame = {
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
