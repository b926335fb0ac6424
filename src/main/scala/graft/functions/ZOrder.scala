package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Z-order (Morton) clustering key — multi-dimensional data skipping for
  * compaction (SURVEY.md §4: the sorted-column analog of Kudu range-
  * partition pruning, extended to MORE THAN ONE column).
  *
  * A linear sort by (A, B) gives tight parquet row-group min/max stats on A
  * but leaves B's stats spanning nearly the full domain in every row group
  * — a predicate on B alone prunes nothing. Interleaving the bits of
  * quantile-bucket indices of A and B into one sort key makes row groups
  * cover small HYPER-RECTANGLES of the (A, B) space, so a predicate on ANY
  * clustered dimension overlaps only ~N^((d-1)/d) of the row groups
  * (Morton 1966; the layout Delta Lake's OPTIMIZE ZORDER BY and Iceberg's
  * sort-order rewrite use).
  *
  * Quantile bucketing (not min/max linear scaling) keeps the key
  * skew-robust: each bucket holds ~1/2^bits of the DATA, not of the value
  * range, so a heavy-hitter value cannot collapse the interleave into a
  * single bucket. Boundaries come from one `approxQuantile` pass
  * (Greenwald–Khanna, driver-sized result); they shape LAYOUT only —
  * correctness never depends on them, so approximation is free.
  *
  * Both expressions are codegen'd and null-safe (null sorts as bucket 0,
  * matching NULLS FIRST of a plain sort).
  */
object ZOrder {

  /** Bits per dimension: 8 (256 quantile buckets) caps boundary-array cost
    * while far out-resolving row-group granularity (a 100-TB table at
    * 128 MB row groups is ~10^6 row groups total; 256^2+ cells already
    * exceed that per 2-3 dimensions).
    */
  val BitsPerCol = 8

  /** The z-key column for `df` over `cols`: bucketize each column by its
    * own quantiles, interleave the bucket bits. One `approxQuantile` scan
    * per call computes ALL columns' boundaries together.
    */
  def zkey(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size * BitsPerCol <= 62,
      s"z-order supports 1..7 columns, got ${cols.size}")
    val probes = (1 until (1 << BitsPerCol)).map(_.toDouble / (1 << BitsPerCol)).toArray
    val asDouble = cols.map(c => df.col(c).cast(DoubleType))
    val doubled = df.select(asDouble.zipWithIndex.map { case (c, i) => c.as(s"__z$i") }: _*)
    val bounds = doubled.stat.approxQuantile(
      (0 until cols.size).map(i => s"__z$i").toArray, probes, 0.001)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bucketIds = asDouble.zip(bounds).map { case (c, b) =>
      ColumnBridge.column(QuantileBucketId(ColumnBridge.expression(c), b))
    }
    ColumnBridge.column(InterleaveBits(
      bucketIds.map(ColumnBridge.expression), BitsPerCol))
  }
}

/** Index of the quantile bucket containing the value: binary search over
  * the sorted boundary array (ties and duplicate boundaries resolve
  * deterministically — same array, same key, same index). NULL and NaN
  * map to bucket 0: layout choice only, mirroring NULLS FIRST.
  */
case class QuantileBucketId(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_bucket_id"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input, got ${child.dataType.simpleString}")

  private def bucket(v: Double): Int = {
    if (v.isNaN) return 0
    val i = java.util.Arrays.binarySearch(boundaries, v)
    if (i >= 0) i else -i - 1
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else bucket(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val b = ctx.addReferenceObj("zBoundaries", boundaries, "double[]")
    val c = child.genCode(ctx)
    val i = ctx.freshName("bs")
    ev.copy(isNull = FalseLiteral, code =
      code"""
        ${c.code}
        int ${ev.value} = 0;
        if (!${c.isNull} && !Double.isNaN(${c.value})) {
          int $i = java.util.Arrays.binarySearch($b, ${c.value});
          ${ev.value} = $i >= 0 ? $i : -$i - 1;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Interleave the low `bits` bits of each INT child, most-significant bit
  * first, round-robin across children — the Morton code. Children must all
  * be in [0, 2^bits); output is a non-negative LONG usable directly as a
  * sort key.
  */
case class InterleaveBits(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.nonEmpty && children.size * bits <= 62,
    s"interleave of ${children.size} x $bits bits exceeds a long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "z_interleave"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires INT children")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map { ch =>
      val v = ch.eval(input)
      if (v == null) 0 else v.asInstanceOf[Int]
    }
    var out = 0L
    var bit = bits - 1
    while (bit >= 0) {
      var c = 0
      while (c < vals.size) {
        out = (out << 1) | ((vals(c) >>> bit) & 1)
        c += 1
      }
      bit -= 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val codes = children.map(_.genCode(ctx))
    val vs = children.indices.map(i => ctx.freshName(s"zv$i"))
    val loadVals = codes.zip(vs).map { case (c, v) =>
      s"final int $v = ${c.isNull} ? 0 : ${c.value};"
    }.mkString("\n")
    val interleave = (bits - 1 to 0 by -1).flatMap { bit =>
      vs.map(v => s"${ev.value} = (${ev.value} << 1) | (($v >>> $bit) & 1);")
    }.mkString("\n")
    val childCode = codes.map(_.code.toString).mkString("\n")
    ev.copy(isNull = FalseLiteral, code =
      code"""
        $childCode
        $loadVals
        long ${ev.value} = 0L;
        $interleave
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
