package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * memory-bandwidth scale path for ANN: a d-dim float vector (d×4 bytes)
  * compresses to m subspace code indices (m bytes at ksub ≤ 256), and
  * approximate scoring reads the codes against a per-query lookup table
  * instead of touching float payloads.
  *
  * Codebooks ride the expressions as plan constants — m × ksub × (d/m)
  * floats (a few KB at any realistic setting; d=1024, m=64, ksub=256 is
  * 1 MB, still constant in corpus size).
  *
  * All three kernels are CodegenFallback leaves: data-dependent loops over
  * array cells with nothing to gain from inlining; the surrounding
  * join/window operators stay in whole-stage codegen.
  */
object PqUtil {
  /** L2-nearest centroid index per subspace (standard PQ encoding). */
  def encode(vec: Array[Float], codebooks: Array[Array[Array[Float]]]): Array[Int] = {
    val m = codebooks.length
    val sub = vec.length / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = codebooks(s)
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        var d = 0.0; var i = 0
        while (i < sub) {
          val diff = vec(s * sub + i) - cents(j)(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    out
  }

  /** Per-query ADC lookup table: lut(s)(j) = dot(q_sub_s, centroid_sj). */
  def lut(vec: Array[Float], codebooks: Array[Array[Array[Float]]]): Array[Array[Float]] = {
    val m = codebooks.length
    val sub = vec.length / m
    Array.tabulate(m) { s =>
      val cents = codebooks(s)
      Array.tabulate(cents.length) { j =>
        var d = 0.0; var i = 0
        while (i < sub) { d += vec(s * sub + i) * cents(j)(i); i += 1 }
        d.toFloat
      }
    }
  }
}

private[functions] trait PqArrayHelpers {
  protected def floats(a: ArrayData): Array[Float] = {
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = a.getFloat(i); i += 1 }
    out
  }
}

/** vec: array<float> → array<int> subspace codes. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback with PqArrayHelpers {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      PqUtil.encode(floats(input.asInstanceOf[ArrayData]), codebooks))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** vec: array<float> → array<array<float>> per-subspace dot-product LUT. */
case class PqLutExpr(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with CodegenFallback with PqArrayHelpers {

  override def dataType: DataType =
    ArrayType(ArrayType(FloatType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      PqUtil.lut(floats(input.asInstanceOf[ArrayData]), codebooks)
        .map(row => new GenericArrayData(row): Any))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (lut, codes) → approximate inner product: sum_s lut(s)(codes(s)).
  * m lookups + adds per corpus row — the whole point of PQ: scoring cost
  * is independent of the vector dimension.
  */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(FloatType, _), _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<float>>, array<int>), got " +
        s"${l.simpleString}, ${r.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    var acc = 0.0
    var s = 0
    val m = codes.numElements()
    while (s < m) {
      acc += lut.getArray(s).getFloat(codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
