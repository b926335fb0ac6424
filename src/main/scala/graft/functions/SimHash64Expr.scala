package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Native 64-bit SimHash over whitespace tokens — the corpus-scale signature
  * (round-1 verdict: the 16-bit space has only 65,536 buckets, so at corpus
  * scale nearly everything collides; 64 bits is the standard near-dup
  * signature width, cf. Manku/Jain/Das Sarma, "Detecting Near-Duplicates for
  * Web Crawling", WWW 2007).
  *
  * Bit lattice: bit b (0..63) of a token is bit `3-(b%4)` of hex digit `b/4`
  * of the token's md5 — i.e. the first 8 digest bytes MSB-first. This extends
  * the 16-bit scheme (which used only the top bit of each nibble) and is
  * recomputable exactly in DuckDB ([[TextFunctions.oracleSimhash64Sql]]) and
  * declaratively in Spark ([[TextFunctions.simhash64Hof]], cross-checked
  * bit-equal in TextEdgeSpec). Document bit b is `sum over tokens of ±1 > 0`.
  * Integer arithmetic only — no cross-engine float concerns.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  /** Codegen stays inside WholeStageCodegen: one call on this kernel, no
    * interpreted-projection fallback for the enclosing stage.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): Long = {
    val text = input.toString
    // Spark's split(text, " ") keeps trailing empty tokens (limit -1)
    val tokens = text.split(" ", -1)
    val counts = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val digest = md.digest(tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 64) {
        // bit b = bit (7-(b&7)) of digest byte b/8 == bit 3-(b%4) of hex digit b/4
        val bit = (digest(b >> 3) >> (7 - (b & 7))) & 1
        counts(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
