package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Native winnowing-style fingerprint: minimum md5 (hex) over character
  * `n`-gram shingles, one digest pass per shingle with no per-row array
  * materialization — replaces the interpreted HOF
  * (`array_min(transform(charShingles(text, 8), md5))`) that was the
  * round-1 bench's slowest scalar (d10, 2.1 s at sf0.1). The HOF remains as
  * the declarative spec ([[TextFunctions.fingerprintHof]], cross-checked in
  * TextEdgeSpec); texts shorter than `n` code points hash the whole text,
  * exactly like `charShingles`' fallback.
  *
  * Shingling is by Unicode code point (Spark's `substring` semantics — a
  * surrogate-pair emoji is ONE character), and the running minimum compares
  * raw digest bytes unsigned, which orders identically to the lexicographic
  * hex comparison `array_min` performs.
  */
case class FingerprintMd5Expr(child: Expression, n: Int = 8)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input and n >= 1")

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  import Md5Kernel.lessUnsigned

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  /** Codegen stays inside WholeStageCodegen: one call on this kernel, no
    * interpreted-projection fallback for the enclosing stage.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    val cps = s.codePoints().toArray
    var best: Array[Byte] = null
    if (cps.length < n) {
      md.reset()
      best = md.digest(s.getBytes(StandardCharsets.UTF_8))
    } else {
      var i = 0
      while (i <= cps.length - n) {
        md.reset()
        val shingle = new String(cps, i, n)
        val d = md.digest(shingle.getBytes(StandardCharsets.UTF_8))
        if (best == null || lessUnsigned(d, best)) best = d
        i += 1
      }
    }
    val hex = new StringBuilder(32)
    Md5Kernel.appendHex(hex, best)
    UTF8String.fromString(hex.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
