package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Native 16-bit SimHash over whitespace tokens (one pass, no per-token
  * array allocations — replaces a HOF fold that dominated the d8 bench).
  *
  * EXACTLY reproduces the declarative spec in
  * [[TextFunctions.simhash16Hof]] and the DuckDB oracle
  * ([[TextFunctions.oracleSimhash16Sql]]): tokenization is `split(text, ' ')`
  * with trailing empties kept, bit b of a token is hex digit b of its md5
  * (digit >= '8' → +1 else -1, i.e. nibble value >= 8), document bit b is
  * `sum > 0`. Integer arithmetic only — no cross-engine float concerns.
  */
case class SimHash16Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_simhash16"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  /** Codegen stays inside WholeStageCodegen: the generated code makes one
    * call on this kernel rather than dropping the whole stage to an
    * interpreted projection (what CodegenFallback would do).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): Int = {
    val text = input.toString
    // Spark's split(text, " ") keeps trailing empty tokens (limit -1)
    val tokens = text.split(" ", -1)
    val counts = new Array[Int](16)
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val digest = md.digest(tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 16) {
        // hex digit b of the digest = high/low nibble of byte b/2
        val nibble =
          if ((b & 1) == 0) (digest(b >> 1) >> 4) & 0xf
          else digest(b >> 1) & 0xf
        counts(b) += (if (nibble >= 8) 1 else -1)
        b += 1
      }
      t += 1
    }
    var out = 0
    var b = 0
    while (b < 16) { if (counts(b) > 0) out |= 1 << b; b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
