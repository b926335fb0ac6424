package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Native k-hash MinHash signature: for each seed `0 until k`, the minimum
  * `md5("<seed>:" + token)` over whitespace tokens, hex-concatenated with
  * `|` — bit-identical to the declarative spec
  * `concat_ws("|", (0 until k).map(seed => array_min(transform(split(text,
  * " "), t => md5(concat(lit(s"$seed:"), t))))))`
  * ([[TextFunctions.minhashSignatureHof]], cross-checked in TextEdgeSpec)
  * and to the DuckDB oracle ([[TextFunctions.oracleMinhashSignatureSql]]).
  *
  * One pass over the tokens with k digests each, no per-seed array
  * materialization and no HOF interpretation — the signature feeds dedup
  * grouping keys (d14 pipeline, d2 clusters), where the interpreted HOF was
  * the dominant CPU cost. Tokenization matches Spark `split(text, " ")`
  * exactly (trailing empty tokens kept); the running minimum compares raw
  * digest bytes unsigned, which orders identically to the lexicographic hex
  * comparison `array_min` performs.
  */
case class MinHashSigExpr(child: Expression, k: Int = 4)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input and k >= 1")

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(k)(s => s"$s:".getBytes(StandardCharsets.UTF_8))

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
    // split(text, " ") semantics: regex split, trailing empties KEPT
    val toks = input.toString.split(" ", -1)
    val best = Array.ofDim[Array[Byte]](k)
    var t = 0
    while (t < toks.length) {
      val tokBytes = toks(t).getBytes(StandardCharsets.UTF_8)
      var s = 0
      while (s < k) {
        md.reset()
        md.update(seedPrefixes(s))
        md.update(tokBytes)
        val d = md.digest()
        if (best(s) == null || lessUnsigned(d, best(s))) best(s) = d
        s += 1
      }
      t += 1
    }
    val hex = new StringBuilder(k * 33)
    var s = 0
    while (s < k) {
      if (s > 0) hex.append('|')
      Md5Kernel.appendHex(hex, best(s))
      s += 1
    }
    UTF8String.fromString(hex.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
