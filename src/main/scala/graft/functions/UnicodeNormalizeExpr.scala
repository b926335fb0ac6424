package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen expression — the first
  * transform of any serious text-cleaning pipeline (the same visible string
  * can arrive as dozens of byte sequences: e + combining acute vs
  * precomposed é, full-width forms, ligatures), and exact dedup /
  * fingerprinting upstream of it silently fragments. Spark ships no
  * normalizer builtin; a Scala UDF would break whole-stage codegen around
  * it, so this is a kernel-object expression like [[FingerprintMd5Expr]].
  *
  * Forms: NFC/NFD (canonical — é ↔ e+◌́, visual identity preserved) and
  * NFKC/NFKD (compatibility — additionally folds ﬁ→fi, ①→1, full-width →
  * ASCII; the form LLM-corpus dedup usually wants). Already-normalized
  * input (the overwhelming hot path on real corpora) returns the original
  * UTF8String without re-encoding — `Normalizer.isNormalized` is a cheap
  * scan with no allocation.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String = "NFC")
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_${form.toLowerCase}"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(form))
      TypeCheckResult.TypeCheckFailure(s"unknown normalization form $form")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
