package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization (NFC/NFD/NFKC/NFKD)
  * — the first step of any text-normalization pipeline: crawl text mixes
  * precomposed (`é` U+00E9) and decomposed (`e` + U+0301) spellings of the
  * SAME string, so exact dedup, token counting, and fingerprinting all
  * disagree with themselves until the corpus is on one canonical form.
  *
  * Why a custom expression: Spark has no normalization built-in (a Scala
  * UDF would box every row and fall out of whole-stage codegen). The
  * normalization form is a CONSTRUCTOR argument, not a child expression —
  * it's fixed at plan time, so codegen emits a direct call with a constant
  * form and the per-row fast path is `Normalizer.isNormalized` (true for
  * ASCII-heavy corpora) before any allocation.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize requires a string argument, got ${child.dataType}")
    else if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (expected NFC/NFD/NFKC/NFKD)")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[functions] val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Register `unicode_normalize(expr, 'NFC')` for SQL fragments; the form
    * argument must be a foldable string literal. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", { exprs =>
        require(exprs.length == 2, "unicode_normalize(expr, form)")
        val form = exprs(1) match {
          case lit if lit.foldable =>
            lit.eval(null).asInstanceOf[UTF8String].toString
          case other =>
            throw new IllegalArgumentException(
              s"unicode_normalize form must be a literal, got $other")
        }
        UnicodeNormalize(exprs.head, form)
      }, "built-in")
}
