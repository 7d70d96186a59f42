package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the engine's 60-bit md5 hash of a
  * string — bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` (the
  * first 15 hex chars of the md5 digest as an integer; see
  * [[graft.pipeline.Hashing]]) and to the DuckDB oracle fragment.
  *
  * Why a custom expression: the hash runs inside higher-order-function
  * lambdas (per shingle / per token), which Spark evaluates INTERPRETED —
  * the built-in chain allocates a 32-char hex string, substrings it, and
  * parses base-16 per call. This expression digests straight to a long
  * (no hex round-trip) in `nullSafeEval`, and also participates in
  * whole-stage codegen via `doGenCode` when used outside lambdas.
  *
  * The 60-bit value is the first 7.5 digest bytes big-endian, i.e.
  * `(first 8 bytes as u64) >>> 4`.
  */
case class Md5Long(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5long"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5long requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Long.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long = copy(newChild)
}

object Md5Long {
  private val digestPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s), matching the hex-prefix semantics. */
  def hash(s: UTF8String): Long = {
    val md = digestPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 8 bytes big-endian, dropped low nibble = first 15 hex chars
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  /** Register `md5long(expr)` in the session's function registry so it is
    * usable inside SQL fragments and higher-order-function lambdas.
    * Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5long", exprs => Md5Long(exprs.head), "built-in")
}
