package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native Catalyst expression computing the 8 byte-level statistics of a
  * binary column in one pass: `[n, mean, min, max, first, last, middle,
  * sum mod 997]` — the deterministic stand-in feature vector of
  * [[graft.pipeline.Multimodal]]'s stubbed decoder.
  *
  * Why a custom expression: the arithmetic is a tight per-byte loop over
  * opaque binary — spelled as SQL higher-order functions it would run
  * INTERPRETED per element; spelled as `mapPartitions` it leaves
  * whole-stage codegen entirely. This participates in codegen via
  * `doGenCode` and keeps the scan → stats pipeline in one generated stage.
  */
case class ByteStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "byte_stats"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_stats requires a binary argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    ByteStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteStats = copy(newChild)
}

object ByteStats {

  /** One pass over the bytes; matches the stub decoder's output exactly. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Double](8)
    val n = bytes.length
    if (n > 0) {
      var sum = 0L; var min = 255; var max = 0
      var i = 0
      while (i < n) {
        val b = bytes(i) & 0xff
        sum += b
        if (b < min) min = b
        if (b > max) max = b
        i += 1
      }
      out(0) = n.toDouble
      out(1) = sum.toDouble / n
      out(2) = min.toDouble
      out(3) = max.toDouble
      out(4) = (bytes(0) & 0xff).toDouble
      out(5) = (bytes(n - 1) & 0xff).toDouble
      out(6) = (bytes(n / 2) & 0xff).toDouble
      out(7) = (sum % 997).toDouble
    }
    new GenericArrayData(out)
  }

  /** Register `byte_stats(expr)` for SQL fragments. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_stats", exprs => ByteStats(exprs.head), "built-in")
}
