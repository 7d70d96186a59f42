package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression computing
  * `Σ_i round(vec[offset+i] · 1000) · weights[i]` over a float/double
  * array — the quantize-then-dot kernel of the PQ encoder
  * ([[graft.pipeline.Similarity.pqEncode]]) with the quantization FUSED
  * into the loop and the weight vector inlined as a constant.
  *
  * Why a custom expression: the composable spelling
  * `dotl(transform(vec, x -> cast(round(x*1000) as bigint)), lit(w))`
  * puts a higher-order function in the projection; HOFs have no codegen,
  * so the whole encode projection falls back to interpreted eval, where
  * CollapseProject has inlined the transform into EVERY of the m×ksub
  * cost expressions — measured 15 s for a 5k-vector encode at sf0.1
  * (the same re-expansion pathology documented on
  * [[graft.pipeline.Dedup.minhashColumns]]). This kernel keeps the whole
  * projection inside whole-stage codegen: per (subspace, centroid) it is
  * a bounded primitive loop, no allocation.
  *
  * Rounding matches `round(x * 1000)` on a FLOAT element exactly: the
  * product is computed in float precision, then rounded HALF_UP (away
  * from zero) — the semantics Spark's `Round` applies and DuckDB's
  * `round()` mirrors. Null elements null the result (as the transform
  * spelling would); a vector shorter than `offset + weights.length`
  * contributes only its available elements (fixed-dim inputs never hit
  * this).
  */
case class QuantDotLong(child: Expression, offset: Int, weights: Seq[Long])
    extends UnaryExpression {
  require(offset >= 0, s"offset must be >= 0, got $offset")
  require(weights.nonEmpty, "weights must be non-empty")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quantdotl"

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case t               => t
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantdotl requires array<float> or array<double>, got $t")
    }

  /** HALF_UP (away from zero) on the already-computed product. */
  @inline private def roundHalfUp(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(weights.length, a.numElements() - offset)
    if (n <= 0) return 0L
    val isFloat = elemType == FloatType
    var s = 0L
    var i = 0
    while (i < n) {
      val idx = offset + i
      if (a.isNullAt(idx)) return null
      val p: Double =
        if (isFloat) (a.getFloat(idx) * 1000.0f).toDouble
        else a.getDouble(idx) * 1000.0
      s += roundHalfUp(p) * weights(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights.toArray, "long[]")
    val isFloat = elemType == FloatType
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val p = ctx.freshName("p")
      val idx = ctx.freshName("idx")
      val prod =
        if (isFloat) s"(double)($a.getFloat($idx) * 1000.0f)"
        else s"$a.getDouble($idx) * 1000.0"
      s"""
         |int $n = java.lang.Math.min($wRef.length, $a.numElements() - $offset);
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $idx = $offset + $i;
         |  if ($a.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |  double $p = $prod;
         |  $sum += ($p >= 0 ? (long) java.lang.Math.floor($p + 0.5)
         |                   : (long) java.lang.Math.ceil($p - 0.5)) * $wRef[$i];
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantDotLong =
    copy(child = newChild)
}
