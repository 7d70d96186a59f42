package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a document's PACKED LSH band
  * hashes from its shingle-hash array in one compiled per-row loop —
  * value-identical (spec-pinned) to the explode + groupBy
  * `minhashColumns`/`bandTable` spelling AND to the per-row
  * `bandHashesExpr` HOF spelling:
  *
  *   mh_j  = min over h in sh of (permA(j) · (h mod P) + permB(j)) mod P
  *   band_b = mh_{b·r} · P + mh_{b·r+1}              (r ≤ 2, exact)
  *          | fold_{k} (acc · P + mh_{b·r+k}) mod PackMod   (r > 2)
  *
  * Why: minhash is a PER-ROW function of the row's own shingle set, but
  * the batch spelling exploded every shingle (corpus × ~300 rows), ran
  * `perms` min-aggregates over a 105-field aggregation buffer, and paid
  * the exchange — ~1.2 s warm of every near-dup gate at sf0.1, repeated
  * at every one of the nine band-table build sites. The HOF spelling
  * avoids the explode but Spark evaluates lambda bodies INTERPRETED
  * (measured ~400 s at sf0.1 in r12). This expression is the third
  * spelling: a tight JVM loop (compiled, whole-stage-codegen'd via a
  * static call like [[Md5Long]]), no explode, no aggregation buffer, no
  * shuffle — per-row cost identical arithmetic, evaluated once.
  *
  * All operands stay in safe ranges: h is the 60-bit non-negative
  * [[Md5Long]] value, P = 2³¹−1, permA/permB ∈ [0, P), so every
  * intermediate is non-negative and < 2⁶³ (`%` ≡ `pmod`; the r > 2 fold
  * keeps acc < PackMod with PackMod·P + P < 2⁶³ — the bandTable
  * invariant).
  *
  * An EMPTY (or null) shingle array yields a NULL result: `posexplode`
  * then emits no band rows, matching the explode+groupBy spelling where
  * a shingle-less document never appears in the band table. */
case class MinhashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1, s"bad banding ($bands, $rowsPerBand)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_bands requires array<bigint>, got ${other.simpleString}")
    }

  // permutation coefficients precomputed once per plan, not per row
  private val pa: Array[Long] =
    Array.tabulate(bands * rowsPerBand)(graft.pipeline.Hashing.permA)
  private val pb: Array[Long] =
    Array.tabulate(bands * rowsPerBand)(graft.pipeline.Hashing.permB)

  override protected def nullSafeEval(input: Any): Any =
    MinhashBands.compute(input.asInstanceOf[ArrayData], pa, pb, bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val paRef = ctx.addReferenceObj("pa", pa, "long[]")
    val pbRef = ctx.addReferenceObj("pb", pb, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashBands.compute(
        $c, $paRef, $pbRef, $bands, $rowsPerBand);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object MinhashBands {
  private val P = graft.pipeline.Hashing.P        // 2^31 - 1
  private val PackMod = graft.pipeline.Dedup.PackMod // largest prime < 2^32

  /** One document's packed band hashes; null for an empty shingle set. */
  def compute(sh: ArrayData, pa: Array[Long], pb: Array[Long],
      bands: Int, rowsPerBand: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val perms = bands * rowsPerBand
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val hp = sh.getLong(i) % P // h >= 0 (Md5Long) => % == pmod
      var j = 0
      while (j < perms) {
        val v = (pa(j) * hp + pb(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = mins(b * rowsPerBand)
      var r = 1
      while (r < rowsPerBand) {
        val x = mins(b * rowsPerBand + r)
        acc = if (rowsPerBand <= 2) acc * P + x else (acc * P + x) % PackMod
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}
