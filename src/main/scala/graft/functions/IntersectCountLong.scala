package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expression computing `size(array_intersect(a, b))` for
  * two `array<bigint>` columns WITHOUT materializing the intersection —
  * the confirm rung of every shingle-set Jaccard operator
  * ([[graft.pipeline.Dedup]]'s exact confirms, the streaming admission
  * path), evaluated once per CANDIDATE PAIR inside a join.
  *
  * Why a custom expression: `ArrayIntersect` builds a generic
  * `OpenHashSet[Any]` — every element is boxed to `java.lang.Long` on
  * insert AND probe — then materializes the matched elements into a fresh
  * array that `size` immediately reduces to its length. Per-pair that is
  * dozens of allocations plus boxed hashing; profiled at ~60 task-seconds
  * for the 409k-candidate prefix-join confirm at sf0.1 (and the optimizer
  * duplicates the expression into the join condition when the Jaccard
  * filter is pushed, doubling the evaluations). This expression runs one
  * primitive open-addressing pass over a scratch table that is REUSED
  * across rows (grown once per task, `Arrays.fill` reset), boxes nothing
  * and allocates nothing per row.
  *
  * Semantics (pinned in IntersectCountLongSpec against the composed
  * spelling): the count of DISTINCT elements present in both arrays —
  * duplicates on either side count once, exactly like
  * `size(array_intersect(a, b))`; a null ELEMENT present on both sides
  * counts once (array_intersect keeps one null); a null ARRAY on either
  * side yields a null result (the composed spelling yields -1 via
  * `size(null)` under the legacy flag or null without it — every call
  * site feeds non-null arrays and consumes the count through `>=` /
  * division predicates, where both spellings reject the row identically).
  */
case class IntersectCountLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "intersect_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _                                                 => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"intersect_count requires two array<bigint> arguments, got " +
          s"${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    IntersectCountLong.threadCounter.get()
      .count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one scratch counter per generated operator instance (per task after
    // whole-stage codegen), reused across every row the task evaluates
    val counter = ctx.addMutableState("graft.functions.IntersectCounter", "interCnt",
      v => s"$v = new graft.functions.IntersectCounter();")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $counter.count($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountLong =
    copy(left = newLeft, right = newRight)
}

object IntersectCountLong {
  /** Interpreted-eval scratch: expression instances can be shared across
    * tasks on the non-codegen path, so the reusable table is per-thread. */
  private[functions] val threadCounter: ThreadLocal[IntersectCounter] =
    ThreadLocal.withInitial(() => new IntersectCounter)
}

/** Reusable primitive scratch table for [[IntersectCountLong]]: open
  * addressing with linear probing over a `long[]` keys / `byte[]` state
  * pair (0 = empty, 1 = present, 2 = already matched — the matched mark is
  * what makes duplicate right-side elements count once). NOT thread-safe;
  * one instance per task (codegen mutable state) or per thread
  * (interpreted eval). */
final class IntersectCounter {
  private var keys: Array[Long] = new Array[Long](64)
  private var state: Array[Byte] = new Array[Byte](64)

  private def scramble(k: Long): Int = {
    // 64->32 bit finalizer (splitmix-style); only the low bits are used
    val h = (k ^ (k >>> 33)) * 0xff51afd7ed558ccdL
    ((h ^ (h >>> 33)) & 0x7fffffffL).toInt
  }

  def count(a: ArrayData, b: ArrayData): Int = {
    // build on the smaller side, probe with the larger
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val nl = large.numElements()
    if (ns == 0) return 0
    var cap = 16
    while (cap < (ns << 1)) cap <<= 1
    if (keys.length < cap) {
      keys = new Array[Long](cap)
      state = new Array[Byte](cap)
    } else {
      java.util.Arrays.fill(state, 0, cap, 0.toByte)
    }
    val mask = cap - 1
    var nullInSmall = false
    var i = 0
    while (i < ns) {
      if (small.isNullAt(i)) nullInSmall = true
      else {
        val k = small.getLong(i)
        var idx = scramble(k) & mask
        var done = false
        while (!done) {
          if (state(idx) == 0) { keys(idx) = k; state(idx) = 1; done = true }
          else if (keys(idx) == k) done = true
          else idx = (idx + 1) & mask
        }
      }
      i += 1
    }
    var cnt = 0
    var nullMatched = false
    var j = 0
    while (j < nl) {
      if (large.isNullAt(j)) {
        if (nullInSmall && !nullMatched) { nullMatched = true; cnt += 1 }
      } else {
        val k = large.getLong(j)
        var idx = scramble(k) & mask
        var done = false
        while (!done) {
          if (state(idx) == 0) done = true
          else if (keys(idx) == k) {
            if (state(idx) == 1) { state(idx) = 2; cnt += 1 }
            done = true
          } else idx = (idx + 1) & mask
        }
      }
      j += 1
    }
    cnt
  }
}
