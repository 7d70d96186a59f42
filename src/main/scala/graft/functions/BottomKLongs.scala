package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group "k smallest DISTINCT longs" — the KMV (k-minimum-values)
  * sketch primitive behind [[graft.pipeline.Sketches]].
  *
  * Why a custom aggregate: the composable spelling (`distinct` + window
  * `row_number <= k`, or `sort_array(collect_set(h))[0..k]`) either shuffles
  * every distinct value to one reducer per group or holds an UNBOUNDED
  * collect_set per group. As a `TypedImperativeAggregate` the partial
  * (map-side) state is at most k values per (group, partition): a
  * 100 TB scan exchanges ≤ partitions × k longs per group and the final
  * merge is a bounded sorted-distinct over those — the sketch's mergeability
  * IS the aggregation tree.
  *
  * Null inputs are ignored. Result: `array<bigint>`, ascending, distinct,
  * length ≤ k (shorter iff the group has fewer than k distinct values —
  * which is exactly the KMV "sketch is exhaustive" case).
  */
case class BottomKLongs(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  require(k > 0, s"bottom_k requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottom_k requires a bigint argument, got ${child.dataType}")

  /** Sort ascending, dedup, truncate to k (returns a fresh buffer). */
  private def compact(buf: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val out = new ArrayBuffer[Long](math.min(arr.length, k))
    var i = 0
    while (i < arr.length && out.length < k) {
      val v = arr(i)
      if (out.isEmpty || out(out.length - 1) != v) out += v
      i += 1
    }
    out
  }

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // buffer is kept ≤ 4k unsorted; compaction amortizes the sort
    buf += v.asInstanceOf[Long]
    if (buf.length >= 4 * k) compact(buf) else buf
  }

  override def merge(buf: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] =
    compact(buf ++= other)

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(compact(buf).toArray[Long].map(_.asInstanceOf[Any]))

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val trimmed = compact(buf)
    val bb = ByteBuffer.allocate(4 + trimmed.length * 8)
    bb.putInt(trimmed.length)
    trimmed.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Long](n)
    var j = 0
    while (j < n) { buf += bb.getLong; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKLongs =
    copy(child = newChildren(0))
}
