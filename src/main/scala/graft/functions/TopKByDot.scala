package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k — the per-GROUP analog of Spark's global
  * `TakeOrderedAndProject`, for the similarity operators'
  * "k best neighbors per query" step ([[graft.pipeline.Similarity]]).
  *
  * Why a custom aggregate: the composable spelling
  * (`Window.partitionBy(query_id)` + `row_number <= k`) shuffles EVERY
  * candidate row to one reducer per query — with tens of queries against a
  * 100 TB corpus that funnels corpus-sized data through tens of partitions.
  * As a `TypedImperativeAggregate` the partial (map-side) state is a bounded
  * buffer of at most k entries per (group, partition), so the exchange
  * carries ≤ partitions × k rows per query and the final merge is a k-way
  * merge over those — two phases, no single-reducer stage, identical output.
  *
  * Ranking: (dot DESC, id ASC) — ties break to the smaller id, matching the
  * similarity operators' deterministic ordering. `payload` rides along
  * un-ranked (e.g. a per-row cosine); input rows where dot or id is null are
  * ignored. Result: `array<struct<dot, id, payload>>` in rank order.
  */
case class TopKByDot(dot: Expression, id: Expression, payload: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long, Double)]] {

  require(k > 0, s"topk_by_dot requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(dot, id, payload)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_dot"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dot", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (dot.dataType == LongType && id.dataType == LongType && payload.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_by_dot requires (bigint, bigint, double), got " +
          s"(${dot.dataType}, ${id.dataType}, ${payload.dataType})")

  private def better(a: (Long, Long, Double), b: (Long, Long, Double)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sort best-first and drop everything past rank k (in place). */
  private def compact(buf: ArrayBuffer[(Long, Long, Double)]): ArrayBuffer[(Long, Long, Double)] = {
    val sorted = buf.sortWith(better)
    if (sorted.length > k) sorted.takeInPlace(k) else sorted
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long, Double)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Long, Double)], input: InternalRow)
      : ArrayBuffer[(Long, Long, Double)] = {
    val d = dot.eval(input)
    val i = id.eval(input)
    if (d == null || i == null) return buf
    val p = payload.eval(input)
    val cand = (d.asInstanceOf[Long], i.asInstanceOf[Long],
      if (p == null) 0.0 else p.asInstanceOf[Double])
    // buffer is kept ≤ 2k unsorted; compaction amortizes the sort
    buf += cand
    if (buf.length >= 2 * k) compact(buf) else buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long, Double)],
      other: ArrayBuffer[(Long, Long, Double)]): ArrayBuffer[(Long, Long, Double)] =
    compact(buf ++= other)

  override def eval(buf: ArrayBuffer[(Long, Long, Double)]): Any =
    new GenericArrayData(compact(buf).map { case (d, i, p) =>
      InternalRow(d, i, p)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long, Double)]): Array[Byte] = {
    val trimmed = compact(buf)
    val bb = ByteBuffer.allocate(4 + trimmed.length * 24)
    bb.putInt(trimmed.length)
    trimmed.foreach { case (d, i, p) => bb.putLong(d); bb.putLong(i); bb.putDouble(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long, Double)](n)
    var j = 0
    while (j < n) { buf += ((bb.getLong, bb.getLong, bb.getDouble)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByDot =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByDot =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByDot =
    copy(dot = newChildren(0), id = newChildren(1), payload = newChildren(2))
}
