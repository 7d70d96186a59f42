package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming KMV distinct-count estimation — the unbounded-stream sibling
  * of [[graft.pipeline.Sketches.kmvDistinct]] (and the approximate sibling
  * of a streaming COUNT UNIQUE, whose exact state grows with the distinct
  * set itself).
  *
  * State per group is the bottom-k sketch: at most k sorted distinct
  * 60-bit hashes — FIXED-SIZE regardless of how many distinct values the
  * stream has carried, which is the entire point: an exact streaming
  * distinct over a 100 TB event stream holds billions of keys in the state
  * store; this holds k longs per group, forever.
  *
  * Each micro-batch folds its hashes into the sketch and emits the group's
  * REFRESHED estimate (update semantics — the continuously-updated
  * dashboard number). Because the sketch is a pure set function (sorted
  * distinct bottom-k), the final state is independent of how the stream
  * was batched, so an AvailableNow replay reproduces the batch operator's
  * estimate exactly — the oracle is the same SQL.
  *
  * Groups are assumed low-cardinality (event types, sources, tenants):
  * state is never evicted (`NoTimeout`) since a distinct-count sketch by
  * definition must remember the whole history.
  */
object StreamingSketches {

  case class KmvEvent(grp: String, h: Long)
  case class KmvRow(group_key: String, sketch_size: Long, kth_hash: Long, est_distinct: Long)

  /** Fold new hashes into a sorted-distinct bottom-k sketch. */
  private[streaming] def fold(sk: Array[Long], hs: Iterator[Long], k: Int): Array[Long] = {
    val all = (sk.iterator ++ hs).toArray
    java.util.Arrays.sort(all)
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.min(all.length, k))
    var i = 0
    while (i < all.length && out.length < k) {
      val v = all(i)
      if (out.isEmpty || out(out.length - 1) != v) out += v
      i += 1
    }
    out.toArray
  }

  /** The KMV estimate in exact integer arithmetic (BigInt guards the
    * (k-1)·2^60 numerator) — bit-identical to the batch operator's decimal
    * spelling and the oracle's HUGEINT division. */
  private[streaming] def estimate(sk: Array[Long], k: Int): Long =
    if (sk.length < k) sk.length.toLong
    else (BigInt(k - 1) * BigInt(graft.pipeline.Sketches.HashSpace) /
      BigInt(math.max(sk(k - 1), 1L))).toLong

  /** Per-group streaming distinct estimate of `value`. Output (update
    * mode): `group_key`, `sketch_size`, `kth_hash`, `est_distinct` —
    * re-emitted for a group whenever a batch touches it. */
  def kmvDistinct(input: DataFrame, groupCol: String, value: Column, k: Int): Dataset[KmvRow] = {
    require(k > 0, s"k must be > 0, got $k")
    val spark = input.sparkSession
    import spark.implicits._
    input
      .select(col(groupCol).cast("string").as("grp"),
        graft.pipeline.Hashing.md5Long(value).as("h"))
      .as[KmvEvent]
      .groupByKey(_.grp)
      .mapGroupsWithState[Array[Long], KmvRow](GroupStateTimeout.NoTimeout) {
        (grp: String, it: Iterator[KmvEvent], state) =>
          val sk = fold(state.getOption.getOrElse(Array.empty[Long]), it.map(_.h), k)
          state.update(sk)
          KmvRow(grp, sk.length.toLong,
            if (sk.isEmpty) 0L else sk(math.min(sk.length, k) - 1),
            estimate(sk, k))
      }
  }

  /** Streaming Count-Min counters — the heavy-hitter / frequency sketch
    * maintained live: counters are ADDITIVE, so the streaming form is
    * literally the batch [[graft.pipeline.Sketches.cmsCounters]]
    * aggregation run as a streaming aggregation (state = the depth×width
    * counter table, FIXED-SIZE forever — the whole point vs an exact
    * per-key count whose state grows with the key space). Complete-mode
    * output re-emits the refreshed table each trigger; additivity makes
    * the replayed table equal the batch table exactly (same oracle).
    * Estimates stay the batch-side [[graft.pipeline.Sketches.cmsEstimate]]
    * over the latest emitted table. */
  def cmsCounters(stream: DataFrame, value: Column, depth: Int, width: Int): DataFrame =
    graft.pipeline.Sketches.cmsCounters(stream, value, depth, width)
}
