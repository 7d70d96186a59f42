package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream windowed joins — correlating two live event feeds ("which
  * clicks led to a purchase within the hour") without landing either to
  * storage first. The reference has no streaming surface at all (its
  * sequence queries run at rest, `docs/src/design/query_replay.md`); this
  * is Structured Streaming's native stream-stream join, which is exactly
  * the scale shape such a correlation needs:
  *
  *  - both sides shuffle ONCE on the join key into co-partitioned state
  *    stores (the same single-exchange discipline as the batch sequence
  *    compiler, SURVEY §3 J1);
  *  - the time-range predicate bounds the state: a row is held only until
  *    the other side's watermark passes its end of the window, so state
  *    size ∝ key-rate × (window + watermark delay), never the stream's
  *    history;
  *  - matches stream out as they form (inner join emits on arrival; the
  *    watermark only governs state eviction).
  */
object StreamingJoins {

  /** Inner windowed join: each `left` row matched to every `right` row of
    * the same key with `right.ts` in `[left.ts, left.ts + windowSec]`
    * (inclusive both ends — the batch oracle spells the same bounds).
    * Both inputs carry an epoch-second `tsCol`; event time is derived per
    * side and watermarked with `watermarkDelay` so late rows are bounded
    * and join state is evicted.
    *
    * Output: key, `left_id`, `left_ts`, `right_id`, `right_ts` — one row
    * per qualifying pair.
    *
    * `joinType = "left_outer"` additionally emits a null-joined row for
    * every left row that can no longer match: its window must be entirely
    * below the global watermark before the state store releases it — so an
    * unmatched left row near the head of the stream (within
    * window + delay of the last event) is still HELD, not emitted. That
    * is the correct streaming answer ("this click may yet convert"), and
    * the replay oracle models it by excluding exactly those rows. */
  def windowJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, idCol: String, windowSec: Long,
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val l = left.select(col(keyCol).as("key"),
        col(tsCol).cast("long").as("left_ts"), col(idCol).as("left_id"))
      .withColumn("__l_time", timestamp_seconds(col("left_ts")))
      .withWatermark("__l_time", watermarkDelay)
    val r = right.select(col(keyCol).as("__rk"),
        col(tsCol).cast("long").as("right_ts"), col(idCol).as("right_id"))
      .withColumn("__r_time", timestamp_seconds(col("right_ts")))
      .withWatermark("__r_time", watermarkDelay)
    l.join(r,
        col("key") === col("__rk") &&
          col("__r_time") >= col("__l_time") &&
          col("__r_time") <= col("__l_time") + expr(s"INTERVAL $windowSec SECONDS"),
        joinType)
      .select(col("key"), col("left_id"), col("left_ts"),
        col("right_id"), col("right_ts"))
  }
}
