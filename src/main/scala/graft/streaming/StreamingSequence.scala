package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.EventSchema

/** Streaming funnel detection — the reference's `FOLLOWED BY` chains
  * (`matcher.rs`, SURVEY.md §2.2) re-expressed for an UNBOUNDED stream with
  * `flatMapGroupsWithState` (SURVEY.md §3.8; the Spark-idiomatic custom-state
  * path the batch `flatMapGroups` matcher cannot cover).
  *
  * Semantics (deliberately different from the batch enumerator, which lists
  * every matching chain): per link key, FIRST-TOUCH completion — each funnel
  * step records the earliest event that validly extends the prefix (same
  * `(timestamp, event_id)` strict ordering as the batch matcher), and one
  * match row is emitted the moment the last step completes. State then
  * resets, so a link can complete the funnel again with later events
  * (sessionized funnels). Late events beyond the watermark are dropped by
  * Spark; within the watermark, first-touch is best-effort in arrival order.
  *
  * Scale shape: state per live link is O(steps) longs — two arrays, no event
  * buffering — cleaned by an event-time timeout `horizonMs` past the last
  * contributing event, so abandoned funnels cannot accumulate state. The
  * only shuffle is the hash partition on the link key, identical to the
  * batch path's single exchange.
  */
object StreamingSequence {

  /** One relevant stream event (side = index of the matched step). `et`
    * carries the watermarked event-time attribute through the typed
    * projection — the event-time timeout requires it to survive into the
    * flatMapGroupsWithState child. */
  case class FunnelEvent(link: String, side: Int, ts: Long, eid: Long,
      et: java.sql.Timestamp)

  /** Earliest `(ts, eid)` completing each prefix; MinValue = not reached. */
  case class FunnelProgress(ts: Seq[Long], eids: Seq[Long])

  /** A completed funnel: per-step event timestamps for the link. */
  case class FunnelMatch(link: String, stepTs: Seq[Long])

  /** Detect completions of `steps` (event types, in order) over a streaming
    * event frame carrying the core columns (context_id, event_type,
    * timestamp in epoch seconds, event_id).
    *
    * @param watermarkDelay max lateness before events are dropped
    * @param horizonMs      event-time gap after which a partial funnel's
    *                       state is discarded (abandoned-funnel cleanup)
    *
    * Caveat: Catalyst pushes the step filter below the EventTimeWatermark
    * node, so the watermark (and with it timeouts and late-event eviction)
    * advances on funnel-step events only — a stream of exclusively
    * irrelevant event types keeps state alive. Feed the funnel a pre-scoped
    * stream, or accept the (conservative) slower eviction.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      linkCol: String = EventSchema.ContextId,
      watermarkDelay: String = "10 minutes",
      horizonMs: Long = 3600000L): Dataset[FunnelMatch] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.size

    // one row per (event, matching step) — a fold to a single side index
    // would assign an event to only its LAST matching step, so a funnel
    // with a repeated type (A FOLLOWED BY A) could never fill the earlier
    // step and silently matched nothing (r15 review finding). The batch
    // SequenceCompiler unions one side per step for the same reason; for
    // all-distinct steps the explode degenerates to the old single row.
    val sideArray = array(steps.zipWithIndex.map { case (t, i) =>
      when(col(EventSchema.EventType) === t, lit(i)).otherwise(lit(-1))
    }: _*)
    val prepared = events
      .withColumn("__event_time", timestamp_seconds(col(EventSchema.Timestamp).cast("long")))
      .withWatermark("__event_time", watermarkDelay)
      .withColumn("__side", explode(sideArray))
      .filter(col("__side") >= 0)
      .select(col(linkCol).cast("string").as("link"), col("__side").as("side"),
        col(EventSchema.Timestamp).cast("long").as("ts"),
        col(EventSchema.EventId).cast("long").as("eid"),
        col("__event_time").as("et"))
      .as[FunnelEvent]

    prepared.groupByKey(_.link)
      .flatMapGroupsWithState[FunnelProgress, FunnelMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (link: String, it: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ts = Array.fill(n)(Long.MinValue)
            val eids = Array.fill(n)(Long.MinValue)
            state.getOption.foreach { p =>
              p.ts.copyToArray(ts); p.eids.copyToArray(eids)
            }
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelMatch]
            var maxTs = Long.MinValue
            // process in (ts, eid, side) order so "earliest valid event"
            // holds within the batch, and an event matching several steps
            // of a repeated-type funnel tries the EARLIER step first (its
            // own later-step row is then blocked by the strict (ts, eid)
            // prefix ordering — one event never fills two steps)
            it.toArray.sortBy(e => (e.ts, e.eid, e.side)).foreach { e =>
              maxTs = math.max(maxTs, e.ts)
              val s = e.side
              val extendsPrefix = s == 0 || (ts(s - 1) != Long.MinValue &&
                (e.ts > ts(s - 1) || (e.ts == ts(s - 1) && e.eid > eids(s - 1))))
              if (extendsPrefix && ts(s) == Long.MinValue) {
                ts(s) = e.ts; eids(s) = e.eid
                if (s == n - 1) { // funnel complete: emit, reset for re-fire
                  out += FunnelMatch(link, ts.toSeq)
                  java.util.Arrays.fill(ts, Long.MinValue)
                  java.util.Arrays.fill(eids, Long.MinValue)
                }
              }
            }
            if (ts.exists(_ != Long.MinValue)) {
              state.update(FunnelProgress(ts.toSeq, eids.toSeq))
              val base = math.max(maxTs * 1000L,
                state.getCurrentWatermarkMs())
              state.setTimeoutTimestamp(base + horizonMs)
            } else state.remove()
            out.iterator
          }
      }
  }
}
