package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.EventSchema

/** Streaming gap-based sessionization — the unbounded-stream sibling of
  * [[graft.pipeline.EventAnalytics.sessionize]], via
  * `flatMapGroupsWithState` (the canonical Spark custom-state shape for
  * sessionization).
  *
  * Emission contract: a session row is emitted the moment the session is
  * CLOSED — either by a later event of the same context arriving more than
  * `gapSec` past the session's end (closed in-line), or by the event-time
  * timeout when the watermark passes `end + gapSec` (no event can extend
  * the session once every input at or before that point has arrived). A
  * context's still-open session is never emitted — it may yet grow. A
  * bounded replay (`Trigger.AvailableNow`) therefore emits exactly the
  * sessions a later event closed, which is what the oracle expresses.
  *
  * Scale shape: state per context is ONE session summary (4 longs) — no
  * event buffering; the only shuffle is the hash partition on the context
  * key. A context whose session closed keeps a NUMBERING TOMBSTONE (the
  * same 4 longs, `n = 0`) carrying the next `session_idx`: without it a
  * re-appearing context restarted at index 0, emitting duplicate
  * `(context_id, session_idx)` keys that merge distinct sessions in any
  * downstream keyed join (r15 review finding) and diverging from the batch
  * sibling's continuous numbering. Identity-grade state is permanent by
  * definition (bounded by distinct contexts, not time — the [[firstTouch]]
  * contract); the open-session half of the state is still evicted strictly
  * by watermark. Deployments whose context keys are high-cardinality or
  * adversarial can cap tombstone lifetime with `tombstoneTtlSec` — see the
  * [[sessions]] param doc for the duplicate-numbering trade.
  */
object StreamingSessions {

  case class SessEvent(ctx: String, ts: Long, eid: Long, et: java.sql.Timestamp)

  /** The open session of one context. */
  case class SessState(idx: Long, start: Long, end: Long, n: Long)

  case class SessionRow(context_id: String, session_idx: Long, start_ts: Long,
      end_ts: Long, n_events: Long, duration_s: Long)

  /** A context's first-ever event. */
  case class FirstTouch(context_id: String, first_ts: Long, first_event_id: Long)

  /** Streaming FIRST-TOUCH detection — "is this context new": emits ONE
    * row per context, on the batch where its first event arrives, carrying
    * the (timestamp, event_id)-minimal event of that batch (the batch
    * iterator is sorted, so replays are deterministic even though Spark
    * hands groups in arbitrary row order). Feeds new-user counts, reach
    * curves, and acquisition alerts without any corpus rescan.
    *
    * Scale shape: state per context is one boolean (seen), keyed state on
    * the context hash partition — the minimum any "have we met this
    * entity" stream needs. No timeout: identity state is permanent by
    * definition (bounded by distinct contexts, not time). A context whose
    * first event is LATE (an earlier-ts event arrives in a later batch)
    * keeps the first ARRIVAL — the streaming-order semantics, documented
    * rather than hidden (the batch [[graft.pipeline.EventAnalytics
    * .reachCurve]] is the global-order truth). */
  def firstTouch(events: DataFrame,
      linkCol: String = EventSchema.ContextId): Dataset[FirstTouch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(linkCol).cast("string").as("ctx"),
        col(EventSchema.Timestamp).cast("long").as("ts"),
        col(EventSchema.EventId).cast("long").as("eid"),
        lit(null).cast("timestamp").as("et"))
      .as[SessEvent]
      .groupByKey(_.ctx)
      .flatMapGroupsWithState[Boolean, FirstTouch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (ctx: String, it: Iterator[SessEvent], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = it.minBy(e => (e.ts, e.eid))
            Iterator.single(FirstTouch(ctx, first.ts, first.eid))
          }
      }
  }

  /** @param tombstoneTtlSec 0 (default) keeps numbering tombstones forever —
    *   `(context_id, session_idx)` stays globally unique, at the price of
    *   state bounded by DISTINCT contexts (a hazard under high-cardinality
    *   or adversarial context keys — ADVICE r15). A positive value evicts a
    *   tombstone once the watermark passes its close by that many seconds:
    *   state becomes time-bounded, but a context that returns after the TTL
    *   RESTARTS numbering at 0, so `(context_id, session_idx)` can repeat
    *   across the gap — callers joining on that key must dedupe by
    *   `start_ts` or accept the merge. */
  def sessions(events: DataFrame, gapSec: Long,
      linkCol: String = EventSchema.ContextId,
      watermarkDelay: String = "10 minutes",
      tombstoneTtlSec: Long = 0L): Dataset[SessionRow] = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val spark = events.sparkSession
    import spark.implicits._

    val prepared = events
      .withColumn("__event_time", timestamp_seconds(col(EventSchema.Timestamp).cast("long")))
      .withWatermark("__event_time", watermarkDelay)
      .select(col(linkCol).cast("string").as("ctx"),
        col(EventSchema.Timestamp).cast("long").as("ts"),
        col(EventSchema.EventId).cast("long").as("eid"),
        col("__event_time").as("et"))
      .as[SessEvent]

    def emit(ctx: String, s: SessState): SessionRow =
      SessionRow(ctx, s.idx, s.start, s.end, s.n, s.end - s.start)

    // a closed context's state becomes this tombstone: no open session,
    // idx = the NEXT session's number (keeps numbering continuous and
    // (context_id, session_idx) unique across closes). With the default
    // TTL of 0 no timeout is set, so it persists — the documented
    // identity-state price; a positive TTL arms an eviction timeout.
    def tombstone(nextIdx: Long) = SessState(nextIdx, Long.MinValue, Long.MinValue, 0L)

    prepared.groupByKey(_.ctx)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (ctx: String, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          def park(nextIdx: Long): Unit = {
            state.update(tombstone(nextIdx))
            if (tombstoneTtlSec > 0L)
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + tombstoneTtlSec * 1000L)
          }
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n == 0L) {
              // expired tombstone: evict — the context's numbering restarts
              // at 0 if it ever returns (the documented TTL trade)
              state.remove()
              Iterator.empty
            } else {
              // watermark passed end + gap: nothing can extend this session
              park(s.idx + 1L)
              Iterator.single(emit(ctx, s))
            }
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
            var st = state.getOption.orNull
            var nextIdx = 0L
            if (st != null && st.n == 0L) { nextIdx = st.idx; st = null }
            // (ts, eid) order within the batch — the batch operator's order
            it.toArray.sortBy(e => (e.ts, e.eid)).foreach { e =>
              if (st == null) st = SessState(nextIdx, e.ts, e.ts, 1L)
              else if (e.ts - st.end > gapSec) {
                out += emit(ctx, st)
                st = SessState(st.idx + 1, e.ts, e.ts, 1L)
              } else {
                // a late-but-within-watermark event from an earlier batch may
                // precede the open session's start: extend BOTH bounds so
                // start_ts/duration stay correct (the batch sibling sorts
                // globally). Limitation: such an event always merges into the
                // open session — it cannot retroactively split it or reopen
                // an already-emitted one.
                st = SessState(st.idx, math.min(st.start, e.ts),
                  math.max(st.end, e.ts), st.n + 1L)
              }
            }
            if ((st.end + gapSec) * 1000L <= state.getCurrentWatermarkMs()) {
              // <=: at equality no in-watermark event can extend either — an
              // extender needs ts <= end+gap AND ts*1000 > watermarkMs, which
              // is unsatisfiable when (end+gap)*1000 == watermarkMs.
              // already due: the watermark has passed end + gap, so no
              // in-watermark event can extend this session. A deferred
              // timeout clamped to watermark+1 would never fire if the
              // watermark never advances again (idle stream) — emit now.
              out += emit(ctx, st)
              park(st.idx + 1L)
            } else {
              state.update(st)
              // due once the watermark passes end + gap; the +1 keeps the
              // timestamp strictly ahead of the current watermark (Spark
              // rejects a timeout at or behind it)
              state.setTimeoutTimestamp(math.max(
                (st.end + gapSec) * 1000L, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }
}
