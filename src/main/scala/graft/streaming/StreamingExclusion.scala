package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.EventSchema

/** Streaming EXCLUSION funnel — the unbounded-stream counterpart of
  * [[graft.pipeline.EventAnalytics.funnelExclusion]]: per context, first A,
  * then the first B strictly after it, vetoed by any C strictly between.
  * State per live context is three packed longs (`ts·2³² + event_id` for
  * first-A, first-B and first-post-A-C) — no event buffering.
  *
  * The incremental rule is exact for in-order delivery: events are folded
  * in (ts, event_id) order within each batch, so a C arriving after A
  * while B is still unseen precedes the eventual first B — its key is
  * recorded, and the veto is derived at emission as `kc < kb` so a
  * context where B never arrives is NOT excluded (matching the batch
  * operator / oracle, where `k < kb` with NULL kb is false). Once B is
  * known, later Cs are outside the (A, B) gap by construction and are
  * ignored. Late cross-batch events inside the watermark fold in arrival
  * order (the [[StreamingSessions]]-family caveat); beyond it Spark drops
  * them.
  *
  * Emission: Update-mode — one status row per context per batch that
  * touched it (downstream keeps the latest); state is evicted by an
  * event-time timeout `horizonMs` past the context's last relevant event.
  */
object StreamingExclusion {

  case class ExclEvent(ctx: String, side: Int, ts: Long, eid: Long,
      et: java.sql.Timestamp)

  /** ka/kb/kc = packed first-A / first-B / first-post-A-C keys (MinValue =
    * unset). `excluded` is DERIVED at emission as `kb set && kc < kb` rather
    * than stored: a C seen after A while B is still unseen must not veto a
    * context where B never arrives — the batch operator (and the shared
    * oracle, where `k < kb` with NULL kb is false) reports such contexts as
    * not excluded. */
  case class ExclState(ka: Long, kb: Long, kc: Long)

  case class ExclStatus(context_id: String, a_ts: Option[Long],
      b_ts: Option[Long], excluded: Boolean, converted_clean: Boolean)

  private final val Unset = Long.MinValue

  def exclusionFunnel(events: DataFrame, stepA: String, stepB: String,
      excludeC: String, watermarkDelay: String = "10 minutes",
      horizonMs: Long = 3600000L): Dataset[ExclStatus] = {
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    val spark = events.sparkSession
    import spark.implicits._
    val sideExpr = when(col(EventSchema.EventType) === stepA, lit(0))
      .when(col(EventSchema.EventType) === stepB, lit(1))
      .when(col(EventSchema.EventType) === excludeC, lit(2))
      .otherwise(lit(-1))
    val prepared = events
      .withColumn("__event_time",
        timestamp_seconds(col(EventSchema.Timestamp).cast("long")))
      .withWatermark("__event_time", watermarkDelay)
      .withColumn("__side", sideExpr)
      .filter(col("__side") >= 0)
      .select(col(EventSchema.ContextId).cast("string").as("ctx"),
        col("__side").as("side"),
        col(EventSchema.Timestamp).cast("long").as("ts"),
        col(EventSchema.EventId).cast("long").as("eid"),
        col("__event_time").as("et"))
      .as[ExclEvent]

    prepared.groupByKey(_.ctx)
      .flatMapGroupsWithState[ExclState, ExclStatus](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (ctx: String, it: Iterator[ExclEvent], state: GroupState[ExclState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(ExclState(Unset, Unset, Unset))
            var maxTs = Long.MinValue
            it.toArray.sortBy(e => (e.ts, e.eid)).foreach { e =>
              maxTs = math.max(maxTs, e.ts)
              val k = (e.ts << 32) | (e.eid & 0xffffffffL)
              e.side match {
                case 0 if st.ka == Unset => st = st.copy(ka = k)
                case 1 if st.ka != Unset && k > st.ka && st.kb == Unset =>
                  st = st.copy(kb = k)
                case 2 if st.ka != Unset && k > st.ka && st.kb == Unset &&
                    st.kc == Unset =>
                  st = st.copy(kc = k)
                case _ => ()
              }
            }
            state.update(st)
            // clamp to the watermark (the StreamingSequence pattern): a
            // late in-watermark event must neither SHRINK the eviction
            // deadline below watermark + horizon nor produce a timeout at
            // or behind the watermark (Spark rejects that and fails the
            // query) — r15 review finding
            if (maxTs != Long.MinValue)
              state.setTimeoutTimestamp(math.max(maxTs * 1000L,
                state.getCurrentWatermarkMs()) + horizonMs)
            val excluded = st.kb != Unset && st.kc != Unset && st.kc < st.kb
            Iterator.single(ExclStatus(ctx,
              if (st.ka == Unset) None else Some(st.ka >>> 32),
              if (st.kb == Unset) None else Some(st.kb >>> 32),
              excluded,
              st.kb != Unset && !excluded))
          }
      }
  }
}
