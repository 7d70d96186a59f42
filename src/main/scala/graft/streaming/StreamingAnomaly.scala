package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.schema.EventSchema

/** Streaming volume-anomaly detection — the unbounded sibling of
  * [[graft.pipeline.EventAnalytics.anomalousDays]]: per event type, a
  * day's count is scored against the trailing `windowDays`-day mean the
  * moment the day CLOSES (an event of the same type arrives for a later
  * day), including zero-count gap days between events (craters flag).
  *
  * State per type is bounded and day-grain: the open day's running count
  * plus the last `windowDays` closed-day counts — a handful of longs per
  * type, regardless of event volume. The type's latest day stays open
  * (it may yet grow) and is never scored; that is the same emission
  * contract as [[StreamingSessions]] ("a later event closes it"), which
  * makes a bounded AvailableNow replay deterministic: every day except
  * each type's last is scored exactly as the batch operator scores it.
  *
  * Cross-batch late events for an already-closed day are absorbed into
  * the open day's trailing history only if the day has not been closed;
  * a closed day's verdict is never retracted (same documented limitation
  * as the session operator's late-merge).
  */
object StreamingAnomaly {

  case class DayEvent(et: String, day: Long)
  case class AnomalyState(firstDay: Long, openDay: Long, openCnt: Long,
      trail: List[(Long, Long)]) // (day, cnt), most recent first, ≤ windowDays kept
  case class AnomalyRow(event_type: String, day_start: Long, cnt: Long,
      trail_total: Long, dev_ppm: Long)

  /** Truncating (toward zero) division — matches the batch operator's
    * integral `div` and the oracle's CASE spelling. */
  private def tdiv(a: Long, b: Long): Long = a / b

  def anomalies(events: DataFrame, windowDays: Int, thresholdPpm: Long,
      typeCol: String = "event_type", tsCol: String = EventSchema.Timestamp)
      : Dataset[AnomalyRow] = {
    require(windowDays > 0 && thresholdPpm >= 0,
      s"bad parameters ($windowDays, $thresholdPpm)")
    val spark = events.sparkSession
    import spark.implicits._

    val prepared = events
      .select(col(typeCol).cast("string").as("et"),
        call_function("div", col(tsCol).cast("long"), lit(86400L)).as("day"))
      .as[DayEvent]

    prepared.groupByKey(_.et)
      .flatMapGroupsWithState[AnomalyState, AnomalyRow](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[DayEvent], state) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyRow]
          var st = state.getOption.orNull

          def score(day: Long, cnt: Long, trail: List[(Long, Long)], firstDay: Long): Unit = {
            if (day >= firstDay + windowDays) {
              val total = trail.collect {
                case (d, c) if d >= day - windowDays && d < day => c
              }.sum
              if (total > 0) {
                val dev = tdiv((cnt * windowDays - total) * 1000000L, total)
                if (math.abs(dev) >= thresholdPpm)
                  out += AnomalyRow(et, day * 86400L, cnt, total, dev)
              }
            }
          }

          def close(st0: AnomalyState, upto: Long): AnomalyState = {
            // close the open day, then every zero gap day strictly before
            // `upto` — but only the first windowDays+1 of them can score
            // (beyond that the trailing window is all zeros, total = 0,
            // and score() emits nothing), so a long gap FAST-FORWARDS in
            // O(windowDays) instead of O(gap days). Without the bound one
            // corrupt far-future timestamp (e.g. epoch-millis in a seconds
            // field, day ≈ 19.7M) spun the state handler for minutes and
            // then poisoned the type's openDay forever (r15 review
            // finding); the loop cost is now input-independent.
            var s = st0
            var d = s.openDay
            var c = s.openCnt
            val scoreUpto = math.min(upto, s.openDay + windowDays + 1L)
            while (d < scoreUpto) {
              score(d, c, s.trail, s.firstDay)
              val trail = ((d, c) :: s.trail).filter(_._1 >= d - windowDays + 1)
              s = AnomalyState(s.firstDay, d + 1, 0L, trail)
              d += 1; c = 0L
            }
            if (s.openDay < upto) {
              // the skipped days are all zero-count with zero trailing
              // total; land on `upto` with the all-zero trail the loop
              // would have produced
              val zeroTrail = ((upto - 1) until (upto - windowDays - 1) by -1)
                .map(zd => (zd, 0L)).toList
              s = AnomalyState(s.firstDay, upto, 0L, zeroTrail)
            }
            s
          }

          it.toArray.sortBy(_.day).foreach { e =>
            if (st == null) st = AnomalyState(e.day, e.day, 0L, Nil)
            if (e.day > st.openDay) st = close(st, e.day)
            if (e.day == st.openDay) // older-than-open events: closed, ignored
              st = st.copy(openCnt = st.openCnt + 1)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }
}
