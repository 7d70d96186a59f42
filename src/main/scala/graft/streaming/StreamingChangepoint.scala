package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM level-shift detection — the unbounded-stream sibling of
  * [[graft.pipeline.EventAnalytics.cusumChangepoint]]: per event type,
  * daily counts accumulate in state and every batch re-emits the current
  * changepoint verdict from the EXACT integer recurrence (baseline over the
  * first `burnDays` days ×1000, two-sided slacked sums, state frozen at the
  * first threshold crossing — the same milli-unit arithmetic, so a bounded
  * AvailableNow replay reproduces the batch operator bit-for-bit).
  *
  * State per type is the day→count map — CALENDAR-bounded (one entry per
  * active day), not event-bounded, the same footprint argument as the batch
  * operator's per-type array. Update-mode emission: one verdict row per
  * touched type per batch; downstream keeps the latest. Late events inside
  * the watermark amend their day's count and the NEXT emission re-folds the
  * full recurrence, so a late-arriving day cannot freeze the walk on a
  * partial count forever. */
object StreamingChangepoint {

  case class CpEvent(tpe: String, day: Long, et: java.sql.Timestamp)
  case class CpState(counts: Map[Long, Long])
  case class AcRow(event_type: String, n_days: Long, mean_milli: Long,
      r1_ppm: Option[Long], r7_ppm: Option[Long])
  case class CgRow(event_type: String, first_day: Long, last_day: Long,
      span_days: Long, observed_days: Long, missing_days: Long,
      missing: Seq[Long])
  case class CpRow(event_type: String, n_days: Long, base_milli: Long,
      max_sp: Long, max_sn: Long, cp_day: Option[Long], direction: Option[String])

  def cusum(events: DataFrame, typeCol: String, tsCol: String,
      burnDays: Int = 7, slackPct: Int = 10, threshPct: Int = 400,
      watermarkDelay: String = "10 minutes"): Dataset[CpRow] = {
    require(burnDays >= 1 && slackPct >= 0 && threshPct > 0,
      s"bad CUSUM params: burn=$burnDays slack=$slackPct thresh=$threshPct")
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .withColumn("__event_time", timestamp_seconds(col(tsCol).cast("long")))
      .withWatermark("__event_time", watermarkDelay)
      .select(col(typeCol).cast("string").as("tpe"),
        expr(s"cast($tsCol as bigint) div 86400").as("day"),
        col("__event_time").as("et"))
      .as[CpEvent]

    prepared.groupByKey(_.tpe)
      .flatMapGroupsWithState[CpState, CpRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[CpEvent], state: GroupState[CpState]) =>
          val m = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(_.counts.foreach { case (d, c) => m(d) = c })
          it.foreach(e => m(e.day) = m.getOrElse(e.day, 0L) + 1L)
          state.update(CpState(m.toMap))
          val arr = m.toSeq.sortBy(_._1)
          if (arr.size <= burnDays) Iterator.empty
          else {
            // the batch recurrence verbatim, in milli units with truncating
            // integer division (counts are non-negative, so / == div here)
            val base = arr.take(burnDays).map(_._2).sum * 1000L / burnDays
            val slack = base * slackPct / 100
            val h = base * threshPct / 100
            var sp = 0L; var sn = 0L; var msp = 0L; var msn = 0L
            var cp = -1L; var dir = 0
            arr.drop(burnDays).foreach { case (day, cnt) =>
              if (cp < 0) {
                val nsp = math.max(0L, sp + cnt * 1000L - base - slack)
                val nsn = math.max(0L, sn + base - cnt * 1000L - slack)
                msp = math.max(msp, nsp); msn = math.max(msn, nsn)
                if (nsp > h) { cp = day; dir = 1 }
                else if (nsn > h) { cp = day; dir = 2 }
                sp = nsp; sn = nsn
              }
            }
            Iterator.single(CpRow(tpe, arr.size.toLong, base, msp, msn,
              if (cp >= 0) Some(cp) else None,
              dir match { case 1 => Some("up"); case 2 => Some("down"); case _ => None }))
          }
      }
  }

  /** Streaming daily autocorrelation — the unbounded-stream sibling of
    * [[graft.pipeline.EventAnalytics.dailyAutocorrelation]], sharing the
    * CUSUM twin's calendar-bounded day→count state. Every batch re-folds
    * the EXACT integer formula over the accumulated day series: centered
    * deviations `d_t = cnt_t·n − T` (no division), positional lag-k
    * products, signed ppm via the same truncate-toward-zero Long division
    * the batch operator compiles — so a bounded replay reproduces it
    * bit-for-bit, late-amended days included at the next emission. */
  def dailyAutocorr(events: DataFrame, typeCol: String, tsCol: String,
      watermarkDelay: String = "10 minutes"): Dataset[AcRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .withColumn("__event_time", timestamp_seconds(col(tsCol).cast("long")))
      .withWatermark("__event_time", watermarkDelay)
      .select(col(typeCol).cast("string").as("tpe"),
        expr(s"cast($tsCol as bigint) div 86400").as("day"),
        col("__event_time").as("et"))
      .as[CpEvent]
    prepared.groupByKey(_.tpe)
      .flatMapGroupsWithState[CpState, AcRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[CpEvent], state: GroupState[CpState]) =>
          val m = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(_.counts.foreach { case (d, c) => m(d) = c })
          it.foreach(e => m(e.day) = m.getOrElse(e.day, 0L) + 1L)
          state.update(CpState(m.toMap))
          val cnts = m.toSeq.sortBy(_._1).map(_._2).toArray
          val n = cnts.length.toLong
          if (n == 0) Iterator.empty
          else {
            val tot = cnts.sum
            val dev = cnts.map(c => c * n - tot)
            val den = dev.map(d => d * d).sum
            def r(k: Int): Option[Long] =
              if (n <= k || den <= 0) None
              else Some((k until dev.length).map(i => dev(i) * dev(i - k)).sum
                * 1000000L / den)
            Iterator.single(AcRow(tpe, n, tot * 1000L / n, r(1), r(7)))
          }
      }
  }

  /** Streaming ingest-coverage gap report — the unbounded-stream sibling
    * of [[graft.pipeline.EventAnalytics.coverageGaps]] on the same
    * calendar-bounded state: per batch, each touched type re-emits its
    * observed span and the EXACT missing-day list (span minus observed —
    * both calendar-bounded, so the emitted row stays bounded too). */
  def coverageGaps(events: DataFrame, typeCol: String, tsCol: String,
      watermarkDelay: String = "10 minutes"): Dataset[CgRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .withColumn("__event_time", timestamp_seconds(col(tsCol).cast("long")))
      .withWatermark("__event_time", watermarkDelay)
      .select(col(typeCol).cast("string").as("tpe"),
        expr(s"cast($tsCol as bigint) div 86400").as("day"),
        col("__event_time").as("et"))
      .as[CpEvent]
    prepared.groupByKey(_.tpe)
      .flatMapGroupsWithState[CpState, CgRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[CpEvent], state: GroupState[CpState]) =>
          val m = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(_.counts.foreach { case (d, c) => m(d) = c })
          it.foreach(e => m(e.day) = m.getOrElse(e.day, 0L) + 1L)
          state.update(CpState(m.toMap))
          if (m.isEmpty) Iterator.empty
          else {
            val obs = m.keys.toArray.sorted
            val (first, last) = (obs.head, obs.last)
            val missing = (first to last).filterNot(m.contains)
            Iterator.single(CgRow(tpe, first, last, last - first + 1,
              obs.length.toLong, missing.length.toLong, missing))
          }
      }
  }
}
