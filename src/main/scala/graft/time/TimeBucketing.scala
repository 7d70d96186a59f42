package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ast.TimeGranularity

/** Time bucketing for `PER HOUR|DAY|WEEK|MONTH|YEAR` aggregations.
  *
  * The reference supports two modes (sneldb
  * `src/shared/datetime/time_bucketing.rs:6-118`, config `[time]` in
  * `config/dev.toml:67-70`):
  *
  *  - calendar-aware (default: UTC, weeks start Monday): buckets align to
  *    calendar boundaries → `date_trunc` on a session-UTC timestamp;
  *  - naive fixed-width: `floor(ts/width)*width` with widths hour 3600,
  *    day 86400, week 604800, month 2592000 (30d), year 31536000 (365d).
  *
  * Inputs and outputs are epoch-second longs (the engine's canonical time
  * representation). Both modes are pure Catalyst expressions — codegen'd,
  * no UDFs, fully parallel at any scale.
  */
object TimeBucketing {

  def naiveWidth(g: TimeGranularity): Long = g match {
    case TimeGranularity.Hour  => 3600L
    case TimeGranularity.Day   => 86400L
    case TimeGranularity.Week  => 604800L
    case TimeGranularity.Month => 2592000L
    case TimeGranularity.Year  => 31536000L
  }

  /** Naive fixed-width bucket of an epoch-seconds column (floor semantics,
    * correct for negative epochs too via floor-division). */
  def naiveBucket(epochSec: Column, g: TimeGranularity): Column = {
    val w = naiveWidth(g)
    floor(epochSec.cast("double") / w).cast("long") * w
  }

  /** Calendar bucket of an epoch-seconds column; returns epoch seconds of the
    * bucket start. Defaults match both the reference default (`[time]` in
    * `config/dev.toml:67-70`: UTC, weeks start Monday) and `date_trunc` in
    * Spark/DuckDB.
    *
    * With a non-UTC `zone` the wall-clock frame is shifted via
    * `from_utc_timestamp`/`to_utc_timestamp` (reference
    * `time_bucketing.rs:24-55`: convert → truncate in local time → convert
    * back), so buckets align to LOCAL midnights/hours across DST
    * transitions. `weekStart` is days-from-Monday (0 = Monday … 6 = Sunday),
    * the reference's configurable `week_start` (`time_bucketing.rs:74-86`).
    * All modes stay pure codegen'd Catalyst expressions. */
  def calendarBucket(epochSec: Column, g: TimeGranularity,
      zone: String = "UTC", weekStart: Int = 0): Column = {
    val utc = zone == "UTC" || zone == "Etc/UTC" || zone == "Z"
    val ts = timestamp_seconds(epochSec)
    val local = if (utc) ts else from_utc_timestamp(ts, zone)
    val truncated = g match {
      case TimeGranularity.Week if weekStart != 0 || !utc =>
        // days since the configured week start:
        // (days_from_monday + 7 - weekStart) % 7, dayofweek is 1=Sunday
        val d = to_date(local)
        val delta = pmod(dayofweek(d) + lit(5) - lit(weekStart), lit(7))
        date_sub(d, delta).cast("timestamp")
      case other =>
        val unit = other match {
          case TimeGranularity.Hour  => "hour"
          case TimeGranularity.Day   => "day"
          case TimeGranularity.Week  => "week"
          case TimeGranularity.Month => "month"
          case TimeGranularity.Year  => "year"
        }
        date_trunc(unit, local)
    }
    (if (utc) truncated else to_utc_timestamp(truncated, zone)).cast("long")
  }

  private def isUtc(zone: String): Boolean =
    zone == "UTC" || zone == "Etc/UTC" || zone == "Z"

  /** LOCAL calendar date of an epoch-seconds instant in `zone` — the date
    * frame cohort/engagement reports bucket in (reference
    * `time_bucketing.rs:24-55`: convert → truncate local). */
  def localDate(epochSec: Column, zone: String = "UTC"): Column = {
    val ts = timestamp_seconds(epochSec)
    to_date(if (isUtc(zone)) ts else from_utc_timestamp(ts, zone))
  }

  /** LOCAL date of the calendar week start (`weekStart` days-from-Monday,
    * the reference's `week_start`) containing an epoch-seconds instant. */
  def localWeekStartDate(epochSec: Column, zone: String = "UTC",
      weekStart: Int = 0): Column = {
    val d = localDate(epochSec, zone)
    date_sub(d, pmod(dayofweek(d) + lit(5) - lit(weekStart), lit(7)))
  }

  /** Epoch seconds of local midnight of a LOCAL date column — the inverse
    * frame shift of [[localDate]]. Local midnights are never ambiguous or
    * skipped in real zones (DST transitions happen away from 00:00), so the
    * mapping is well-defined. */
  def localDateToEpoch(dateCol: Column, zone: String = "UTC"): Column = {
    val ts = dateCol.cast("timestamp")
    (if (isUtc(zone)) ts else to_utc_timestamp(ts, zone)).cast("long")
  }

  /** Parse a week-start day name (reference accepts chrono `Weekday` names)
    * to days-from-Monday. */
  def parseWeekStart(s: String): Int = s.trim.toLowerCase match {
    case "mon" | "monday"    => 0
    case "tue" | "tuesday"   => 1
    case "wed" | "wednesday" => 2
    case "thu" | "thursday"  => 3
    case "fri" | "friday"    => 4
    case "sat" | "saturday"  => 5
    case "sun" | "sunday"    => 6
    case other => throw new IllegalArgumentException(s"invalid week start: $other")
  }

  def bucket(epochSec: Column, g: TimeGranularity, calendar: Boolean,
      zone: String = "UTC", weekStart: Int = 0): Column =
    if (calendar) calendarBucket(epochSec, g, zone, weekStart)
    else naiveBucket(epochSec, g)
}
