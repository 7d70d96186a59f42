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
    * bucket start (UTC calendar, weeks start Monday — matches both the
    * reference default and `date_trunc` in Spark/DuckDB). */
  def calendarBucket(epochSec: Column, g: TimeGranularity): Column = {
    val ts = timestamp_seconds(epochSec)
    val unit = g match {
      case TimeGranularity.Hour  => "hour"
      case TimeGranularity.Day   => "day"
      case TimeGranularity.Week  => "week"
      case TimeGranularity.Month => "month"
      case TimeGranularity.Year  => "year"
    }
    date_trunc(unit, ts).cast("long")
  }

  def bucket(epochSec: Column, g: TimeGranularity, calendar: Boolean): Column =
    if (calendar) calendarBucket(epochSec, g) else naiveBucket(epochSec, g)
}
