package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ast.{AggSpec, TimeGranularity}
import graft.engine.QueryCompiler
import graft.schema.EventSchema

/** Streaming `PER <granularity>` aggregation — the Structured Streaming
  * analog of the batch time-bucketed aggregations (SURVEY.md §3.8 ST4).
  *
  * The reference has no event-time windowing (ingest time is
  * server-assigned); its `PER` bucketing over a live stream maps to
  * `window()` + watermark here, with the same output naming as the batch
  * path (`bucket`, `count`, `total_<f>`, …). Hour/day/week are fixed-width
  * and thus streamable; month/year are calendar-width and only exist on the
  * batch path (same restriction Spark's `window()` has).
  *
  * State scales with (open windows × groups) per the watermark delay —
  * bounded, executor-distributed state; late events beyond the delay are
  * dropped by the watermark exactly like Spark's documented semantics.
  */
object StreamingAggregates {

  def windowWidth(g: TimeGranularity): String = g match {
    case TimeGranularity.Hour => "1 hour"
    case TimeGranularity.Day  => "1 day"
    case TimeGranularity.Week => "7 days"
    case TimeGranularity.Month | TimeGranularity.Year =>
      throw new IllegalArgumentException(
        "month/year are calendar-width buckets — use the batch path (PER MONTH|YEAR)")
  }

  /** Windowed aggregation over a streaming event frame (core columns per
    * [[EventSchema]], `timestamp` in epoch seconds).
    *
    * Bucket alignment honors the SAME `spark.graft.time.*` configs as the
    * batch path (r15 review finding — a bare `window(col, "7 days")` is
    * epoch-aligned, i.e. THURSDAY-start weeks, silently three days off the
    * batch default): calendar mode starts weeks on the configured
    * `weekStart` (Monday by default) via the window `startTime` offset;
    * `naiveBuckets=true` keeps raw epoch alignment (the batch naive mode —
    * hour/day buckets are identical in both modes at UTC). A non-UTC
    * `spark.graft.time.zone` in calendar mode is REJECTED: `window()` is
    * fixed-offset arithmetic and cannot express DST-correct local
    * boundaries — that semantics stays on the batch path.
    *
    * @param watermarkDelay max lateness, e.g. "10 minutes"; None = complete
    *                       mode (no late-data bound, all windows retained)
    */
  def windowed(stream: DataFrame, g: TimeGranularity, aggs: Seq[AggSpec],
      groupBy: Seq[String] = Nil, watermarkDelay: Option[String] = Some("10 minutes"),
      timeField: String = EventSchema.Timestamp): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregation required")
    val conf = stream.sparkSession.conf
    val naive = conf.getOption("spark.graft.time.naiveBuckets").contains("true")
    val zone = conf.getOption("spark.graft.time.zone").getOrElse("UTC")
    require(naive || zone == "UTC" || zone == "Etc/UTC" || zone == "Z",
      s"streaming calendar buckets cannot honor zone '$zone' (window() is " +
        "fixed-offset; DST-correct local boundaries need the batch PER path)")
    val weekStart = conf.getOption("spark.graft.time.weekStart")
      .map(graft.time.TimeBucketing.parseWeekStart).getOrElse(0)
    // epoch (1970-01-01) is a THURSDAY: a Monday+weekStart week start is
    // (4 + weekStart) mod 7 days past each epoch-aligned window boundary
    val startTime = g match {
      case TimeGranularity.Week if !naive => s"${(4 + weekStart) % 7} days"
      case _ => "0 seconds"
    }
    val withEventTime = stream.withColumn("__event_time", timestamp_seconds(col(timeField)))
    val watermarked = watermarkDelay.fold(withEventTime)(d => withEventTime.withWatermark("__event_time", d))
    val aggCols = aggs.map(QueryCompiler.aggColumn(stream.schema, _))
    watermarked
      .groupBy((window(col("__event_time"), windowWidth(g), windowWidth(g), startTime)
        +: groupBy.map(col)): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn(QueryCompiler.BucketCol, col("window.start").cast("long"))
      .drop("window")
  }
}
