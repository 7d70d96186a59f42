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
    * @param watermarkDelay max lateness, e.g. "10 minutes"; None = complete
    *                       mode (no late-data bound, all windows retained)
    */
  def windowed(stream: DataFrame, g: TimeGranularity, aggs: Seq[AggSpec],
      groupBy: Seq[String] = Nil, watermarkDelay: Option[String] = Some("10 minutes"),
      timeField: String = EventSchema.Timestamp): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregation required")
    val withEventTime = stream.withColumn("__event_time", timestamp_seconds(col(timeField)))
    val watermarked = watermarkDelay.fold(withEventTime)(d => withEventTime.withWatermark("__event_time", d))
    val aggCols = aggs.map(QueryCompiler.aggColumn(stream.schema, _))
    watermarked
      .groupBy((window(col("__event_time"), windowWidth(g)) +: groupBy.map(col)): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn(QueryCompiler.BucketCol, col("window.start").cast("long"))
      .drop("window")
  }
}
