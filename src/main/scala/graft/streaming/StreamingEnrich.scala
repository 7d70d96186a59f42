package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static temporal enrichment. */
object StreamingEnrich {

  /** Stream-static AS-OF enrichment: tag each streaming fact with the
    * dimension version current at its event time, by joining the stream
    * against a STATIC [[graft.pipeline.AsOfJoin.scd2]] interval table on
    * `key && valid_from <= ts < valid_to` — the interval form turns the
    * as-of match into a plain stream-static join predicate: STATELESS on
    * the stream side (no watermark, no state store), and the dimension
    * side broadcasts, so every micro-batch is a map-side probe.
    *
    * Facts before every version, or for unknown keys, pass through with
    * null enrichment (left outer) — the streaming sibling of
    * [[graft.pipeline.AsOfJoin.asOf]]'s no-match row. A dimension UPDATE
    * means re-deriving the static interval frame (the SCD2 nightly
    * refresh), not mutating stream state.
    *
    * SCD2 intervals are non-overlapping per key by construction, so each
    * fact matches at most one version and the row count is preserved. */
  def asOfEnrich(stream: DataFrame, scd2Intervals: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val dims = scd2Intervals.withColumnRenamed(keyCol, "__dk")
    stream.join(
      broadcast(dims),
      stream(keyCol) === dims("__dk") &&
        stream(tsCol).cast("long") >= dims("valid_from") &&
        (dims("valid_to").isNull || stream(tsCol).cast("long") < dims("valid_to")),
      "left_outer")
      .drop("__dk")
  }
}
