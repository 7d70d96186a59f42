package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}

/** Streaming training-data curation — the unbounded-ingest sibling of
  * [[graft.pipeline.TrainingPipeline]]: language filter → quality filter →
  * exact dedup → token statistics, as one Structured Streaming plan.
  *
  * The scoring/filter steps are stateless per-row expressions (identical
  * columns to the batch path, fused into each micro-batch scan). Dedup uses
  * `dropDuplicatesWithinWatermark` on the normalized content key: state
  * holds one entry per distinct key seen within the watermark delay and is
  * evicted afterwards — bounded state for an unbounded corpus, which a plain
  * key-only `dropDuplicates` (state grows forever) would not give.
  *
  * Divergence from the batch pipeline, by design: the streaming survivor is
  * the FIRST-ARRIVED copy of each content key (there is no global "min id"
  * over an unbounded stream), and a duplicate arriving after its key's state
  * expired is admitted again. Both are the standard streaming-dedup
  * trade-offs; an exact global pass stays on the batch path.
  */
object StreamingPipeline {

  /** Curate a streaming document frame (`idCol`, `textCol`, and
    * `eventTimeCol` as epoch seconds). */
  def curateStream(stream: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, lang: String = "en", minQuality: Double = 0.5,
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__event_time", timestamp_seconds(col(eventTimeCol).cast("long")))
      .withWatermark("__event_time", watermarkDelay)
      .filter(TextAnalysis.languageId(col(textCol)) === lang &&
        TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .withColumn("content_key", Dedup.contentKey(col(textCol)))
      .dropDuplicatesWithinWatermark("content_key")
      .select(
        col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("tok_ws"),
        TextAnalysis.bpeishTokenCount(col(textCol)).cast("long").as("tok_bpe"),
        TextAnalysis.qualityScore(col(textCol)).as("quality"))
}
