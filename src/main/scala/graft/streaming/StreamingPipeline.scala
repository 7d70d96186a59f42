package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** One keyed stream document heading into admission. `et` carries the
    * watermarked event-time attribute into the stateful operator. */
  case class AdmitInput(ck: String, id: Long, inCorpus: Boolean, et: java.sql.Timestamp)

  /** Admission decision for one stream document. */
  case class AdmitDecision(doc_id: Long, status: String)

  /** Streaming incremental admission — the unbounded-ingest sibling of
    * [[graft.pipeline.Dedup.incrementalDedup]]'s EXACT stages: every arriving
    * document is flagged against a STATIC corpus key set (stream-static left
    * join, stateless) and against previously-admitted stream keys via
    * `flatMapGroupsWithState` keyed on the content key. Unlike
    * `dropDuplicatesWithinWatermark` (which silently drops and keeps an
    * arbitrary first row), this emits a DECISION for every input document and
    * picks the min-id holder within a micro-batch deterministically:
    *
    *  - `dup_exact_corpus` — key exists in the corpus (never touches state);
    *  - `dup_exact_batch`  — key already admitted from this stream (or a
    *    smaller id in the same micro-batch holds it);
    *  - `admitted`         — first holder of a novel key.
    *
    * Near-dup admission stays on the batch path — LSH banding needs a
    * corpus-wide signature exchange no per-key streaming state can express.
    *
    * State is one boolean per admitted key, evicted `horizonMs` past the
    * key's last event time (a re-submitted duplicate after eviction is
    * re-admitted — the standard watermark-bounded streaming-dedup trade-off;
    * the batch pass stays exact). */
  def admitStream(stream: DataFrame, corpusKeys: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, watermarkDelay: String = "10 minutes",
      horizonMs: Long = 3600000L): Dataset[AdmitDecision] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withColumn("__event_time", timestamp_seconds(col(eventTimeCol).cast("long")))
      .withWatermark("__event_time", watermarkDelay)
      .withColumn("ck", Dedup.contentKey(col(textCol)))
      // distinct defensively: a duplicated corpus key would MULTIPLY stream
      // rows through the join, emitting duplicate decisions per document
      .join(corpusKeys.select(col("ck")).distinct().withColumn("in_corpus", lit(true)),
        Seq("ck"), "left")
      .select(col("ck"), col(idCol).cast("long").as("id"),
        coalesce(col("in_corpus"), lit(false)).as("inCorpus"),
        col("__event_time").as("et"))
      .as[AdmitInput]
      .groupByKey(_.ck)
      .flatMapGroupsWithState[Boolean, AdmitDecision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[AdmitInput], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = it.toArray
            val (corp, fresh) = rows.partition(_.inCorpus)
            val out = scala.collection.mutable.ArrayBuffer.empty[AdmitDecision]
            corp.foreach(r => out += AdmitDecision(r.id, "dup_exact_corpus"))
            if (fresh.nonEmpty) {
              if (state.exists) fresh.foreach(r => out += AdmitDecision(r.id, "dup_exact_batch"))
              else {
                val minId = fresh.iterator.map(_.id).min
                fresh.foreach(r => out += AdmitDecision(r.id,
                  if (r.id == minId) "admitted" else "dup_exact_batch"))
                state.update(true)
              }
              val base = math.max(fresh.iterator.map(_.et.getTime).max,
                state.getCurrentWatermarkMs())
              state.setTimeoutTimestamp(base + horizonMs)
            }
            out.iterator
          }
      }
  }

  /** Score a document stream against a FROZEN DSIR weight table — the
    * nightly-model / streaming-ingest split: weights come from
    * [[graft.pipeline.CorpusSignals.importanceWeights]] over the training
    * corpus at rest, the stream carries tonight's documents, and every
    * document gets the SAME deterministic accept/reject decision the batch
    * path would give it (the decision rule IS
    * [[graft.pipeline.CorpusSignals.importanceResample]], applied to the
    * streaming frame).
    *
    * Plan shape: stateless stream-static join — the weight table is
    * bucket-cardinality and broadcast, so document features never shuffle
    * for the lookup ([[graft.pipeline.CorpusSignals.importanceWeights]]
    * emits a DENSE table, so every feature bucket resolves — unseen
    * vocabulary gets the model's own smoothed weight, and the left-join
    * fallback to 0 only fires for a foreign, sparse table); per-document
    * totals are an event-time-windowed streaming aggregate (a document's
    * features all carry its event time, so its group closes when the
    * watermark passes — bounded (windows × docs-in-flight) state, the
    * [[StreamingAggregates]] pattern). Documents with < 2 tokens have no
    * features and emit no decision; NULL-id documents are dropped — both
    * the batch semantics.
    *
    * At-least-once sources: with `dedupWithinWatermark` (default) a
    * redelivered document inside the watermark horizon is scored ONCE —
    * without it, same-window copies would double the feature sums and
    * cross-window copies would emit conflicting decisions. Disable it only
    * where the replay/output mode cannot host two stateful operators
    * (e.g. complete-mode replay of an exactly-once source, as the gate
    * query does); a redelivery after state expiry re-scores either way.
    *
    * `buckets` must match the weight table's training value. */
  def scoreStream(stream: DataFrame, weights: DataFrame, idCol: String,
      textCol: String, eventTimeCol: String, basePpm: Long,
      salt: String = "dsir", watermarkDelay: String = "10 minutes",
      buckets: Int = 4096, windowWidth: String = "1 hour",
      dedupWithinWatermark: Boolean = true): DataFrame = {
    import graft.pipeline.CorpusSignals
    val watermarked = stream
      .filter(col(idCol).isNotNull)
      .withColumn("__event_time", timestamp_seconds(col(eventTimeCol).cast("long")))
      .withWatermark("__event_time", watermarkDelay)
    val deduped =
      if (dedupWithinWatermark) watermarked.dropDuplicatesWithinWatermark(idCol)
      else watermarked
    val feats = deduped
      .select(col(idCol).as("id"), col("__event_time"),
        CorpusSignals.bigramsOf(col(textCol)).as("bg"))
      .select(col("id"), col("__event_time"),
        CorpusSignals.featureBucket(col("bg"), buckets).as("fb"))
      .join(broadcast(weights.select(col("fb"), col("w"))), Seq("fb"), "left")
    val scored = feats
      .groupBy(window(col("__event_time"), windowWidth), col("id"))
      .agg(sum(coalesce(col("w"), lit(0L))).as("dsir_score"))
      .drop("window")
    CorpusSignals.importanceResample(scored, "id", "dsir_score", basePpm, salt)
  }
}
