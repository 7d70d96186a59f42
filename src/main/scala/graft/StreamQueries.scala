package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ast.{AggSpec, TimeGranularity}
import graft.sources.TestDataSource
import graft.streaming.{StreamingAggregates, StreamingAnomaly, StreamingEnrich, StreamingExclusion, StreamingJoins, StreamingPipeline, StreamingReplay, StreamingSequence, StreamingSessions, StreamingSketches}

/** CORRECTNESS rows for the Structured Streaming operators: each one is
  * batch-replayed over the testdata via [[streaming.StreamingReplay]]
  * (`Trigger.AvailableNow`, real state stores/watermarks) and hash-compared
  * against a DuckDB oracle expressing the same semantics — the same hard
  * gate every batch operator passes.
  *
  * The replay delivers all input as one micro-batch, so the stream-only
  * semantics (funnel first-touch scan order, dedup first-arrival survivor)
  * are deterministic and the oracles below express them exactly.
  */
object StreamQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_funnel" -> ((s, d) => {
      // streaming FOLLOWED BY with first-touch + reset semantics
      // (flatMapGroupsWithState) — the oracle replays the same greedy
      // alternating scan per link via a recursive CTE
      val src = new TestDataSource(s, d)
      val fm = StreamingSequence.funnel(src.eventsStream, Seq("signup", "purchase"))
      StreamingReplay.run(fm.toDF())
        .select(col("link").as("link_value"),
          element_at(col("stepTs"), 1).as("signup_ts"),
          element_at(col("stepTs"), 2).as("purchase_ts"))
    }),

    "q_stream_changepoint" -> ((s, d) => {
      // streaming CUSUM: per-type day counts in state, the exact integer
      // recurrence re-folded per batch — the single AvailableNow batch
      // emits one verdict per type equal to the batch operator, so the
      // oracle is q_changepoint's recursive-CTE replay verbatim (same
      // doubled-after-19738 fixture via a streaming self-union)
      val src = new TestDataSource(s, d)
      val ev = src.eventsStream
      val doubled = ev.unionByName(src.eventsStream.filter(
        expr("cast(timestamp as bigint) div 86400 >= 19738")))
      StreamingReplay.run(
        graft.streaming.StreamingChangepoint.cusum(
          doubled, "event_type", "timestamp", burnDays = 7).toDF(),
        mode = "update")
    }),

    "q_stream_autocorr" -> ((s, d) => {
      // streaming daily autocorrelation over the same calendar-bounded
      // per-type state: one AvailableNow batch re-folds the exact integer
      // formula → the batch operator's rows, oracle shared verbatim
      val src = new TestDataSource(s, d)
      StreamingReplay.run(
        graft.streaming.StreamingChangepoint.dailyAutocorr(
          src.eventsStream, "event_type", "timestamp").toDF(),
        mode = "update")
    }),

    "q_stream_coverage" -> ((s, d) => {
      // streaming ingest-coverage report: per-type observed span + exact
      // missing-day list from the shared day-count state; same
      // injected-gap fixture filter and portable string join as the batch
      // gate; one batch → the batch operator's rows, oracle shared
      val src = new TestDataSource(s, d)
      StreamingReplay.run(
        graft.streaming.StreamingChangepoint.coverageGaps(
          src.eventsStream.filter(expr(
            "(cast(timestamp as bigint) div 86400 + length(event_type)) % 7 != 0")),
          "event_type", "timestamp").toDF(),
        mode = "update")
        .withColumn("missing", array_join(col("missing"), ","))
    }),

    "q_stream_funnel_excl" -> ((s, d) => {
      // streaming exclusion funnel: per-context (first-A, first-B, veto)
      // state as three packed longs, Update-mode status rows; one
      // AvailableNow batch folds in (ts, eid) order, so the final rows
      // equal the batch operator's — the oracle is shared verbatim
      val src = new TestDataSource(s, d)
      StreamingReplay.run(StreamingExclusion.exclusionFunnel(
        src.eventsStream, "signup", "purchase", "error").toDF(),
        mode = "update")
    }),

    "q_stream_curate" -> ((s, d) => {
      // streaming curation (lang → quality → watermark-bounded dedup →
      // token stats); event time synthesized from doc_id (the corpus has no
      // timestamp column), shifted off epoch 0 — a row AT the initial
      // watermark (et = 0) would be classified late and dropped
      val src = new TestDataSource(s, d)
      val docs = src.documentsStream.withColumn("ets", col("doc_id") + lit(86400L))
      StreamingReplay.run(
        StreamingPipeline.curateStream(docs, "doc_id", "text", "ets"))
    }),

    "q_stream_admit" -> ((s, d) => {
      // streaming incremental admission vs a static corpus key set — the
      // same corpus/batch split (plus re-submitted exact copies) as
      // q_dedup_incremental's exact stages; single AvailableNow micro-batch
      // makes the min-id holder deterministic
      val src = new TestDataSource(s, d)
      def shifted(m: Int, off: Long) = src.documentsStream
        .filter(col("doc_id") % m === (if (m == 7) 3 else 0))
        .select((col("doc_id") + off).as("doc_id"), col("text"))
      val batch = shifted(5, 0L)
        .unionByName(shifted(7, 100000L))
        .unionByName(shifted(10, 200000L))
        .withColumn("ets", col("doc_id") + lit(86400L))
      // corpus SPREAD before the per-row md5/regex key derivation: the
      // documents scan is one split at gate scale (identity at real scale)
      val corpusKeys = graft.pipeline.Projections.spreadInput(
          src.table("documents").filter(col("doc_id") % 5 =!= 0), col("doc_id"))
        .select(graft.pipeline.Dedup.contentKey(col("text")).as("ck")).distinct()
      StreamingReplay.run(
        StreamingPipeline.admitStream(batch, corpusKeys, "doc_id", "text", "ets").toDF())
    }),

    "q_stream_admit_near" -> ((s, d) => {
      // streaming near-dup admission against PERSISTED dedup artifacts —
      // the q_dedup_incremental corpus/batch split; within the single
      // AvailableNow micro-batch, cross-key batch near-dups are admitted
      // (near_dup_batch stays on the batch path), every other status
      // matches the batch rules exactly
      val src = new TestDataSource(s, d)
      def shifted(m: Int, off: Long) = src.documentsStream
        .filter(col("doc_id") % m === (if (m == 7) 3 else 0))
        .select((col("doc_id") + off).as("doc_id"), col("text"))
      val batch = shifted(5, 0L)
        .unionByName(shifted(7, 100000L))
        .unionByName(shifted(10, 200000L))
        .withColumn("ets", col("doc_id") + lit(86400L))
      val corpus = src.table("documents")
        .filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
      val art = graft.pipeline.Dedup.buildDedupArtifacts(corpus, "doc_id", "text")
      StreamingReplay.run(
        StreamingPipeline.admitStreamNear(batch, art, "doc_id", "text", "ets").toDF())
    }),

    "q_stream_score" -> ((s, d) => {
      // nightly-model split: DSIR weights trained batch-side on the corpus
      // at rest, tonight's stream scored + resampled against them — every
      // document gets the decision the batch path gives it, so the oracle
      // is q_dsir_resample's. Complete mode flushes all windows at replay
      // end (the q_stream_windowed pattern)
      val src = new TestDataSource(s, d)
      val weights = graft.pipeline.CorpusSignals.importanceWeights(
        graft.pipeline.Projections.spreadInput(src.table("documents"), col("doc_id")),
        "doc_id", "text", col("source") === "src0", buckets = 512)
      val stream = src.documentsStream
        .withColumn("ets", col("doc_id") + lit(86400L))
      StreamingReplay.run(
        StreamingPipeline.scoreStream(stream, weights, "doc_id", "text", "ets",
          basePpm = 250000L, buckets = 512,
          // complete-mode replay cannot host a second stateful operator;
          // the replayed source is exactly-once, so the dedup guard is moot
          dedupWithinWatermark = false),
        mode = "complete")
    }),

    "q_stream_image_admit" -> ((s, d) => {
      // streaming perceptual admission: stream-side PNGs (doc_id % 5 == 0)
      // decoded + dHashed per row, checked against the static corpus hash
      // table (the other docs) by banded Hamming <= 3 — banding is
      // pigeonhole-exact there, so the oracle is a brute-force pair scan
      val src = new TestDataSource(s, d)
      val corpusHashes = graft.pipeline.Multimodal.imageDHashes(
        graft.pipeline.Multimodal.syntheticPngs(
          graft.pipeline.Projections.spread(
            src.table("documents").filter(col("doc_id") % 5 =!= 0), col("doc_id")),
          "doc_id", 5, 6))
      val stream = graft.pipeline.Multimodal.syntheticPngs(
        src.documentsStream.filter(col("doc_id") % 5 === 0), "doc_id", 5, 6)
      val (decisions, staticSide) =
        StreamingPipeline.admitImagesStreamCached(stream, corpusHashes)
      val out = StreamingReplay.run(decisions.toDF())
      staticSide.unpersist(blocking = false) // replay done: release the corpus cache
      out
    }),

    "q_stream_audio_admit" -> ((s, d) => {
      // streaming acoustic admission: the stream carries 3-frame TRIMMED
      // re-uploads of corpus tracks (under fresh ids) plus novel tracks;
      // blob-local fingerprinting (no window — streaming-legal), a
      // stream-static fp_key join, and a per-batch offset-vote collapse.
      // minVotes = 2 is exact here: two landmarks agreeing on one offset
      // already force three consecutive equal peaks, which the Walsh
      // corpus construction makes impossible across distinct tracks
      val src = new TestDataSource(s, d)
      // corpus ids SPREAD before the synth+decode: the documents scan is
      // one split at gate scale, so the per-row WAV build and fingerprint
      // walk otherwise run single-task (identity at real scale)
      val corpusFps = graft.pipeline.Multimodal.audioLocalFingerprints(
        graft.pipeline.Projections.spread(
            src.table("documents").filter(col("doc_id") % 5 =!= 0)
              .select(col("doc_id").as("media_id")), col("media_id"))
          .select(col("media_id"),
            graft.pipeline.Multimodal.syntheticWalshWav(col("media_id"), 320, 16000)
              .as("bytes")), 64, 2)
      val dups = src.documentsStream.filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 1000000L).as("media_id"),
          graft.pipeline.Multimodal.syntheticWalshWav(col("doc_id"), 192, 16000, 64)
            .as("bytes"))
      val novel = src.documentsStream.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("media_id"),
          graft.pipeline.Multimodal.syntheticWalshWav(col("doc_id"), 192, 16000, 64)
            .as("bytes"))
      val (decisions, staticSide) = StreamingPipeline.admitAudioStreamCached(
        dups.unionByName(novel), corpusFps)
      val out = StreamingReplay.run(decisions.toDF())
      staticSide.unpersist(blocking = false)
      out
    }),

    "q_stream_av_admit" -> ((s, d) => {
      // streamed VIDEOS checked for known audio: the corpus fingerprint
      // index is built nightly and round-tripped through its persisted
      // parquet+params form (readAudioIndex rejects knob mismatches);
      // each arriving AVI's soundtrack is demuxed + fingerprinted
      // blob-locally and offset-vote matched against the index
      val src = new TestDataSource(s, d)
      val mm = graft.pipeline.Multimodal
      val idxDir = java.nio.file.Files.createTempDirectory("graft_audio_idx").toString
      // corpus ids spread before the synth+decode (see q_stream_audio_admit)
      mm.writeAudioIndex(mm.audioLocalFingerprints(
        graft.pipeline.Projections.spread(
            src.table("documents").filter(col("doc_id") % 5 =!= 0)
              .select(col("doc_id").as("media_id")), col("media_id"))
          .select(col("media_id"),
            mm.syntheticWalshWav(col("media_id"), 320, 16000).as("bytes")), 64, 2),
        idxDir, 64, 2)
      val indexed = mm.readAudioIndex(s, idxDir, 64, 2)
      val dupVids = src.documentsStream.filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 2000000L).as("vid"), col("doc_id").as("aid"))
      val novelVids = src.documentsStream.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("vid"), col("doc_id").as("aid"))
      val videos = mm.syntheticAvisAV(dupVids.unionByName(novelVids), "vid", "aid")
      val (decisions, staticSide) =
        StreamingPipeline.admitVideoAudioStreamCached(videos, indexed)
      val out = StreamingReplay.run(decisions.toDF())
      staticSide.unpersist(blocking = false)
      out
    }),

    "q_stream_reach" -> ((s, d) => {
      // streaming new-user detection: one FirstTouch row per context at
      // its first arrival (deterministic in the AvailableNow replay — the
      // single batch sorts by (ts, eid), so first arrival = global first),
      // rolled up batch-side to the daily acquisition curve
      val src = new TestDataSource(s, d)
      StreamingReplay.run(StreamingSessions.firstTouch(src.eventsStream).toDF())
        .groupBy(call_function("div", col("first_ts"), lit(86400L)).as("_day"))
        .agg(count(lit(1)).as("n_new"))
        .select((col("_day") * 86400L).as("day_start"), col("n_new"))
    }),

    "q_stream_sessions" -> ((s, d) => {
      // streaming gap sessionization (flatMapGroupsWithState): a session
      // row is emitted when a LATER event of the context closes it, or when
      // the event-time timeout fires — the replay's final no-data batch
      // advances the watermark to max(event time) - 10min delay and fires
      // every timeout behind it, exactly as an idle production stream
      // would. The oracle models both closure paths; a context's session
      // still open behind the final watermark is (correctly) unemitted
      val src = new TestDataSource(s, d)
      StreamingReplay.run(
        StreamingSessions.sessions(src.eventsStream, gapSec = 21600L).toDF())
    }),

    "q_stream_asof" -> ((s, d) => {
      // stream-static AS-OF: purchases enriched in-stream with the profile
      // version (SCD2 interval frame from view events) current at each
      // purchase's event time — stateless stream side, broadcast dims;
      // same semantics as the batch q_asof_join, same DuckDB ASOF oracle
      val src = new TestDataSource(s, d)
      val views = src.allEvents.filter(col("event_type") === "view")
        .groupBy(col(graft.schema.EventSchema.ContextId), col("timestamp"))
        .agg(max_by(col("value"), col("event_id")).as("value"))
      val iv = graft.pipeline.AsOfJoin.scd2(views,
          graft.schema.EventSchema.ContextId, "timestamp")
        .select(col(graft.schema.EventSchema.ContextId), col("valid_from"),
          col("valid_to"), col("value").as("view_value"))
      val purchases = src.eventsStream.filter(col("event_type") === "purchase")
        .select(col(graft.schema.EventSchema.ContextId), col("event_id"),
          col("timestamp"), col("value"))
      StreamingReplay.run(
        StreamingEnrich.asOfEnrich(purchases, iv,
          graft.schema.EventSchema.ContextId, "timestamp")
          .select(col(graft.schema.EventSchema.ContextId), col("event_id"),
            col("timestamp"), col("value"),
            col("valid_from").as("view_timestamp"), col("view_value")))
    }),

    "q_stream_anomaly" -> ((s, d) => {
      // streaming volume anomalies: a day is scored the moment a later
      // event of the same type closes it (zero gap days included) — each
      // type's last day stays open, so the oracle is the batch derivation
      // with `day < max_day` per type
      val src = new TestDataSource(s, d)
      StreamingReplay.run(
        StreamingAnomaly.anomalies(src.eventsStream,
          windowDays = 7, thresholdPpm = 200000L).toDF())
    }),

    "q_stream_sketch" -> ((s, d) => {
      // streaming KMV distinct-user estimate per event type: bounded
      // 32-long sketch state per group (vs exact streaming distinct whose
      // state grows with the key set); the sketch is a pure set function,
      // so the replayed final estimate equals the batch operator's — the
      // oracle is the same SQL as q_sketch_distinct
      val src = new TestDataSource(s, d)
      StreamingReplay.run(
        StreamingSketches.kmvDistinct(src.eventsStream, "event_type",
          col(graft.schema.EventSchema.ContextId), 32).toDF(),
        mode = "update")
        .withColumnRenamed("group_key", "event_type")
    }),

    "q_stream_windowed" -> ((s, d) => {
      // streaming PER DAY aggregation: tumbling window() + the batch agg
      // column compiler; complete mode so every window is emitted at replay
      // end (same totals as the batch PER DAY path)
      val src = new TestDataSource(s, d)
      val purchases = src.eventsStream.filter(col("event_type") === "purchase")
      StreamingReplay.run(
        StreamingAggregates.windowed(purchases, TimeGranularity.Day,
          Seq(AggSpec.Count, AggSpec.Avg("value")), watermarkDelay = None),
        mode = "complete")
    }),

    "q_stream_join" -> ((s, d) => {
      // stream-stream windowed INNER join: clicks correlated with the same
      // user's purchases within the following hour — both sides are live
      // streams (no static table), co-partitioned into watermark-evicted
      // join state; inner matches emit as they form, so the AvailableNow
      // replay's result is exactly the batch inequality join (the oracle)
      val src = new TestDataSource(s, d)
      StreamingReplay.run(StreamingJoins.windowJoin(
        src.eventsStream.filter(col("event_type") === "click"),
        src.eventsStream.filter(col("event_type") === "purchase"),
        "context_id", "timestamp", "event_id", windowSec = 3600L))
    }),

    "q_stream_cms" -> ((s, d) => {
      // live Count-Min counter table over streaming document shingles:
      // counters are additive, so the streaming aggregation's final
      // complete-mode emission equals the batch counter table exactly
      val src = new TestDataSource(s, d)
      val sh = src.documentsStream.select(
        explode(graft.pipeline.Dedup.shingles(col("text"), 3)).as("sh"))
      StreamingReplay.run(
        StreamingSketches.cmsCounters(sh, col("sh"), depth = 4, width = 512),
        mode = "complete")
    }),

    "q_stream_embed_admit" -> ((s, d) => {
      // streaming SEMANTIC admission: arriving vectors blocked by their
      // IVF home cell against the static corpus postings, confirmed by
      // exact quantized cosine — stateless semi/anti joins, no state store
      val src = new TestDataSource(s, d)
      val corpus = graft.pipeline.Projections.spread(
        src.table("embeddings").filter(col("vec_id") % 3 =!= 0), col("vec_id"))
      val (decisions, postings) = StreamingPipeline.admitEmbedsStreamCached(
        src.embeddingsStream, corpus, "vec_id", "embedding")
      try StreamingReplay.run(decisions)
      finally { postings.unpersist(); () }
    }),

    "q_stream_join_outer" -> ((s, d) => {
      // LEFT OUTER stream-stream join: unconverted clicks surface as
      // null-joined rows once the watermark proves no purchase can still
      // arrive; clicks whose hour is not yet watermark-closed at replay
      // end remain in state (the oracle excludes exactly those)
      val src = new TestDataSource(s, d)
      StreamingReplay.run(StreamingJoins.windowJoin(
        src.eventsStream.filter(col("event_type") === "click"),
        src.eventsStream.filter(col("event_type") === "purchase"),
        "context_id", "timestamp", "event_id", windowSec = 3600L,
        joinType = "left_outer"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // greedy first-touch alternating matcher, replayed per link in strict
    // (ts, event_id) order: a signup arms the state unless already armed; a
    // purchase with armed state emits (signup_ts, purchase_ts) and resets
    "q_stream_funnel" ->
      """WITH RECURSIVE ev AS (
        |  SELECT CAST(user_id AS VARCHAR) AS link,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid,
        |         CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS side,
        |         row_number() OVER (PARTITION BY CAST(user_id AS VARCHAR)
        |                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS rn
        |  FROM events WHERE event_type IN ('signup', 'purchase')),
        |r AS (
        |  SELECT link, CAST(0 AS BIGINT) AS rn, CAST(NULL AS BIGINT) AS pend_ts,
        |         CAST(NULL AS BIGINT) AS em_s, CAST(NULL AS BIGINT) AS em_p
        |  FROM (SELECT DISTINCT link FROM ev)
        |  UNION ALL
        |  SELECT e.link, e.rn,
        |    CASE WHEN e.side = 0 AND r.pend_ts IS NULL THEN e.t
        |         WHEN e.side = 1 THEN NULL
        |         ELSE r.pend_ts END,
        |    CASE WHEN e.side = 1 AND r.pend_ts IS NOT NULL THEN r.pend_ts END,
        |    CASE WHEN e.side = 1 AND r.pend_ts IS NOT NULL THEN e.t END
        |  FROM r JOIN ev e ON e.link = r.link AND e.rn = r.rn + 1)
        |SELECT link AS link_value, em_s AS signup_ts, em_p AS purchase_ts
        |FROM r WHERE em_s IS NOT NULL""".stripMargin,

    // identical to the batch pipeline oracle: the corpus has no duplicate
    // content keys, so first-arrival == min-id survivor and the streaming
    // output equals the batch curation exactly
    "q_stream_curate" -> PipelineQueries.oracleSql("q_pipeline_e2e"),

    // single-batch replay folds in (ts, eid) order → identical to the
    // batch exclusion funnel's three-window oracle
    "q_stream_funnel_excl" -> AnalyticsQueries.oracleSql("q_funnel_exclusion"),

    // one batch → one verdict per type from the same frozen recurrence →
    // the batch changepoint's recursive-CTE oracle verbatim
    "q_stream_changepoint" -> AnalyticsQueries.oracleSql("q_changepoint"),

    // same exact-integer daily formula → the batch autocorrelation oracle
    "q_stream_autocorr" -> AnalyticsQueries.oracleSql("q_autocorr"),

    // span/observed/missing from the same day state → the batch oracle
    "q_stream_coverage" -> AnalyticsQueries.oracleSql("q_coverage_gaps"),

    // frozen weights trained on the same corpus ⇒ the stream decisions
    // equal the batch DSIR score + resample chain row for row
    "q_stream_score" -> PipelineQueries.oracleSql("q_dsir_resample"),

    // the exact stages of q_dedup_incremental's oracle: corpus-key
    // membership, then within-batch keep-min over keys the corpus lacks
    "q_stream_admit" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 3
        |  UNION ALL SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |bk AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ck FROM batch),
        |ckeys AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ck FROM corpus),
        |flagged AS (SELECT bk.*, bk.ck IN (SELECT ck FROM ckeys) AS in_corpus FROM bk),
        |keepers AS (SELECT ck, min(doc_id) AS keep_id FROM flagged WHERE NOT in_corpus GROUP BY ck)
        |SELECT f.doc_id, CASE WHEN f.in_corpus THEN 'dup_exact_corpus'
        |                      WHEN f.doc_id != k.keep_id THEN 'dup_exact_batch'
        |                      ELSE 'admitted' END AS status
        |FROM flagged f LEFT JOIN keepers k USING (ck)""".stripMargin,

    // q_dedup_incremental's rules with the near_dup_batch branch removed
    // (cross-key stream near-dups are admitted — batch-path concern); the
    // near-corpus stage uses exact all-pairs Jaccard in place of the LSH
    // candidates, the same justification as q_dedup_minhash's oracle
    "q_stream_admit_near" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 3
        |  UNION ALL SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |bk AS (SELECT doc_id, text,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ck FROM batch),
        |ckeys AS (SELECT DISTINCT
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ck FROM corpus),
        |flagged AS (SELECT bk.*, bk.ck IN (SELECT ck FROM ckeys) AS in_corpus FROM bk),
        |keepers AS (SELECT ck, min(doc_id) AS keep_id FROM flagged WHERE NOT in_corpus GROUP BY ck),
        |exact AS (SELECT f.doc_id, f.text,
        |    CASE WHEN f.in_corpus THEN 'dup_exact_corpus'
        |         WHEN f.doc_id != k.keep_id THEN 'dup_exact_batch' END AS es
        |  FROM flagged f LEFT JOIN keepers k USING (ck)),
        |survt AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM (SELECT doc_id, text FROM exact WHERE es IS NULL)),
        |sgg AS (SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM survt),
        |corpt AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM corpus),
        |cgg AS (SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM corpt),
        |nearc AS (SELECT DISTINCT a.doc_id FROM sgg a JOIN cgg b
        |  ON len(a.s) > 0 AND len(b.s) > 0 AND
        |     len(list_intersect(a.s, b.s)) * 1.0 /
        |     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5)
        |SELECT e.doc_id, COALESCE(e.es,
        |  CASE WHEN e.doc_id IN (SELECT doc_id FROM nearc) THEN 'near_dup_corpus'
        |       ELSE 'admitted' END) AS status
        |FROM exact e""".stripMargin,

    // dHash-from-formula for every doc (q_image_dhash's oracle), split into
    // corpus/stream halves, brute-force Hamming pair scan for the verdicts
    // single-batch replay ⇒ first arrival = global (ts, eid) minimum, so
    // the oracle is the batch first-day aggregation
    "q_stream_reach" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
        |f AS (SELECT ctx, min(t) AS ft FROM e GROUP BY 1)
        |SELECT (ft // 86400) * 86400 AS day_start, CAST(count(*) AS BIGINT) AS n_new
        |FROM f GROUP BY 1""".stripMargin,

    // the q_stream_audio_admit oracle with video probe ids (+2000000 for
    // re-soundtracked uploads) — the soundtrack is the same global-frame
    // 1..3 trim the WAV probes carry
    "q_stream_av_admit" -> {
      def k(id: String, g: String) = s"(1 + ($id*5 + ((($g)*2) % 5)*(7 + $id%11)) % 63)"
      s"""WITH cl AS (
         |  SELECT doc_id, CAST(g AS BIGINT) AS cf,
         |    (${k("doc_id", "g")}*4096 + ${k("doc_id", "g+d")})*64 + d AS fp_key
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 5 != 0) c
         |  CROSS JOIN (SELECT unnest(range(0, 5)) AS g) gg
         |  CROSS JOIN (SELECT unnest(range(1, 3)) AS d) dd
         |  WHERE g + d <= 4),
         |pr AS (SELECT doc_id + 2000000 AS probe_id, doc_id AS cid
         |    FROM documents WHERE doc_id % 10 = 1
         |  UNION ALL
         |  SELECT doc_id, doc_id FROM documents WHERE doc_id % 5 = 0),
         |pl AS (
         |  SELECT probe_id, CAST(g - 1 AS BIGINT) AS pf,
         |    (${k("cid", "g")}*4096 + ${k("cid", "g+d")})*64 + d AS fp_key
         |  FROM pr
         |  CROSS JOIN (SELECT unnest(range(1, 4)) AS g) gg
         |  CROSS JOIN (SELECT unnest(range(1, 3)) AS d) dd
         |  WHERE g + d <= 3),
         |j AS (SELECT pl.probe_id, cl.doc_id AS m_id, cl.cf - pl.pf AS off,
         |    CAST(count(*) AS BIGINT) AS votes
         |  FROM pl JOIN cl USING (fp_key) GROUP BY 1, 2, 3),
         |best AS (SELECT j.*, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY votes DESC, m_id, off) AS rn FROM j),
         |dup AS (SELECT probe_id AS media_id, 'dup_audio_corpus' AS status,
         |    m_id AS matched_id, CAST(off AS BIGINT) AS offset_frames, votes
         |  FROM best WHERE rn = 1 AND votes >= 2)
         |SELECT * FROM dup
         |UNION ALL
         |SELECT probe_id, 'admitted', CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
         |  CAST(0 AS BIGINT)
         |FROM pr WHERE probe_id NOT IN (SELECT media_id FROM dup)""".stripMargin
    },

    // corpus and probe landmarks derived straight from the Walsh-tone peak
    // formula (q_audio_wht oracle-checks the WHT mechanics); offset votes
    // and the (votes DESC, id ASC, offset ASC) best bucket replayed
    "q_stream_audio_admit" -> {
      def k(id: String, g: String) = s"(1 + ($id*5 + ((($g)*2) % 5)*(7 + $id%11)) % 63)"
      s"""WITH cl AS (
         |  SELECT doc_id, CAST(g AS BIGINT) AS cf,
         |    (${k("doc_id", "g")}*4096 + ${k("doc_id", "g+d")})*64 + d AS fp_key
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 5 != 0) c
         |  CROSS JOIN (SELECT unnest(range(0, 5)) AS g) gg
         |  CROSS JOIN (SELECT unnest(range(1, 3)) AS d) dd
         |  WHERE g + d <= 4),
         |pr AS (SELECT doc_id + 1000000 AS probe_id, doc_id AS cid
         |    FROM documents WHERE doc_id % 10 = 1
         |  UNION ALL
         |  SELECT doc_id, doc_id FROM documents WHERE doc_id % 5 = 0),
         |pl AS (
         |  SELECT probe_id, CAST(g - 1 AS BIGINT) AS pf,
         |    (${k("cid", "g")}*4096 + ${k("cid", "g+d")})*64 + d AS fp_key
         |  FROM pr
         |  CROSS JOIN (SELECT unnest(range(1, 4)) AS g) gg
         |  CROSS JOIN (SELECT unnest(range(1, 3)) AS d) dd
         |  WHERE g + d <= 3),
         |j AS (SELECT pl.probe_id, cl.doc_id AS m_id, cl.cf - pl.pf AS off,
         |    CAST(count(*) AS BIGINT) AS votes
         |  FROM pl JOIN cl USING (fp_key) GROUP BY 1, 2, 3),
         |best AS (SELECT j.*, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY votes DESC, m_id, off) AS rn FROM j),
         |dup AS (SELECT probe_id AS media_id, 'dup_audio_corpus' AS status,
         |    m_id AS matched_id, CAST(off AS BIGINT) AS offset_frames, votes
         |  FROM best WHERE rn = 1 AND votes >= 2)
         |SELECT * FROM dup
         |UNION ALL
         |SELECT probe_id, 'admitted', CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
         |  CAST(0 AS BIGINT)
         |FROM pr WHERE probe_id NOT IN (SELECT media_id FROM dup)""".stripMargin
    },

    "q_stream_image_admit" ->
      s"""WITH h AS (${AnalyticsQueries.dhashOracle}),
         |c AS (SELECT * FROM h WHERE media_id % 5 != 0),
         |s AS (SELECT * FROM h WHERE media_id % 5 = 0),
         |m AS (SELECT DISTINCT s.media_id FROM s JOIN c ON
         |  bit_count(xor(s.hash_hi, c.hash_hi)) + bit_count(xor(s.hash_lo, c.hash_lo)) <= 3)
         |SELECT s.media_id,
         |  CASE WHEN m.media_id IS NOT NULL THEN 'dup_image_corpus' ELSE 'admitted' END AS status
         |FROM s LEFT JOIN m USING (media_id)""".stripMargin,

    // the batch q_sessionize oracle restricted to CLOSED sessions: closed
    // by a later event (session_idx < the context's max) OR by the
    // event-time timeout — due when end + gap passed the replay's final
    // watermark max(t) - 600s (10min delay), strict <, matching Spark's
    // strict timeout-vs-watermark comparison
    "q_stream_sessions" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid FROM events),
        |s AS (SELECT context_id, t, eid,
        |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY context_id ORDER BY t, eid)),
        |x AS (SELECT context_id, t,
        |    CAST(SUM(ns) OVER (PARTITION BY context_id ORDER BY t, eid
        |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM s),
        |g AS (SELECT context_id, session_idx, min(t) AS start_ts, max(t) AS end_ts,
        |    CAST(count(*) AS BIGINT) AS n_events, max(t) - min(t) AS duration_s
        |  FROM x GROUP BY 1, 2)
        |SELECT context_id, session_idx, start_ts, end_ts, n_events, duration_s
        |FROM (SELECT g.*, max(session_idx) OVER (PARTITION BY context_id) AS mx,
        |        (SELECT max(t) FROM e) AS maxt FROM g)
        |WHERE session_idx < mx OR end_ts + 21600 < maxt - 600""".stripMargin,

    // tumbling 1-day windows anchored at the epoch == integer day floor
    // DuckDB's native ASOF LEFT JOIN — the batch q_asof_join oracle
    "q_stream_asof" ->
      """WITH v AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS vt, arg_max(value, event_id) AS vv
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT CAST(user_id AS VARCHAR) AS context_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.context_id, p.event_id, p.t AS "timestamp", p.value,
        |  v.vt AS view_timestamp, v.vv AS view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.context_id = v.context_id AND p.t >= v.vt""".stripMargin,

    // the batch anomaly derivation minus each type's still-open max day
    "q_stream_anomaly" ->
      """WITH c AS (SELECT event_type AS et, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |sp AS (SELECT et, min(day) AS d0, max(day) AS d1 FROM c GROUP BY 1),
        |dense AS (SELECT sp.et, sp.d0, sp.d1, gs.day
        |  FROM sp, LATERAL (SELECT unnest(generate_series(sp.d0, sp.d1)) AS day) gs),
        |dc AS (SELECT dense.et, dense.d0, dense.d1, dense.day, coalesce(c.cnt, 0) AS cnt
        |  FROM dense LEFT JOIN c ON dense.et = c.et AND dense.day = c.day),
        |tr AS (SELECT et, d0, d1, day, cnt,
        |    sum(cnt) OVER (PARTITION BY et ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail FROM dc),
        |dev AS (SELECT et, day, cnt, trail, (cnt * 7 - trail) * 1000000 AS nn FROM tr
        |  WHERE day >= d0 + 7 AND day < d1 AND trail > 0)
        |SELECT et AS event_type, CAST(day * 86400 AS BIGINT) AS day_start, cnt,
        |  CAST(trail AS BIGINT) AS trail_total,
        |  CAST(CASE WHEN nn >= 0 THEN nn // trail ELSE -((-nn) // trail) END AS BIGINT) AS dev_ppm
        |FROM dev
        |WHERE abs(CASE WHEN nn >= 0 THEN nn // trail ELSE -((-nn) // trail) END) >= 200000""".stripMargin,

    // the streaming sketch's final state is a pure set function of the
    // input, so the oracle is the batch KMV derivation verbatim
    "q_stream_sketch" ->
      s"""WITH h AS (SELECT event_type, ${graft.pipeline.Hashing.duckMd5Long("CAST(user_id AS VARCHAR)")} AS hv FROM events),
         |sk AS (SELECT event_type, (list_sort(list(DISTINCT hv)))[1:32] AS sk FROM h GROUP BY event_type)
         |SELECT event_type, CAST(len(sk) AS BIGINT) AS sketch_size,
         |  CAST(CASE WHEN len(sk) = 0 THEN 0 ELSE sk[least(len(sk), 32)] END AS BIGINT) AS kth_hash,
         |  ${graft.pipeline.Sketches.duckKmvEstimate("sk", 32)} AS est_distinct
         |FROM sk""".stripMargin,

    "q_stream_windowed" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS bucket,
        |  CAST(count(*) AS BIGINT) AS "count",
        |  avg(CAST(trunc(value) AS BIGINT)) AS avg_value
        |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,

    // inner stream-stream matches are emission-order-free and complete
    // (the watermark only evicts state), so the oracle is the batch
    // inequality join with the same inclusive window bounds
    "q_stream_join" ->
      """WITH l AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS left_ts, event_id AS left_id
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS right_ts, event_id AS right_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT l.key, l.left_id, l.left_ts, r.right_id, r.right_ts
        |FROM l JOIN r ON l.key = r.key
        |  AND r.right_ts >= l.left_ts AND r.right_ts <= l.left_ts + 3600""".stripMargin,

    // additive counters: the replayed complete-mode table IS the batch
    // counter table (the q_sketch_cms counters CTE)
    "q_stream_cms" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |o AS (SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh FROM t),
         |js AS (SELECT unnest([0, 1, 2, 3]) AS j)
         |SELECT j, ${graft.pipeline.Hashing.duckMd5Long("('cms' || CAST(j AS VARCHAR) || '|' || sh)")} % 512 AS bucket,
         |  CAST(count(*) AS BIGINT) AS c
         |FROM o CROSS JOIN js GROUP BY 1, 2""".stripMargin,

    // cell-blocked semantic admission: a stream vector is a dup iff some
    // SAME-CELL corpus vector reaches the cosine threshold (the cell rule
    // is part of the contract — the oracle models it, not global cosine)
    "q_stream_embed_admit" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |corpus AS (SELECT * FROM v WHERE vec_id % 3 != 0),
        |c AS (SELECT vec_id AS cid, qv AS centroid FROM corpus ORDER BY vec_id LIMIT 16),
        |pc AS (SELECT vec_id, qv, cid FROM (
        |  SELECT corpus.vec_id, corpus.qv, c.cid,
        |         row_number() OVER (PARTITION BY corpus.vec_id ORDER BY list_dot_product(corpus.qv, c.centroid) DESC, c.cid ASC) AS rk
        |  FROM corpus CROSS JOIN c) WHERE rk = 1),
        |sc AS (SELECT vec_id, qv, cid FROM (
        |  SELECT v.vec_id, v.qv, c.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
        |  FROM v CROSS JOIN c) WHERE rk = 1)
        |SELECT sc.vec_id, CASE WHEN EXISTS (SELECT 1 FROM pc
        |    WHERE pc.cid = sc.cid AND list_dot_product(sc.qv, pc.qv) /
        |      (sqrt(list_dot_product(sc.qv, sc.qv)) * sqrt(list_dot_product(pc.qv, pc.qv))) >= 0.4)
        |  THEN 'dup_semantic_corpus' ELSE 'admitted' END AS status
        |FROM sc""".stripMargin,

    // matched pairs are the batch join; a null-joined row appears for an
    // unmatched click only once its whole window sits below the final
    // watermark (min of the two sources' max event time, minus the
    // 10-minute delay) — later unmatched clicks are still held in state
    "q_stream_join_outer" ->
      """WITH l AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS left_ts, event_id AS left_id
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS right_ts, event_id AS right_id
        |  FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(left_ts) FROM l),
        |                    (SELECT max(right_ts) FROM r)) - 600 AS w)
        |SELECT l.key, l.left_id, l.left_ts, r.right_id, r.right_ts
        |FROM l JOIN r ON l.key = r.key
        |  AND r.right_ts >= l.left_ts AND r.right_ts <= l.left_ts + 3600
        |UNION ALL
        |SELECT l.key, l.left_id, l.left_ts,
        |  CAST(NULL AS BIGINT) AS right_id, CAST(NULL AS BIGINT) AS right_ts
        |FROM l, wm
        |WHERE l.left_ts + 3600 < wm.w
        |  AND NOT EXISTS (SELECT 1 FROM r WHERE r.key = l.key
        |    AND r.right_ts >= l.left_ts AND r.right_ts <= l.left_ts + 3600)""".stripMargin
  )
}
