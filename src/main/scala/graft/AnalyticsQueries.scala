package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.sources.TestDataSource

/** Round-8 analytics operators with DuckDB oracles: event sessionization +
  * cohort retention (beyond the reference's funnel surface), C4-style
  * global line dedup, scalar embedding quantization, and perceptual image
  * dHash + banded near-dup.
  *
  * Oracle discipline matches [[PipelineQueries]]: the SQL recomputes each
  * result from first principles (window formulations and brute-force pair
  * scans ARE allowed in oracles — they define the semantics the scaled
  * Spark plans must reproduce byte-identically).
  */
object AnalyticsQueries {
  import Hashing.duckMd5Long

  // spread (size-gated, identity at real scale): the gate tables are ONE
  // parquet split each, so per-row expression work (regex, md5, props
  // parsing, wide agg partials) otherwise runs single-task — guide §2.5.
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Projections.spreadInput(
      new TestDataSource(spark, dir).table("documents"), col("doc_id"))

  private def embs(spark: SparkSession, dir: String): DataFrame =
    Projections.spreadInput(
      new TestDataSource(spark, dir).table("embeddings"), col("vec_id"))

  // events is NOT spread here (r19, measured): the events analytics maps
  // are cheap projections (their cost lives in the context-keyed
  // exchanges), and the extra spread exchange cost the 57-gate family a
  // net +6.5 s at the bench's cold-plan grain (worst q_churn_hazard
  // +0.85 s) while only the wide-agg q_profile_table gained — that one
  // gate spreads inline at its definition.
  private def events(spark: SparkSession, dir: String): DataFrame =
    new TestDataSource(spark, dir).allEvents

  /** Multi-line doc synthesis for the line-dedup gate (the testdata has no
    * newlines of its own — same trick as q_strip_lines): a corpus-wide
    * header, a `para-(id%50)` line shared by ~10 docs, a blank line for
    * every 4th doc, the doc's own (unique) text, and a `tail-(id%7)` line
    * shared by ~70. */
  private def multiLineDocs(d: DataFrame): DataFrame =
    d.select(col("doc_id"), concat(
      lit("SHARED HEADER\n"),
      lit("para-"), (col("doc_id") % 50).cast("string"), lit("\n"),
      when(col("doc_id") % 4 === 0, lit("\n")).otherwise(lit("")),
      col("text"),
      lit("\ntail-"), (col("doc_id") % 7).cast("string")).as("text"))

  private def pngHashes(s: SparkSession, d: String): DataFrame =
    Multimodal.imageDHashes(Multimodal.syntheticPngs(docs(s, d), "doc_id", 5, 6))

  /** Doc ids spread to the session shuffle width BEFORE a per-row WAV
    * synthesis: the documents scan is one file split at gate scale, so the
    * synth expression (hundreds of `transform` elements per row) plus the
    * downstream decode/WHT otherwise run on ONE task while the other cores
    * idle (r19 profile: 2.4 s single-task corpus-fingerprint jobs).
    * Identity at real scale — [[Projections.spread]] gates on plan size,
    * and only skinny id rows cross the exchange. */
  private def wavIds(s: SparkSession, d: String,
      pred: Column => Column = _ => lit(true)): DataFrame =
    Projections.spread(
      docs(s, d).filter(pred(col("doc_id")))
        .select(col("doc_id").as("media_id")), col("media_id"))

  /** 5-frame (320-sample) synthetic WAV corpus for the audio-fingerprint
    * gates — long enough that a 3-frame probe trimmed from the middle has
    * landmark pairs on both sides of its cut. */
  private def whtWavs(s: SparkSession, d: String): DataFrame =
    wavIds(s, d).select(col("media_id"),
      Multimodal.syntheticWav(col("media_id"), 320, 16000).as("bytes"))

  /** 5-frame Walsh-tone corpus for the fingerprint/match gates: per-frame
    * spectral peaks are analytically `K(id, g)` and DISTINCT across
    * tracks, so matching is demonstrably discriminative (the ramp corpus
    * is spectrally degenerate — every track peaks alike). */
  private def walshWavs(s: SparkSession, d: String): DataFrame =
    wavIds(s, d).select(col("media_id"),
      Multimodal.syntheticWalshWav(col("media_id"), 320, 16000).as("bytes"))

  // ---------------- queries ----------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize" -> ((s, d) =>
      // 6h-inactivity-gap sessions over ALL event types; one shuffle on the
      // context, windows and the session aggregate reuse its partitioning
      EventAnalytics.sessionize(events(s, d),
        "context_id", "timestamp", "event_id", gapSec = 21600L)),

    "q_media_crossdup" -> ((s, d) => {
      // cross-media exact dedup: which standalone JPEGs appear
      // pixel-identically as frames inside the MJPEG videos — both sides
      // collapse to the shared content key map-side, then ONE key
      // equi-join; the oracle derives every key analytically from the
      // generation formulas, so decode + keying must round-trip exactly
      val dd = docs(s, d)
      Multimodal.crossMediaDups(
        Multimodal.syntheticJpegs(dd, "doc_id"),
        Multimodal.syntheticAvis(dd, "doc_id"))
    }),

    "q_pivot_daily" -> ((s, d) =>
      // wide daily report: per-day event counts pivoted into one column
      // per type — Spark's pivot with an EXPLICIT value list stays a
      // single partial+final aggregation (no second pass to discover
      // values); the oracle is conditional aggregation
      events(s, d)
        .groupBy(call_function("div", col("timestamp"), lit(86400L)).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        // a (day, type) cell with no events pivots to null; the report
        // (and the oracle's conditional count) says 0
        .select(col("day") * 86400 +: Seq("click", "error", "purchase", "signup", "view")
          .map(c => coalesce(col(c), lit(0L))): _*)
        .toDF("day_start", "click", "error", "purchase", "signup", "view")),

    "q_scd2" -> ((s, d) => {
      // SCD-2 intervals from the view-event version feed: each user's
      // profile versions become [valid_from, valid_to) rows (null = open);
      // the asOf match at t is exactly the interval containing t
      val ev = events(s, d)
      val versions = ev.filter(col("event_type") === "view")
        .groupBy(col("context_id"), col("timestamp"))
        .agg(max_by(col("value"), col("event_id")).as("value"))
      AsOfJoin.scd2(versions, "context_id", "timestamp")
        .select(col("context_id"), col("valid_from").cast("long").as("valid_from"),
          col("valid_to"), col("value"))
    }),

    "q_anomaly_days" -> ((s, d) =>
      // volume anomalies: (type, day) counts deviating >= 20% from the
      // trailing 7-day mean; zero days densified so craters flag too; all
      // scoring on day-grain rows, window-free (map-side window-end
      // explosion, the engagement pattern)
      EventAnalytics.anomalousDays(events(s, d), "event_type", "timestamp",
        windowDays = 7, thresholdPpm = 200000L)),

    "q_range_join" -> ((s, d) => {
      // band join: lineitem prices (cents) matched into 10 deterministic
      // price tiers + one wide overlapping promo band — non-equi predicate
      // rewritten as bucket equi-join + residual filter, never a
      // nested-loop; a price outside every band drops (inner), promo
      // prices match twice
      val li = new TestDataSource(s, d).table("lineitem")
        .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val tiers = s.range(10).select(
        (col("id") * 1000000L).as("lo"),
        (col("id") * 1000000L + 500000L + (col("id") % 3) * 250000L).as("hi"),
        concat(lit("tier"), col("id").cast("string")).as("tier"))
      val bands = tiers.unionByName(s.range(1).select(
        lit(2500000L).as("lo"), lit(7500000L).as("hi"), lit("promo").as("tier")))
      RangeJoin.bandJoin(li, col("price_c"), bands, "lo", "hi", bucketWidth = 250000L)
        .select(col("id"), col("price_c"), col("lo"), col("hi"), col("tier"))
    }),

    "q_interval_join" -> ((s, d) => {
      // interval×interval overlap: per-order fulfillment windows vs
      // deterministic promo windows — both sides bucketized, equi-join on
      // the bucket, each pair claimed once in its overlap-start bucket
      // (dedup is a filter, never a distinct pass)
      val idiv = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        call_function("div", a, b)
      val orders = new TestDataSource(s, d).table("orders")
        .select(col("o_orderkey").as("order_id"),
          // NTZ → timestamp (UTC session) → epoch seconds → day
          idiv(col("o_orderdate").cast("timestamp").cast("long"), lit(86400L)).as("o_lo"))
        .withColumn("o_hi", col("o_lo") + 7 + pmod(col("order_id"), lit(30L)))
      val promos = s.range(75).select(col("id").as("promo_id"),
          (lit(8035L) + col("id") * 35).as("p_lo"))
        .withColumn("p_hi", col("p_lo") + 14 + pmod(col("promo_id"), lit(3L)) * 7)
      RangeJoin.intervalJoin(orders, "o_lo", "o_hi", promos, "p_lo", "p_hi",
          bucketWidth = 32L)
        .select(col("order_id"), col("o_lo"), col("o_hi"),
          col("promo_id"), col("p_lo"), col("p_hi"))
    }),

    "q_asof_join" -> ((s, d) => {
      // temporal AS-OF join: every purchase matched to the user's latest
      // view at or before it (the "current profile version" question) —
      // one key shuffle + sorted carry-forward, oracle is DuckDB's native
      // ASOF LEFT JOIN; dims pre-deduped per (user, ts) via max_by so the
      // match is deterministic on both engines
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("context_id"), col("event_id"), col("timestamp"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("context_id"), col("timestamp"))
        .agg(max_by(col("value"), col("event_id")).as("value"))
      AsOfJoin.asOf(purchases, views, "context_id", "timestamp", "timestamp",
        dimPrefix = "view_")
    }),

    "q_asof_forward" -> ((s, d) => {
      // FORWARD as-of: each purchase matched to the NEXT error of the same
      // context within a day ("did the checkout break right after?") —
      // the same one-shuffle carry pass scanning descending
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("context_id"), col("event_id"), col("timestamp"), col("value"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(col("context_id"), col("timestamp"))
        .agg(max_by(col("value"), col("event_id")).as("value"))
      AsOfJoin.asOf(purchases, errors, "context_id", "timestamp", "timestamp",
        dimPrefix = "err_", toleranceSec = Some(86400L), forward = true)
    }),

    "q_session_funnel" -> ((s, d) =>
      // within-session signup → purchase conversion, first-touch, strict
      // (ts, event_id) order — the session-scoped funnel report
      EventAnalytics.sessionFunnel(events(s, d),
        "context_id", "timestamp", "event_id", "event_type",
        gapSec = 21600L, stepA = "signup", stepB = "purchase")),

    "q_session_funnel_k" -> ((s, d) =>
      // k-step within-session funnel (view → click → purchase): greedy
      // first-touch chain walk over each session's sorted step events —
      // ONE (context)-keyed exchange, no per-step join
      EventAnalytics.sessionFunnelK(events(s, d),
        "context_id", "timestamp", "event_id", "event_type",
        gapSec = 21600L, steps = Seq("view", "click", "purchase"))
        .select(col("context_id"), col("session_idx"), col("n_events"),
          try_element_at(col("step_ts"), lit(1)).as("s1_ts"),
          try_element_at(col("step_ts"), lit(2)).as("s2_ts"),
          try_element_at(col("step_ts"), lit(3)).as("s3_ts"),
          col("steps_done"), col("converted"))),

    "q_coverage_gaps" -> ((s, d) =>
      // ingest-hole report over a fixture with injected gaps (days where
      // (day + len(type)) % 7 == 0 are dropped): span vs observed vs the
      // exact missing-day list, joined to a string for portable hashing
      EventAnalytics.coverageGaps(
        events(s, d).filter(
          expr("(cast(timestamp as bigint) div 86400 + length(event_type)) % 7 != 0")),
        "event_type", "timestamp")
        .withColumn("missing", array_join(col("missing"), ","))),

    "q_autocorr" -> ((s, d) =>
      // lag-1 / lag-7 autocorrelation of each type's daily counts, exact
      // signed ppm from scaled-integer centering — the seasonality read
      EventAnalytics.dailyAutocorrelation(events(s, d),
        "event_type", "timestamp")),

    "q_changepoint" -> ((s, d) => {
      // CUSUM level-shift detection: the uniform testdata has no shift of
      // its own, so the fixture doubles every event from 2024-01-16
      // (epoch day 19738) on — each type must flag an 'up' changepoint
      // within days of the injected step, and the exact-integer recurrence
      // must match the oracle's replay bit-for-bit
      val ev = events(s, d)
      EventAnalytics.cusumChangepoint(
        ev.unionByName(ev.filter(
          expr("cast(timestamp as bigint) div 86400 >= 19738"))),
        "event_type", "timestamp", burnDays = 7)
    }),

    "q_funnel_exclusion" -> ((s, d) =>
      // exclusion funnel: signup → purchase with NO error strictly between
      // the first signup and the first purchase after it — three windowed
      // conditional extrema over one hash(context) exchange
      EventAnalytics.funnelExclusion(events(s, d),
        "context_id", "timestamp", "event_id", "event_type",
        stepA = "signup", stepB = "purchase", excludeC = "error")),

    "q_time_to_convert" -> ((s, d) => {
      // conversion-latency distribution: exact percentiles of
      // (purchase_ts - signup_ts) over CONVERTED sessions only
      val sf = EventAnalytics.sessionFunnel(events(s, d),
        "context_id", "timestamp", "event_id", "event_type",
        gapSec = 21600L, stepA = "signup", stepB = "purchase")
        .filter(col("converted"))
        .select(lit("signup_to_purchase").as("funnel"),
          (col("b_ts") - col("a_ts")).as("_lat"))
      sf.groupBy("funnel").agg(
        count(lit(1)).as("n"),
        min(col("_lat")).as("lat_min"),
        max(col("_lat")).as("lat_max"),
        round(percentile(col("_lat"), lit(0.5)), 6).as("p50"),
        round(percentile(col("_lat"), lit(0.9)), 6).as("p90"))
    }),

    "q_funnel_dropoff" -> ((s, d) =>
      // the funnel report card: sessions → reached signup → converted,
      // with exact ppm conversion rates at each stage
      EventAnalytics.sessionFunnel(events(s, d),
        "context_id", "timestamp", "event_id", "event_type",
        gapSec = 21600L, stepA = "signup", stepB = "purchase")
        .agg(
          count(lit(1)).as("n_sessions"),
          count(col("a_ts")).as("reached_a"),
          count(col("b_ts")).as("converted"))
        .select(col("n_sessions"), col("reached_a"), col("converted"),
          expr("(converted * 1000000) div n_sessions").as("conv_ppm"),
          expr("case when reached_a = 0 then 0 else (converted * 1000000) div reached_a end").as("conv_of_a_ppm"))),

    "q_funnel_weekly" -> ((s, d) =>
      // funnel trend: conversion of signup-reached sessions bucketed by
      // the epoch week of the first touch — the report that shows a
      // funnel regressing over time rather than in aggregate
      EventAnalytics.sessionFunnel(events(s, d),
        "context_id", "timestamp", "event_id", "event_type",
        gapSec = 21600L, stepA = "signup", stepB = "purchase")
        .filter(col("a_ts").isNotNull)
        .groupBy(expr("a_ts div 604800").as("week"))
        .agg(count(lit(1)).as("reached_a"),
          count(col("b_ts")).as("converted"))
        .select(col("week"), col("reached_a"), col("converted"),
          expr("(converted * 1000000) div reached_a").as("conv_ppm"))),

    "q_event_transitions" -> ((s, d) =>
      // Markov transition matrix over each context's event order, row
      // probabilities in ppm
      EventAnalytics.eventTransitions(events(s, d),
        "context_id", "timestamp", "event_id", "event_type")),

    "q_event_gaps" -> ((s, d) =>
      // idle-time distribution before each action type: exact p50/p90 over
      // integer second gaps
      EventAnalytics.interEventGaps(events(s, d),
        "context_id", "timestamp", "event_id", "event_type")),

    "q_engagement" -> ((s, d) =>
      // DAU / trailing-7-day WAU / stickiness — rolling distinct via
      // map-side window-end explosion of deduplicated (user, day) pairs
      EventAnalytics.engagement(events(s, d), "context_id", "timestamp")),

    "q_retention" -> ((s, d) =>
      // first-active-week cohorts × weekly activity; collect_set bounded by
      // weeks-per-user
      EventAnalytics.retentionCohorts(events(s, d), "context_id", "timestamp")),

    "q_retention_rolling" -> ((s, d) =>
      // rolling retention ("active at or after week w"): per-user
      // (cohort, last-week) row expanded to its offsets — monotone in w,
      // window-free
      EventAnalytics.retentionRolling(events(s, d), "context_id", "timestamp")),

    "q_retention_cal" -> ((s, d) =>
      // CALENDAR-week cohorts in a DST-observing zone over the multi-year
      // lineitem history (suppliers as the entity): a week is local
      // Mon-00:00..Mon-00:00 even when it spans the spring/fall transition
      new TestDataSource(s, d).frame("lineitem").transform(li =>
        EventAnalytics.retentionCohortsCalendar(li, "l_suppkey", "timestamp",
          zone = "America/New_York"))),

    "q_engagement_cal" -> ((s, d) =>
      // NY-local calendar-day DAU / trailing-7-calendar-day WAU over the
      // same DST-crossing history
      new TestDataSource(s, d).frame("lineitem").transform(li =>
        EventAnalytics.engagementCalendar(li, "l_suppkey", "timestamp",
          zone = "America/New_York"))),

    "q_value_percentiles" -> ((s, d) =>
      // exact p50/p90/p99 value distribution per event type — identical
      // interpolation definition (h = p·(n−1)) on both engines over
      // quantized integers
      EventAnalytics.valuePercentiles(events(s, d), "event_type", "value")),

    "q_top_events_per_ctx" -> ((s, d) =>
      // each user's 3 biggest purchases: bounded two-phase top-k per group
      // (TopKByDot), never a per-context row_number window
      EventAnalytics.topEventsPerContext(
        events(s, d).filter(col("event_type") === "purchase"),
        "context_id", "event_id", "value", "timestamp", k = 3)),

    "q_line_dedup" -> ((s, d) =>
      // C4-style global line dedup: keep only the first (doc, pos)
      // occurrence of every non-blank line corpus-wide; groupBy-min winner
      // (map-side combinable), never a per-line row_number window
      CorpusSignals.dedupLinesGlobal(multiLineDocs(docs(s, d)), "doc_id", "text")),

    "q_hybrid_search" -> ((s, d) =>
      // lexical + dense hybrid retrieval: inverse-df term score (x1000) +
      // exact integer dot against doc 0's embedding, global top-15
      Search.hybridTopK(docs(s, d), embs(s, d).withColumnRenamed("vec_id", "doc_id"),
        "doc_id", "text", "embedding", Seq("dup", "vector"), queryId = 0L,
        k = 15, wTerm = 1000L, wVec = 1L)),

    "q_search_mrr" -> ((s, d) => {
      // MRR@10 self-retrieval acceptance: every 25th doc's first 3 tokens
      // as the query, the doc itself the relevant answer — posting-style
      // token join for candidates, rank = 1 + #better (no sort)
      val dd = docs(s, d)
      val qs = dd.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("query_id"),
          slice(split(trim(col("text")), "\\s+"), 1, 3).as("terms"),
          col("doc_id").as("relevant"))
      Search.mrrEval(dd, "doc_id", "text", qs, "query_id", "terms", "relevant")
    }),

    "q_hybrid_search_batch" -> ((s, d) => {
      // BATCHED hybrid retrieval: 3 queries (terms + vectors as table
      // rows) through ONE job — amortized driver collects, map-side
      // per-query scoring, bounded TopKByDot per query
      import s.implicits._
      val qt = Seq(
        (0L, Seq("dup", "vector")),
        (1L, Seq("data", "sample")),
        (2L, Seq("unique", "hash"))).toDF("query_id", "terms")
      Search.hybridTopKBatch(docs(s, d),
        embs(s, d).withColumnRenamed("vec_id", "doc_id"),
        "doc_id", "text", "embedding", qt, "query_id", "terms",
        k = 5, wTerm = 1000L, wVec = 1L)
    }),

    "q_embed_quantize" -> ((s, d) =>
      // int8-style scalar quantization: per-dim min/max (bounded collect) +
      // one codegen'd encode pass, fingerprint over all 64 codes
      Similarity.scalarQuantize(embs(s, d), "vec_id", "embedding")),

    "q_media_sniff" -> ((s, d) => {
      // untyped-media dispatch: nine formats' REAL synthetic blobs (the
      // same generators the decode gates use), routed purely by file
      // signature — the oracle knows only the id→format rule, so a wrong
      // magic match on any generator's bytes fails the row
      val dd = docs(s, d)
      def part(m: Int) = dd.filter(col("doc_id") % 9 === m)
      val blobs = Multimodal.syntheticPngs(part(0), "doc_id", 5, 6)
        .unionByName(Multimodal.syntheticJpegs(part(1), "doc_id"))
        .unionByName(Multimodal.syntheticGifs(part(2), "doc_id"))
        .unionByName(Multimodal.syntheticTiffs(part(3), "doc_id"))
        .unionByName(Multimodal.syntheticAvis(part(4), "doc_id"))
        .unionByName(part(5).select(col("doc_id").as("media_id"),
          Multimodal.syntheticBmp(col("doc_id"), 5, 4).as("bytes")))
        .unionByName(part(6).select(col("doc_id").as("media_id"),
          Multimodal.syntheticPpm(col("doc_id"), 5, 4).as("bytes")))
        .unionByName(part(7).select(col("doc_id").as("media_id"),
          Multimodal.syntheticWav(col("doc_id"), 64, 16000).as("bytes")))
        .unionByName(Multimodal.syntheticMp3s(part(8), "doc_id"))
      blobs.select(col("media_id"),
        Multimodal.sniffFormat(col("bytes")).as("format"))
    }),

    "q_audio_vad" -> ((s, d) =>
      // voice-activity detection: silent frames by the (g + id) mod 3
      // rule at peak ≤ 15, active frames provably peak ≥ 1000 (the 6208-
      // span argument), threshold 1000, gap-merge = frame sessionization;
      // the oracle needs only the silence rule, never a sample replay
      Multimodal.voiceActivity(
        wavIds(s, d).select(col("media_id"),
          Multimodal.syntheticGatedWav(col("media_id"), 384, 16000).as("bytes")),
        frameSize = 64, peakThreshold = 1000L)),

    "q_audio_frames" -> ((s, d) =>
      // windowed audio QC through the REAL WAV chunk walk: 256 samples cut
      // into four 64-sample frames, per-frame sum/peak/zero-crossings/RMS
      // (round(rms, 6) — the sum of squares is an exact integer, so both
      // engines compute the identical double)
      Multimodal.audioFrames(wavIds(s, d).select(
          col("media_id"),
          Multimodal.syntheticWav(col("media_id"), 256, 16000).as("bytes")),
        frameSize = 64)
        .withColumn("rms", round(col("rms"), 6))),

    "q_audio_wht" -> ((s, d) =>
      // per-frame spectral peak through the REAL WAV walk + an EXACT-
      // INTEGER Walsh–Hadamard transform (integer sums are associative,
      // so the oracle replays the spectrum bit-for-bit via bit_count)
      Multimodal.audioWhtPeaks(whtWavs(s, d), frameSize = 64)),

    "q_audio_fp" -> ((s, d) =>
      // Shazam-shape landmark fingerprints over the Walsh-tone corpus:
      // (anchor peak, target peak, Δframes) packed into one key — ONE
      // per-media window pass computes every Δ lead, then a map-side
      // explode; no peak-table self-join. The decode side runs the full
      // WAV walk + WHT; the oracle reads the peaks off the tone formula
      Multimodal.audioFingerprints(
        Multimodal.audioWhtPeaks(walshWavs(s, d), frameSize = 64), maxDelta = 2)),

    "q_audio_match" -> ((s, d) => {
      // offset-histogram audio matching: probes are 3-frame TRIMMED COPIES
      // (one-frame phase shift) of every 4th corpus track; candidates come
      // from the fp_key equi-join (cost ∝ key collisions, never probes ×
      // corpus), votes bucket on (media, offset), best bucket wins — every
      // probe resolves to its true source at offset +1 with all 3 votes
      // (peak sequences are distinct across tracks by construction)
      val corpus = Multimodal.audioFingerprints(
        Multimodal.audioWhtPeaks(walshWavs(s, d), frameSize = 64), maxDelta = 2)
      val probes = Multimodal.audioFingerprints(
        Multimodal.audioWhtPeaks(wavIds(s, d, _ % 4 === 0)
          .select(col("media_id"),
            Multimodal.syntheticWalshWav(col("media_id"), 192, 16000, startSample = 64)
              .as("bytes")),
          frameSize = 64), maxDelta = 2)
      Multimodal.matchAudioFingerprints(probes, corpus)
    }),

    "q_av_soundtrack" -> ((s, d) => {
      // cross-media acoustic dedup: every even-doc video carries a real
      // two-stream AVI (MJPEG frames + interleaved 01wb PCM16 soundtrack,
      // a one-frame trim of the doc's Walsh track); the soundtrack is
      // container-parsed, fingerprinted blob-locally, and offset-vote
      // matched against the standalone track corpus — each video resolves
      // to its own track at offset +1 with all 3 votes
      val videoFps = Multimodal.videoSoundtrackFingerprints(
        Multimodal.syntheticAvisAV(docs(s, d).filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("doc_id").as("audio_id")), "doc_id", "audio_id"))
      val corpusFps = Multimodal.audioLocalFingerprints(walshWavs(s, d), 64, 2)
      Multimodal.matchAudioFingerprints(videoFps, corpusFps)
    }),

    "q_entry_exit" -> ((s, d) =>
      // landing/exit report over 6h-gap sessions: entry/exit types ride a
      // struct min/max on the (context, session) aggregate — the
      // assignSessions exchange serves every stage, then one tiny
      // (entry, exit) matrix aggregation
      EventAnalytics.sessionEntryExit(events(s, d),
        "context_id", "timestamp", "event_id", "event_type", gapSec = 21600L)),

    "q_churn_hazard" -> ((s, d) =>
      // discrete Kaplan–Meier life table: per-context lifetimes (one
      // context-keyed aggregation), churn = silent for >7 days before the
      // corpus's last active day, risk sets via a window over the
      // aggregated table only — all columns exact integers
      EventAnalytics.churnLifeTable(events(s, d),
        "context_id", "timestamp", horizonDays = 7L)),

    "q_cohort_ltv" -> ((s, d) =>
      // weekly revenue cohorts: milli-quantized BEFORE summing, cumulative
      // LTV via a window over the (cohort, offset) matrix, per-user LTV
      // against the cohort's offset-0 size
      EventAnalytics.cohortLtv(events(s, d),
        "context_id", "timestamp", "value", bucketSec = 604800L)),

    "q_skipgram" -> ((s, d) =>
      // word2vec co-occurrence pairs, window ±2: one per-doc window pass
      // computes every forward lead, the symmetric direction mirrors
      // map-side — no positions self-join
      CorpusSignals.skipGramPairs(docs(s, d), "doc_id", "text", window = 2)),

    "q_target_encode" -> ((s, d) =>
      // leakage-safe LOO target encoding of event_type against value:
      // category sums broadcast back, (sum − own) div (n − 1) in exact
      // milli; singleton categories encode NULL
      Features.targetEncodeLoo(events(s, d),
        "event_id", "event_type", "value")),

    "q_bootstrap_lift" -> ((s, d) => {
      // replica-paired bootstrap of the arm-mean difference: the CI on
      // the A/B lift without normality assumptions; arm assignment (md5
      // parity on context) and resample draws (md5 on event) independent
      val ev = events(s, d).filter(col("event_type") === "purchase")
        .withColumn("arm", pmod(Hashing.md5Long(
          concat(lit("ab:"), col("context_id").cast("string"))), lit(2L)))
      Profile.bootstrapLift(ev, "event_id", "value", "arm")
    }),

    "q_bootstrap_ci" -> ((s, d) =>
      // Poisson bootstrap of the mean purchase value: 32 deterministic
      // replicas from md5-inverted Poisson(1) weights — one map-side
      // explode + one aggregation, no global resampling; replica-mean
      // spread is the CI
      Profile.bootstrapMeans(
        events(s, d).filter(col("event_type") === "purchase"),
        "event_id", "value")),

    "q_ab_mwu" -> ((s, d) =>
      // nonparametric A/B: doubled Mann–Whitney U over purchase values
      // between two md5-assigned arms, computed from value-grain counts
      // (no global row ranking); u2_a + u2_b = 2·n_a·n_b self-checks
      EventAnalytics.mannWhitneyU(
        events(s, d).filter(col("event_type") === "purchase"),
        "context_id", "value")),

    "q_ab_did" -> ((s, d) => {
      // difference-in-differences: purchase-value means per (arm, period)
      // cell — pre = before epoch day 19738, post = after — and the DiD
      // estimate (ΔB − ΔA) from the four truncated milli means; the
      // trend-adjusted lift read when assignment wasn't randomized
      val arm = pmod(graft.pipeline.Hashing.md5Long(
        concat(lit("ab:"), col("context_id").cast("string"))), lit(2L))
      val cells = events(s, d).filter(col("event_type") === "purchase")
        .select(arm.as("_arm"),
          (expr("cast(timestamp as bigint) div 86400") < 19738).as("_pre"),
          expr("cast(round(value * 1000) as bigint)").as("_vm"))
      def cell(a: Int, pre: Boolean, what: String) = {
        val in = col("_arm") === a && col("_pre") === pre
        if (what == "n") sum(in.cast("long"))
        else sum(when(in, col("_vm")).otherwise(lit(0L)))
      }
      cells.agg(
        cell(0, pre = true, "n").as("n_pre_a"), cell(0, pre = false, "n").as("n_post_a"),
        cell(1, pre = true, "n").as("n_pre_b"), cell(1, pre = false, "n").as("n_post_b"),
        cell(0, pre = true, "s").as("_spa"), cell(0, pre = false, "s").as("_soa"),
        cell(1, pre = true, "s").as("_spb"), cell(1, pre = false, "s").as("_sob"))
        .select(col("n_pre_a"), col("n_post_a"), col("n_pre_b"), col("n_post_b"),
          expr("_spa div n_pre_a").as("mean_pre_a_milli"),
          expr("_soa div n_post_a").as("mean_post_a_milli"),
          expr("_spb div n_pre_b").as("mean_pre_b_milli"),
          expr("_sob div n_post_b").as("mean_post_b_milli"),
          expr("""(_sob div n_post_b - _spb div n_pre_b)
                  - (_soa div n_post_a - _spa div n_pre_a)""").as("did_milli"))
    }),

    "q_ab_trimmed" -> ((s, d) =>
      // robust A/B: exact 10%-trimmed and winsorized purchase-value means
      // per md5 arm, positional rank clipping over value-grain counts —
      // the whale-proof lift read
      EventAnalytics.trimmedMeans(
        events(s, d).filter(col("event_type") === "purchase"),
        "context_id", "value")),

    "q_quantile_bins" -> ((s, d) =>
      // exact octile binning of event values: thresholds from one bounded
      // percentile aggregate, assignment as a codegen'd comparison sum —
      // the no-sampling QuantileDiscretizer
      Features.quantileBins(events(s, d), "event_id", "value", nBins = 8)),

    "q_feature_hash" -> ((s, d) =>
      // hashing-trick featurization: (event_type × weekday) hashed into
      // 64 slots per user via the engine-portable md5-long — no
      // vocabulary pass, reproducible buckets
      Features.hashedFeatures(events(s, d), "context_id",
        concat(col("event_type"), lit("|"),
          pmod(call_function("div", col("timestamp"), lit(86400L)), lit(7L))
            .cast("string")),
        nBuckets = 64)),

    "q_set_completion" -> ((s, d) =>
      // activation checklist: which sessions performed ALL of
      // {signup, view, purchase} in any order — one (context, session)
      // aggregation, distinct-step state bounded by the step set
      EventAnalytics.sessionSetCompletion(events(s, d),
        "context_id", "timestamp", "event_id", "event_type", gapSec = 21600L,
        steps = Seq("signup", "view", "purchase"))),

    "q_basket_lift" -> ((s, d) =>
      // within-session type co-occurrence: pair, per-type, and total
      // session counts all from ONE corpus pass (self-row + sentinel
      // explode), lift joins on the checkpointed matrix only
      EventAnalytics.sessionCooccurrence(events(s, d),
        "context_id", "timestamp", "event_id", "event_type", gapSec = 21600L)),

    "q_reach_curve" -> ((s, d) =>
      // cumulative unique-audience curve: first-day per context, running
      // total over the day-grain table — no per-day distinct rescans
      EventAnalytics.reachCurve(events(s, d), "context_id", "timestamp")),

    "q_image_dhash" -> ((s, d) =>
      // perceptual fingerprint through the REAL PNG codec: decode (CRC +
      // inflate + unfilter) then 9×8 nearest-neighbor gray dHash
      pngHashes(s, d)),

    "q_video_dhash" -> ((s, d) =>
      // per-frame perceptual fingerprints through the REAL video path
      // (RIFF/AVI walk + ImageIO JPEG decode + grayscale dHash) — what
      // video near-dup and scene matching key on
      Multimodal.videoFrameDHashes(Multimodal.syntheticAvis(
        docs(s, d).select(col("doc_id")), "doc_id"))),

    "q_video_neardup" -> ((s, d) =>
      // videos sharing frame fingerprints (the +6 frame stride makes id and
      // id+6 genuinely overlapping videos): equi-join on the hash value,
      // never an all-pairs space
      Multimodal.nearDupVideos(
        Multimodal.videoFrameDHashes(Multimodal.syntheticAvis(
          docs(s, d).select(col("doc_id")), "doc_id")), minShared = 1)),

    "q_video_scenes" -> ((s, d) =>
      // scene-cut detection: frame-to-frame perceptual (dHash Hamming)
      // distance over each video's fingerprint stream, cut when > 8 bits
      Multimodal.sceneCuts(
        Multimodal.videoFrameDHashes(Multimodal.syntheticAvis(
          docs(s, d).select(col("doc_id")), "doc_id")), cutDist = 8)),

    "q_graph_pagerank" -> ((s, d) =>
      // exact-ppm PageRank, 10 distributed rounds over the image dup
      // graph — every division truncates, so the oracle replays all ten
      // iterations bit-for-bit as unrolled CTEs
      Clustering.pageRank(
        Multimodal.nearDupImages(pngHashes(s, d)), "a", "b",
        // nearDupImages emits distinct a < b pairs by construction
        assumeCanonical = true)),

    "q_graph_triangles" -> ((s, d) =>
      // dup-graph community density: triangles + local clustering
      // coefficient over the banded image near-dup pairs — id-oriented
      // edges make each triangle enumerable once via two equi-joins
      Clustering.triangleStats(
        Multimodal.nearDupImages(pngHashes(s, d)), "a", "b",
        assumeCanonical = true)),

    "q_graph_lpa" -> ((s, d) =>
      // deterministic synchronous label propagation, 3 rounds over the
      // image dup graph: most-frequent neighbor label, min-label ties —
      // finer than CC (weak bridges stay split), fully replayable
      Clustering.labelPropagation(
        Multimodal.nearDupImages(pngHashes(s, d)), "a", "b",
        assumeCanonical = true)),

    "q_identity_sessions" -> ((s, d) => {
      // the cross-device journey: events REKEYED onto stitched identities
      // (same dev/email fixture as q_identity_stitch), then gap-
      // sessionized at identity grain — visits that span two devices of
      // one person become ONE session, the read raw context ids can't give
      val ev = events(s, d).select(col("context_id"), col("timestamp"),
        col("event_id"),
        concat(lit("d"), col("context_id").cast("long") * 7 % 97).as("dev"),
        concat(lit("e"), col("context_id").cast("long") * 11 % 89).as("em"))
      EventAnalytics.sessionize(
        Identity.rekey(ev, "context_id", Seq("dev", "em")),
        "identity_id", "timestamp", "event_id", gapSec = 21600L)
    }),

    "q_identity_stitch" -> ((s, d) => {
      // cross-device identity stitching: synthetic device/email keys
      // derived from the context (device collides at ctx ≡ ctx' mod 97,
      // email at mod 89 — the residues interleave into multi-hop chains a
      // single-key stitch can't find); star edges per key value, then the
      // alternating-star CC and a per-identity rollup
      val ev = events(s, d).select(col("context_id"),
        concat(lit("d"), col("context_id").cast("long") * 7 % 97).as("dev"),
        concat(lit("e"), col("context_id").cast("long") * 11 % 89).as("em"))
      Identity.stitch(ev, "context_id", Seq("dev", "em"))
    }),

    "q_image_clusters" -> ((s, d) =>
      // image dedup's terminal shape: the banded Hamming pair graph
      // collapsed into connected components, min-id survivor per cluster —
      // the same O(log n) large-star/small-star machinery as text clusters
      Clustering.connectedComponents(
        Multimodal.nearDupImages(pngHashes(s, d), maxDist = 3),
        idCol1 = "a", idCol2 = "b", assumeCanonical = true)
        .select(col("id"), col("cluster_id"),
          (col("id") === col("cluster_id")).as("is_survivor"))),

    "q_image_neardup" -> ((s, d) =>
      // banded Hamming near-dup: 4×16-bit bands, pigeonhole-exact for
      // dist<=3, so the banded plan must equal the oracle's brute force
      Multimodal.nearDupImages(pngHashes(s, d), maxDist = 3)),

    "q_sessionize_incr" -> ((s, d) => {
      // incremental sessionization across a nightly boundary: night 1
      // (Jan 1–15) is sessionized and distilled to per-context carry
      // state; night 2's events fold in WITHOUT rescanning history. The
      // oracle is the full-corpus batch derivation restricted to night-2
      // events — incremental must equal batch exactly
      val ev = events(s, d)
      val t0 = 1705363200L // 2024-01-16T00:00:00Z
      val state = EventAnalytics.sessionState(
        EventAnalytics.sessionize(ev.filter(col("timestamp") < t0),
          "context_id", "timestamp", "event_id", gapSec = 21600L), "context_id")
      EventAnalytics.assignSessionsIncremental(
          ev.filter(col("timestamp") >= t0), state,
          "context_id", "timestamp", "event_id", gapSec = 21600L)
        .select(col("context_id"), col("timestamp"), col("event_id"),
          col("session_idx"))
    }),

    "q_salted_join" -> ((s, d) => {
      // the skew remedy q_key_skew prescribes: lineitem ⋈ supplier salted
      // 8 ways (row-hash salt on the fact, ×8 replicated dim, join on
      // (key, salt)) — the result must equal the PLAIN join's multiset,
      // checked through a revenue rollup per nation
      val src = new TestDataSource(s, d)
      val li = src.table("lineitem").select(col("l_suppkey"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
      val sup = src.table("supplier").select(
        col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      SaltedJoin.join(li, sup, "l_suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("revenue_cents"))
    }),

    "q_key_skew" -> ((s, d) =>
      // the pre-join skew audit on lineitem's shuffle keys: hottest key
      // share + hot/mean ratio — what decides salting vs AQE skew-join
      Profile.keySkew(new TestDataSource(s, d).table("lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey"))),

    "q_integrity_check" -> ((s, d) => {
      // referential-integrity audit over the star schema: orphan child
      // rows per relationship in ppm — the DQ gate a warehouse runs after
      // every load; each check is one LEFT ANTI join (child-keyed
      // shuffle, parent side broadcastable)
      val src = new TestDataSource(s, d)
      def check(name: String, child: DataFrame, childKey: String,
          parent: DataFrame, parentKey: String): DataFrame = {
        val totalDf = child.agg(count(lit(1)).as("n_child"))
        val orphans = child.join(
            parent.select(col(parentKey).as(childKey)).distinct(),
            Seq(childKey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        totalDf.crossJoin(orphans)
          .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"),
            expr("(n_orphans * 1000000) div n_child").as("orphan_ppm"))
      }
      check("lineitem->orders", src.table("lineitem"), "l_orderkey",
          src.table("orders").withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        .unionByName(check("orders->customer",
          src.table("orders").withColumnRenamed("o_custkey", "c_custkey"), "c_custkey",
          src.table("customer"), "c_custkey"))
        .unionByName(check("customer->nation",
          src.table("customer").withColumnRenamed("c_nationkey", "n_nationkey"), "n_nationkey",
          src.table("nation"), "n_nationkey"))
    }),

    "q_revenue_by_nation" -> ((s, d) => {
      // the classic 4-table warehouse rollup: discounted lineitem revenue
      // in exact cents per customer nation — dims broadcast, one fact
      // shuffle on the join keys, group count = nations
      val src = new TestDataSource(s, d)
      val li = src.table("lineitem").select(col("l_orderkey"),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("rev_cents"))
      li.join(src.table("orders").select(col("o_orderkey").as("l_orderkey"),
            col("o_custkey")), Seq("l_orderkey"))
        .join(broadcast(src.table("customer").select(col("c_custkey").as("o_custkey"),
          col("c_nationkey"))), Seq("o_custkey"))
        .join(broadcast(src.table("nation").select(col("n_nationkey").as("c_nationkey"),
          col("n_name"))), Seq("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_lineitems"), sum(col("rev_cents")).as("revenue_cents"))
    }),

    "q_corr_matrix" -> ((s, d) => {
      // one-pass Pearson matrix over milli-quantized lineitem measures —
      // exact integer moments, decimal assembly, 6dp doubles
      val li = new TestDataSource(s, d).table("lineitem")
        .select(expr("cast(round(l_quantity * 1000) as bigint)").as("qty_milli"),
          expr("cast(round(l_extendedprice * 1000) as bigint)").as("price_milli"),
          expr("cast(round(l_discount * 1000) as bigint)").as("disc_milli"))
      Profile.correlations(li, Seq("qty_milli", "price_milli", "disc_milli"))
    }),

    "q_drift_check" -> ((s, d) => {
      // nightly drift row: n_chars distribution of the refreshed snapshot
      // (the q_snapshot_diff cur side) vs the previous one, chi-square per
      // reference-decile bin in exact micro-units
      val all = docs(s, d)
      val prev = all.filter(col("doc_id") % 11 =!= 0)
      val cur = all.filter(col("doc_id") % 13 =!= 0)
      Profile.driftCheck(prev, cur, "n_chars")
    }),

    "q_profile_table" -> ((s, d) =>
      // ANALYZE-style snapshot QC: one pass, one wide agg row unpivoted to
      // a per-column report; value profiled milli-quantized so min/max
      // strings are engine-portable. SPREAD inline (the one events gate
      // whose map side is heavy — the wide agg partials over every
      // column ran 3.4 s single-task; identity at real scale)
      Profile.profile(
        Projections.spread(events(s, d), col("event_id"))
          .withColumn("value_milli",
            expr("cast(round(value * 1000) as bigint)")),
        Seq("context_id", "event_type", "timestamp", "value_milli"))),

    "q_anomaly_rate" -> ((s, d) =>
      // conversion-RATE anomalies vs the trailing-7-day ratio-of-sums
      // baseline, threshold 5% (50000 ppm)
      EventAnalytics.anomalousRates(events(s, d), "context_id", "timestamp",
        "event_type", convType = "purchase", windowDays = 7,
        thresholdPpm = 50000L)),

    "q_props_profile" -> ((s, d) =>
      // per-type numeric profiling of the JSON props payload: extract
      // $.k per row (one codegen'd path-extract, no UDF), exact integer
      // stats + milli mean — the payload-field analog of q_profile_table
      events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("_k"))
        .groupBy("event_type")
        .agg(count(col("_k")).as("n_with_k"),
          min(col("_k")).as("k_min"), max(col("_k")).as("k_max"),
          expr("(sum(_k) * 1000) div count(_k)").as("k_mean_milli"))),

    "q_activity_heatmap" -> ((s, d) =>
      // the classic (weekday × hour) activity grid — pure integer epoch
      // arithmetic (day 0 = Thursday), one partial+final aggregate
      events(s, d).groupBy(
          ((call_function("div", col("timestamp"), lit(86400L)) + 4) % 7).as("dow"),
          (call_function("div", pmod(col("timestamp"), lit(86400L)), lit(3600L))).as("hour"))
        .agg(count(lit(1)).as("n_events"))),

    "q_power_curve" -> ((s, d) =>
      // activity concentration: per-user event counts into deciles, each
      // decile's event share in ppm
      EventAnalytics.powerCurve(events(s, d), "context_id")),

    "q_growth_accounting" -> ((s, d) =>
      // DAU decomposition: new/retained/resurrected per active day plus
      // churn rows on first inactive days — one context exchange, then
      // day-grain rows
      EventAnalytics.growthAccounting(events(s, d), "context_id", "timestamp")),

    "q_steady_mix" -> ((s, d) =>
      // stationary event mix: 32 integer-ppm power iterations over the
      // type-cardinality transition matrix (collected bounded, iterated
      // driver-side — the corpus is scanned once, by the transitions agg)
      EventAnalytics.steadyStateEventMix(events(s, d), "context_id",
        "timestamp", "event_id", "event_type")),

    "q_rfm" -> ((s, d) =>
      // customer-value grid: recency/frequency/monetary quintiles per
      // user over purchases, exact integer stats, map-side scoring
      EventAnalytics.rfmSegments(events(s, d), "context_id", "timestamp",
        "event_type", "value", purchaseType = "purchase")),

    "q_ab_z" -> ((s, d) => {
      // two-proportion z statistic per treatment arm vs control (unpooled
      // SE, 6dp deterministic doubles over exact integer counts) — the
      // significance read on top of q_ab_lift's point estimates
      val ev = events(s, d)
      val variant = pmod(Hashing.md5Long(
        concat(lit("ab:"), col("context_id").cast("string"))), lit(3L))
      // conversion = a HIGH-VALUE purchase (value > 180): over a month of
      // activity nearly every user purchases at least once, so the plain
      // definition saturates p at 1.0 and the SE at 0 — the z-test needs
      // an event rare enough to vary (measured 39/150 users at sf0.01)
      val arms = ev.select(variant.as("variant"), col("context_id").as("_ctx"),
          (col("event_type") === "purchase" && col("value") > 180).cast("long").as("_c"))
        .groupBy("variant", "_ctx").agg(max(col("_c")).as("_c"))
        .groupBy("variant")
        .agg(count(lit(1)).as("users"), sum(col("_c")).as("converters"))
      val ctl = arms.filter(col("variant") === 0)
        .select(col("users").as("_u0"), col("converters").as("_c0"))
      arms.filter(col("variant") =!= 0).crossJoin(broadcast(ctl))
        .withColumn("_p", col("converters").cast("double") / col("users"))
        .withColumn("_p0", col("_c0").cast("double") / col("_u0"))
        .select(col("variant"), col("users"), col("converters"),
          round((col("_p") - col("_p0")) /
            sqrt(col("_p") * (lit(1.0) - col("_p")) / col("users") +
              col("_p0") * (lit(1.0) - col("_p0")) / col("_u0")), 6).as("z_score"))
    }),

    "q_ab_srm" -> ((s, d) =>
      // the experimentation guardrail: per-arm observed vs expected users
      // + chi-square contributions in exact integer micro-units
      EventAnalytics.srmCheck(events(s, d), "context_id", nVariants = 3)),

    "q_ab_lift" -> ((s, d) =>
      // A/B readout: 3 hash-assigned arms, conversion = any purchase,
      // integer ppm rates + lift vs arm 0 — one user-grain aggregate,
      // then arm-cardinality rows only
      EventAnalytics.experimentLift(events(s, d),
        "context_id", "event_type", convType = "purchase", nVariants = 3)),

    "q_top_sequences" -> ((s, d) =>
      // within-session 3-step motifs, counted across all sessions —
      // map-side gram generation, bounded TakeOrdered ranking
      EventAnalytics.topSequences(events(s, d), "context_id", "timestamp",
        "event_id", "event_type", gapSec = 21600L, n = 3, topN = 25)),

    "q_top_paths" -> ((s, d) =>
      // top-25 session journeys (first 5 steps, 6h gap sessions) — path
      // strings bounded at maxLen, counting is an ordinary aggregate,
      // ranking a bounded TakeOrdered
      EventAnalytics.topPaths(events(s, d), "context_id", "timestamp",
        "event_id", "event_type", gapSec = 21600L, maxLen = 5, topN = 25)),

    "q_funnel_step_times" -> ((s, d) =>
      // per-transition latency percentiles for the k-step funnel: exact
      // integer gaps between consecutive matched steps, the
      // valuePercentiles parity regime — "which step stalls users"
      EventAnalytics.sessionFunnelK(events(s, d), "context_id", "timestamp",
          "event_id", "event_type", gapSec = 21600L,
          steps = Seq("view", "click", "purchase"))
        .select(posexplode(expr(
          "transform(slice(step_ts, 2, size(step_ts)), (t, i) -> t - element_at(step_ts, i + 1))"))
          .as(Seq("_i", "_gap")))
        .select((col("_i") + 1).cast("long").as("step"), col("_gap"))
        .groupBy("step")
        .agg(count(lit(1)).as("n"),
          round(percentile(col("_gap"), lit(0.5)), 6).as("p50"),
          round(percentile(col("_gap"), lit(0.9)), 6).as("p90"),
          max(col("_gap")).as("max_gap"))),

    "q_funnel_within" -> ((s, d) =>
      // k-step funnel with a conversion time budget: the chain must
      // complete within 2h of the first matched step — same greedy fold,
      // one extra predicate, no new exchange
      EventAnalytics.sessionFunnelK(events(s, d), "context_id", "timestamp",
        "event_id", "event_type", gapSec = 21600L,
        steps = Seq("view", "click", "purchase"), withinSec = 7200L)
        .select(col("context_id"), col("session_idx"), col("n_events"),
          try_element_at(col("step_ts"), lit(1)).as("s1_ts"),
          try_element_at(col("step_ts"), lit(2)).as("s2_ts"),
          try_element_at(col("step_ts"), lit(3)).as("s3_ts"),
          col("steps_done"), col("converted"))),

    "q_weighted_sample" -> ((s, d) =>
      // priority sampling (Duffield-Lund-Thorup): 20 docs per source,
      // inclusion ∝ n_chars, rank = integer u div w over the salted md5
      // coin — bounded two-phase top-k, never a per-group window
      DataMix.weightedSamplePerGroup(docs(s, d),
        "source", "doc_id", "n_chars", n = 20)),

    "q_attribution_linear" -> ((s, d) => {
      // LINEAR multi-touch attribution: every touch in the 7-day lookback
      // shares the purchase's revenue equally (micro-cents, truncating) —
      // the other standard model beside last-touch q_attribution. The
      // touch join is per-context (user-grain bounded), credits are
      // map-side integer splits, the rollup channel-cardinality
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("context_id"), col("event_id").as("p_eid"),
          col("timestamp").as("p_ts"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .groupBy(col("context_id"), col("timestamp").as("t_ts"))
        .agg(max_by(col("event_type"), col("event_id")).as("channel"))
      val matched = purchases.join(touches, Seq("context_id"))
        .filter(col("t_ts") <= col("p_ts") && col("t_ts") >= col("p_ts") - 604800L)
      val withN = matched
        .withColumn("n_touches",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("context_id"), col("p_eid"))))
      withN
        .groupBy(col("channel"))
        .agg(countDistinct(col("p_eid")).as("touched_purchases"),
          sum(call_function("div", col("cents") * 1000000L, col("n_touches")))
            .as("credit_microcents"))
    }),

    "q_attribution_decay" -> ((s, d) => {
      // TIME-DECAY multi-touch attribution: each touch in the 7-day
      // lookback weighs 2^(7 − age_days) — halving per day, EXACT in
      // integers (no float decay), so credits split deterministically:
      // credit = cents·1e6·w div Σw per purchase. Same one context join +
      // per-purchase window as the linear model
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("context_id"), col("event_id").as("p_eid"),
          col("timestamp").as("p_ts"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .groupBy(col("context_id"), col("timestamp").as("t_ts"))
        .agg(max_by(col("event_type"), col("event_id")).as("channel"))
      purchases.join(touches, Seq("context_id"))
        .filter(col("t_ts") <= col("p_ts") && col("t_ts") >= col("p_ts") - 604800L)
        .withColumn("_w",
          expr("shiftleft(1L, cast(7 - (p_ts - t_ts) div 86400 as int))"))
        .withColumn("_sumw",
          sum(col("_w")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("context_id"), col("p_eid"))))
        .groupBy(col("channel"))
        .agg(countDistinct(col("p_eid")).as("touched_purchases"),
          sum(call_function("div", col("cents") * 1000000L * col("_w"),
            col("_sumw"))).as("credit_microcents"))
    }),

    "q_attribution" -> ((s, d) => {
      // last-touch marketing attribution: every purchase credits the
      // latest non-purchase touch within a 7-day lookback (AS-OF with
      // tolerance), then revenue rolls up per touch channel — the asOf
      // carry-forward plus a channel-cardinality aggregate
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("context_id"), col("event_id"), col("timestamp"), col("value"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .groupBy(col("context_id"), col("timestamp"))
        .agg(max_by(col("event_type"), col("event_id")).as("channel"))
      AsOfJoin.asOf(purchases, touches, "context_id", "timestamp", "timestamp",
          dimPrefix = "touch_", toleranceSec = Some(604800L))
        .groupBy(coalesce(col("touch_channel"), lit("unattributed")).as("channel"))
        .agg(count(lit(1)).as("purchases"),
          sum(expr("cast(round(value * 100) as bigint)")).as("revenue_cents"))
    })
  )

  // ---------------- oracles ----------------

  private val eventsView =
    """SELECT CAST(user_id AS VARCHAR) AS context_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid
      |FROM events""".stripMargin

  /** WHT spectral peaks recomputed from the synthetic-WAV formula: sample
    * i of track id is int16 of `(id*13 + (start+i)*97) mod 65536`;
    * coefficient k of 64-sample frame f is `Σ_j x·(−1)^bit_count(j&k)` —
    * exact integer sums, so the peak (max |c| over k=1..63, ties to the
    * SMALLEST k) is engine-independent by construction. Emits
    * (doc_id, f, k, a) rows; `filter` restricts the doc set. */
  private def whtPeaksSql(nSamples: Int, start: Int, filter: String): String =
    s"""SELECT doc_id, f, k, a FROM (
       |  SELECT doc_id, f, k, abs(c) AS a,
       |    row_number() OVER (PARTITION BY doc_id, f ORDER BY abs(c) DESC, k) AS rn
       |  FROM (
       |    SELECT v.doc_id AS doc_id, v.f AS f, kk.k AS k,
       |      sum(v.x * CASE WHEN bit_count(v.j & kk.k) % 2 = 0 THEN 1 ELSE -1 END) AS c
       |    FROM (
       |      SELECT doc_id, CAST(i // 64 AS INTEGER) AS f, i % 64 AS j,
       |        CASE WHEN (doc_id*13 + ($start + i)*97) % 65536 >= 32768
       |             THEN (doc_id*13 + ($start + i)*97) % 65536 - 65536
       |             ELSE (doc_id*13 + ($start + i)*97) % 65536 END AS x
       |      FROM (SELECT doc_id, unnest(range(0, $nSamples)) AS i
       |            FROM documents$filter) base
       |    ) v CROSS JOIN (SELECT unnest(range(1, 64)) AS k) kk
       |    GROUP BY 1, 2, 3
       |  ) spec
       |) rk WHERE rn = 1""".stripMargin

  /** Walsh-tone peaks in closed form: frame g of track id is the pure
    * Walsh function `K(id, g) = 1 + (id·5 + ((2g) mod 5)·(7 + id mod
    * 11)) mod 63` (amplitude 1000), whose 64-point WHT is a delta — so
    * the decoded spectral peak is K itself with |c| = 64000, no
    * transform replay needed (the WHT mechanics are oracle-checked by
    * q_audio_wht). `gFrom`/`gUntil` are GLOBAL frame indices; emitted f
    * is the blob-local frame (g − gFrom), matching a trim that starts at
    * sample 64·gFrom. */
  private def walshPeaksSql(gFrom: Int, gUntil: Int, filter: String): String =
    s"""SELECT doc_id, CAST(g - $gFrom AS INTEGER) AS f,
       |  1 + (doc_id*5 + ((g*2) % 5)*(7 + doc_id%11)) % 63 AS k
       |FROM (SELECT doc_id, unnest(range($gFrom, $gUntil)) AS g
       |      FROM documents$filter) wt""".stripMargin

  /** Landmark fingerprints over a named peaks CTE — the Δ=1 and Δ=2 leads
    * in each track's frame order, packed `((p1·4096 + p2)·64 + Δ)`. */
  private def whtFpSql(peaksCte: String): String =
    s"""SELECT doc_id, f, (k * 4096 + k1) * 64 + 1 AS fp_key
       |FROM (SELECT doc_id, f, k,
       |    lead(k, 1) OVER (PARTITION BY doc_id ORDER BY f) AS k1 FROM $peaksCte) d1
       |WHERE k1 IS NOT NULL
       |UNION ALL
       |SELECT doc_id, f, (k * 4096 + k2) * 64 + 2 AS fp_key
       |FROM (SELECT doc_id, f, k,
       |    lead(k, 2) OVER (PARTITION BY doc_id ORDER BY f) AS k2 FROM $peaksCte) d2
       |WHERE k2 IS NOT NULL""".stripMargin

  /** The dHash oracle recomputes the DECODED gray grid analytically from
    * the synthetic-PNG formula (channel c of pixel p is
    * `(id*31 + (p*3+c)*7) % 256`, image 5×6) — the codec itself is never
    * run by the oracle, same strategy as q_multimodal_png. */
  private[graft] val dhashOracle =
    """WITH ys AS (SELECT doc_id, unnest(range(0, 8)) AS y FROM documents),
      |pts AS (SELECT doc_id, y, unnest(range(0, 9)) AS x FROM ys),
      |g AS (SELECT doc_id, y, x,
      |  (((doc_id*31 + ((((y*6)//8)*5 + (x*5)//9)*3 + 0)*7) % 256)
      | + ((doc_id*31 + ((((y*6)//8)*5 + (x*5)//9)*3 + 1)*7) % 256)
      | + ((doc_id*31 + ((((y*6)//8)*5 + (x*5)//9)*3 + 2)*7) % 256)) // 3 AS gv
      |  FROM pts),
      |bits AS (SELECT l.doc_id, l.y, l.x,
      |    CASE WHEN l.gv > r.gv THEN 1 ELSE 0 END AS bit
      |  FROM g l JOIN g r ON l.doc_id = r.doc_id AND l.y = r.y AND r.x = l.x + 1
      |  WHERE l.x < 8)
      |SELECT doc_id AS media_id,
      |  CAST(sum(CASE WHEN y*8+x >= 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x-32)) ELSE 0 END) AS BIGINT) AS hash_hi,
      |  CAST(sum(CASE WHEN y*8+x < 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x)) ELSE 0 END) AS BIGINT) AS hash_lo
      |FROM bits GROUP BY doc_id""".stripMargin

  /** The per-frame video fingerprint derivation (perceptual dHash from the
    * NN-sampled gray grid + exact content key over ALL pixels), shared by
    * q_video_dhash and the q_video_neardup pair scan. */
  private val videoDhashOracle =
    s"""WITH dims AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INTEGER) AS nf,
      |    8 * (1 << (doc_id % 3)) AS w, 8 * (1 << (doc_id % 2)) AS h FROM documents),
      |fr AS (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS fi FROM dims),
      |ys AS (SELECT doc_id, nf, w, h, fi, unnest(range(0, 8)) AS y FROM fr),
      |pts AS (SELECT doc_id, nf, w, h, fi, y, unnest(range(0, 9)) AS x FROM ys),
      |g AS (SELECT doc_id, nf, w, h, fi, y, x,
      |    ((doc_id + 6*fi)*31 + (((x*w)//9)//8)*7 + (((y*h)//8)//8)*13) % 256 AS gv
      |  FROM pts),
      |bits AS (SELECT l.doc_id, l.fi, l.nf, l.w, l.h, l.y, l.x,
      |    CASE WHEN l.gv > r.gv THEN 1 ELSE 0 END AS bit
      |  FROM g l JOIN g r ON l.doc_id = r.doc_id AND l.fi = r.fi AND l.y = r.y AND r.x = l.x + 1
      |  WHERE l.x < 8),
      |dh AS (SELECT doc_id, fi, nf, w, h,
      |    CAST(sum(CASE WHEN y*8+x >= 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x-32)) ELSE 0 END) AS BIGINT) AS hash_hi,
      |    CAST(sum(CASE WHEN y*8+x < 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x)) ELSE 0 END) AS BIGINT) AS hash_lo
      |  FROM bits GROUP BY 1, 2, 3, 4, 5),
      |py AS (SELECT doc_id, fi, w, h, unnest(range(0, h)) AS y2 FROM fr),
      |px AS (SELECT doc_id, fi, w, h, y2, unnest(range(0, w)) AS x2 FROM py),
      |pk AS (SELECT doc_id, fi,
      |    ${Hashing.duckMd5Long("CAST(w AS VARCHAR) || 'x' || CAST(h AS VARCHAR) || ':' || string_agg(CAST(((doc_id + 6*fi)*31 + (x2//8)*7 + (y2//8)*13) % 256 AS VARCHAR), ',' ORDER BY y2, x2)")} AS frame_key
      |  FROM px GROUP BY 1, 2, w, h)
      |SELECT dh.doc_id AS media_id, CAST(dh.fi AS BIGINT) AS frame_idx, dh.nf AS n_frames,
      |  CAST(dh.w AS INTEGER) AS width, CAST(dh.h AS INTEGER) AS height,
      |  dh.hash_hi, dh.hash_lo, pk.frame_key
      |FROM dh JOIN pk ON dh.doc_id = pk.doc_id AND dh.fi = pk.fi""".stripMargin

  /** The full within-session funnel derivation (q_session_funnel's
    * oracle), reused by the q_time_to_convert latency rollup. */
  private val sessionFunnelOracle =
    """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type FROM events),
      |s AS (SELECT context_id, t, eid, event_type,
      |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
      |         THEN 1 ELSE 0 END AS ns
      |  FROM e WINDOW w AS (PARTITION BY context_id ORDER BY t, eid)),
      |x AS (SELECT context_id, t, eid, event_type,
      |    CAST(SUM(ns) OVER (PARTITION BY context_id ORDER BY t, eid
      |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
      |  FROM s),
      |g AS (SELECT context_id, session_idx, CAST(count(*) AS BIGINT) AS n_events
      |  FROM x GROUP BY 1, 2),
      |a AS (SELECT context_id, session_idx, t AS a_ts, eid AS a_eid FROM (
      |    SELECT context_id, session_idx, t, eid,
      |      row_number() OVER (PARTITION BY context_id, session_idx ORDER BY t, eid) AS rn
      |    FROM x WHERE event_type = 'signup') WHERE rn = 1),
      |b AS (SELECT x.context_id, x.session_idx, min(x.t) AS b_ts
      |  FROM x JOIN a ON x.context_id = a.context_id AND x.session_idx = a.session_idx
      |  WHERE x.event_type = 'purchase'
      |    AND (x.t > a.a_ts OR (x.t = a.a_ts AND x.eid > a.a_eid))
      |  GROUP BY 1, 2)
      |SELECT g.context_id, g.session_idx, g.n_events, a.a_ts, b.b_ts,
      |  b.b_ts IS NOT NULL AS converted
      |FROM g LEFT JOIN a ON g.context_id = a.context_id AND g.session_idx = a.session_idx
      |  LEFT JOIN b ON g.context_id = b.context_id AND g.session_idx = b.session_idx""".stripMargin

  /** k-step funnel oracle, composing the 2-step derivation once per step:
    * step 1 is the session's first-touch of its type; step i+1 is the
    * earliest event of its type STRICTLY after step i in (t, eid) order —
    * the recurrence [[graft.pipeline.EventAnalytics.sessionFunnelK]]'s
    * greedy fold implements in one pass. */
  private def sessionFunnelKOracle(steps: Seq[String], withinSec: Long = 0L): String = {
    val k = steps.size
    val stepCtes = steps.zipWithIndex.map { case (ty, ix) =>
      val n = ix + 1
      val src = if (ix == 0) "x"
        else s"""x JOIN s$ix ON x.context_id = s$ix.context_id AND x.session_idx = s$ix.session_idx"""
      // the budget anchor (step 1's ts) rides along as b1 so every later
      // step can enforce the withinSec conversion window
      val anchor = if (ix == 1) s"s$ix.t1" else s"s$ix.b1"
      val after = if (ix == 0) ""
        else s" AND (x.t > s$ix.t$ix OR (x.t = s$ix.t$ix AND x.eid > s$ix.i$ix))" +
          (if (withinSec > 0) s" AND x.t <= $anchor + $withinSec" else "")
      val anchorSel = if (withinSec == 0 || ix == 0) "" else s", $anchor AS b1"
      val anchorOut = if (withinSec == 0 || ix == 0) "" else ", b1"
      s"""s$n AS (SELECT context_id, session_idx, t AS t$n, eid AS i$n$anchorOut FROM (
         |    SELECT x.context_id, x.session_idx, x.t, x.eid$anchorSel,
         |      row_number() OVER (PARTITION BY x.context_id, x.session_idx ORDER BY x.t, x.eid) AS rn
         |    FROM $src WHERE x.event_type = '$ty'$after) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val joins = (1 to k)
      .map(n => s"LEFT JOIN s$n USING (context_id, session_idx)").mkString("\n  ")
    val tsCols = (1 to k).map(n => s"t$n AS s${n}_ts").mkString(", ")
    val doneCases = (k to 1 by -1)
      .map(n => s"WHEN t$n IS NOT NULL THEN $n").mkString(" ")
    s"""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type FROM events),
       |s AS (SELECT context_id, t, eid, event_type,
       |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
       |         THEN 1 ELSE 0 END AS ns
       |  FROM e WINDOW w AS (PARTITION BY context_id ORDER BY t, eid)),
       |x AS (SELECT context_id, t, eid, event_type,
       |    CAST(SUM(ns) OVER (PARTITION BY context_id ORDER BY t, eid
       |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
       |  FROM s),
       |g AS (SELECT context_id, session_idx, CAST(count(*) AS BIGINT) AS n_events
       |  FROM x GROUP BY 1, 2),
       |$stepCtes
       |SELECT context_id, session_idx, n_events, $tsCols,
       |  CAST(CASE $doneCases ELSE 0 END AS BIGINT) AS steps_done,
       |  t$k IS NOT NULL AS converted
       |FROM g $joins""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_session_funnel_k" -> sessionFunnelKOracle(Seq("view", "click", "purchase")),

    "q_funnel_within" ->
      sessionFunnelKOracle(Seq("view", "click", "purchase"), withinSec = 7200L),

    // consecutive-step gaps from the k-step derivation, quantile_cont 6dp
    "q_funnel_step_times" ->
      s"""WITH f AS (${sessionFunnelKOracle(Seq("view", "click", "purchase"))}),
         |g AS (SELECT 1 AS step, s2_ts - s1_ts AS gap FROM f WHERE s2_ts IS NOT NULL
         |  UNION ALL SELECT 2, s3_ts - s2_ts FROM f WHERE s3_ts IS NOT NULL)
         |SELECT CAST(step AS BIGINT) AS step, CAST(count(*) AS BIGINT) AS n,
         |  round(quantile_cont(gap, 0.5), 6) AS p50,
         |  round(quantile_cont(gap, 0.9), 6) AS p90,
         |  CAST(max(gap) AS BIGINT) AS max_gap
         |FROM g GROUP BY step""".stripMargin,

    // the incremental path must reproduce the batch gap rule bit-for-bit:
    // the oracle is the FULL-corpus per-event session assignment, filtered
    // to the night-2 slice the incremental operator actually processed
    "q_sessionize_incr" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid FROM events),
        |s AS (SELECT context_id, t, eid,
        |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY context_id ORDER BY t, eid)),
        |x AS (SELECT context_id, t, eid,
        |    CAST(SUM(ns) OVER (PARTITION BY context_id ORDER BY t, eid
        |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM s)
        |SELECT context_id, t AS "timestamp", eid AS event_id, session_idx
        |FROM x WHERE t >= 1705363200""".stripMargin,

    // hottest key by (count DESC, key-string DESC) — the max(struct) tie
    // rule — then share/ratio in integer units
    "q_key_skew" -> Seq("l_orderkey", "l_partkey", "l_suppkey").map { k =>
      s"""SELECT '$k' AS key_column, t.n_rows, t.n_keys, h.k AS hot_key,
         |  h.n AS hot_n, (h.n * 1000000) // t.n_rows AS hot_share_ppm,
         |  (h.n * t.n_keys * 1000) // t.n_rows AS hot_over_mean_milli
         |FROM (SELECT CAST(sum(n) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys
         |      FROM (SELECT CAST($k AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS n
         |            FROM lineitem GROUP BY 1)) t,
         |     (SELECT k, n FROM (SELECT CAST($k AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS n
         |            FROM lineitem GROUP BY 1) ORDER BY n DESC, k DESC LIMIT 1) h""".stripMargin
    }.mkString("\nUNION ALL\n"),

    "q_integrity_check" ->
      """SELECT 'lineitem->orders' AS relationship,
        |  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
        |  CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans,
        |  ((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) * 1000000)
        |    // (SELECT count(*) FROM lineitem) AS orphan_ppm
        |UNION ALL
        |SELECT 'orders->customer',
        |  CAST((SELECT count(*) FROM orders) AS BIGINT),
        |  CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
        |  ((SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) * 1000000)
        |    // (SELECT count(*) FROM orders)
        |UNION ALL
        |SELECT 'customer->nation',
        |  CAST((SELECT count(*) FROM customer) AS BIGINT),
        |  CAST((SELECT count(*) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT),
        |  ((SELECT count(*) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) * 1000000)
        |    // (SELECT count(*) FROM customer)""".stripMargin,

    "q_revenue_by_nation" ->
      """SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_lineitems,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY n.n_name""".stripMargin,

    // exact HUGEINT moments assembled to doubles, 6dp — the same
    // arithmetic order as the Spark decimal expressions
    "q_corr_matrix" -> {
      val cols = Seq("qty_milli" -> "l_quantity", "price_milli" -> "l_extendedprice",
        "disc_milli" -> "l_discount")
      val sel = cols.map { case (n, c) => s"CAST(round($c * 1000) AS BIGINT) AS $n" }.mkString(", ")
      val pairs = cols.map(_._1).combinations(2).map { case Seq(a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(count(*) AS BIGINT) AS n,
           |  round(CAST(CAST(count(*) AS HUGEINT) * sum(CAST($a AS HUGEINT) * $b)
           |      - CAST(sum($a) AS HUGEINT) * sum($b) AS DOUBLE) /
           |    (sqrt(CAST(CAST(count(*) AS HUGEINT) * sum(CAST($a AS HUGEINT) * $a)
           |        - CAST(sum($a) AS HUGEINT) * sum($a) AS DOUBLE)) *
           |     sqrt(CAST(CAST(count(*) AS HUGEINT) * sum(CAST($b AS HUGEINT) * $b)
           |        - CAST(sum($b) AS HUGEINT) * sum($b) AS DOUBLE))), 6) AS corr
           |FROM t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH t AS (SELECT $sel FROM lineitem)\n$pairs"
    },

    // bins from the reference's deciles (quantile_cont, 6dp); chi-square
    // in HUGEINT micro-units, NULL where the reference bin is empty
    "q_drift_check" ->
      """WITH pv AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents WHERE doc_id % 11 <> 0),
        |cv AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents WHERE doc_id % 13 <> 0),
        |b AS (SELECT list_transform(quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |    x -> round(x, 6)) AS bs FROM pv),
        |rb AS (SELECT CAST(len(list_filter(b.bs, x -> v > x)) AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS ref_n FROM pv, b GROUP BY 1),
        |cb AS (SELECT CAST(len(list_filter(b.bs, x -> v > x)) AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS cur_n FROM cv, b GROUP BY 1),
        |j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
        |    coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
        |  FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
        |t AS (SELECT CAST(sum(ref_n) AS BIGINT) AS rt, CAST(sum(cur_n) AS BIGINT) AS ct FROM j)
        |SELECT j.bin, j.ref_n, j.cur_n,
        |  (j.ref_n * t.ct * 1000) // t.rt AS exp_cur_milli,
        |  CASE WHEN j.ref_n = 0 THEN NULL ELSE
        |    CAST((CAST(j.cur_n * t.rt - j.ref_n * t.ct AS HUGEINT) *
        |          CAST(j.cur_n * t.rt - j.ref_n * t.ct AS HUGEINT) * 1000000)
        |      // (CAST(t.rt AS HUGEINT) * j.ref_n * t.ct) AS BIGINT) END AS chi2_micro
        |FROM j, t""".stripMargin,

    "q_profile_table" -> {
      val eCte = """SELECT CAST(user_id AS VARCHAR) AS context_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ets,
        |    CAST(round(value * 1000) AS BIGINT) AS value_milli FROM events""".stripMargin
      def row(name: String, c: String) =
        s"""SELECT '$name' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value FROM e""".stripMargin
      s"""WITH e AS ($eCte)
         |${Seq("context_id" -> "context_id", "event_type" -> "event_type",
                "timestamp" -> "ets", "value_milli" -> "value_milli")
           .map { case (n, c) => row(n, c) }.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // quintile bounds via quantile_cont rounded 6dp; bin = 1 + bounds
    // strictly below; R inverted (5 = most recent)
    "q_rfm" ->
      """WITH p AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT max(t) AS anchor FROM p),
        |u AS (SELECT context_id,
        |    (a.anchor - max(t)) // 86400 AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(cents) AS BIGINT) AS monetary_cents
        |  FROM p, a GROUP BY context_id, a.anchor),
        |b AS (SELECT
        |    list_transform(quantile_cont(recency_days, [0.2,0.4,0.6,0.8]), x -> round(x, 6)) AS rb,
        |    list_transform(quantile_cont(frequency, [0.2,0.4,0.6,0.8]), x -> round(x, 6)) AS fb,
        |    list_transform(quantile_cont(monetary_cents, [0.2,0.4,0.6,0.8]), x -> round(x, 6)) AS mb
        |  FROM u),
        |s AS (SELECT u.*,
        |    6 - (1 + len(list_filter(b.rb, x -> recency_days > x))) AS r_score,
        |    1 + len(list_filter(b.fb, x -> frequency > x)) AS f_score,
        |    1 + len(list_filter(b.mb, x -> monetary_cents > x)) AS m_score
        |  FROM u, b)
        |SELECT context_id, recency_days, frequency, monetary_cents,
        |  CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  'R' || r_score || 'F' || f_score || 'M' || m_score AS segment
        |FROM s""".stripMargin,

    // unpooled two-proportion z over exact counts, 6dp doubles
    "q_ab_z" ->
      s"""WITH u AS (SELECT ${Hashing.duckMd5Long("'ab:' || CAST(user_id AS VARCHAR)")} % 3 AS variant,
         |    user_id, max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT variant, CAST(count(*) AS BIGINT) AS users,
         |    CAST(sum(conv) AS BIGINT) AS converters FROM u GROUP BY 1),
         |c AS (SELECT users AS u0, converters AS c0 FROM a WHERE variant = 0)
         |SELECT a.variant, a.users, a.converters,
         |  round(((a.converters * 1.0 / a.users) - (c.c0 * 1.0 / c.u0)) /
         |    sqrt((a.converters * 1.0 / a.users) * (1 - a.converters * 1.0 / a.users) / a.users
         |       + (c.c0 * 1.0 / c.u0) * (1 - c.c0 * 1.0 / c.u0) / c.u0), 6) AS z_score
         |FROM a, c WHERE a.variant <> 0""".stripMargin,

    // per-arm chi-square contributions in HUGEINT (the decimal(38,0)
    // twin), truncated to micro-units; operands non-negative so // = div
    "q_ab_srm" ->
      s"""WITH u AS (SELECT DISTINCT ${Hashing.duckMd5Long("'ab:' || CAST(user_id AS VARCHAR)")} % 3 AS variant,
         |    user_id FROM events),
         |a AS (SELECT variant, CAST(count(*) AS BIGINT) AS users FROM u GROUP BY 1),
         |t AS (SELECT CAST(sum(users) AS BIGINT) AS total FROM a)
         |SELECT a.variant, a.users,
         |  (t.total * 1000) // 3 AS exp_users_milli,
         |  CAST((CAST(a.users * 3 - t.total AS HUGEINT) *
         |        CAST(a.users * 3 - t.total AS HUGEINT) * 1000000)
         |    // (3 * t.total) AS BIGINT) AS chi2_micro
         |FROM a, t""".stripMargin,

    // hash-assigned arms; all rate math in truncate-toward-zero integer
    // division (DuckDB // floors, so negative lifts spell the truncation
    // with a CASE — the q_anomaly_days convention)
    "q_ab_lift" ->
      s"""WITH u AS (SELECT ${Hashing.duckMd5Long("'ab:' || CAST(user_id AS VARCHAR)")} % 3 AS variant,
         |    user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT variant, CAST(count(*) AS BIGINT) AS users,
         |    CAST(sum(conv) AS BIGINT) AS converters FROM u GROUP BY 1),
         |r AS (SELECT variant, users, converters,
         |    converters * 1000000 // users AS conv_ppm FROM a)
         |SELECT r.variant, r.users, r.converters, r.conv_ppm,
         |  CASE WHEN r.conv_ppm >= c.conv_ppm
         |       THEN (r.conv_ppm - c.conv_ppm) * 1000000 // c.conv_ppm
         |       ELSE -((c.conv_ppm - r.conv_ppm) * 1000000 // c.conv_ppm) END AS lift_ppm
         |FROM r, (SELECT conv_ppm FROM r WHERE variant = 0) c""".stripMargin,

    // per-session ordered type lists → contiguous trigram comprehension →
    // count, (count DESC, pattern ASC) top-25
    "q_top_sequences" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type FROM events),
        |s AS (SELECT context_id, t, eid, event_type,
        |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY context_id ORDER BY t, eid)),
        |x AS (SELECT context_id, t, eid, event_type,
        |    CAST(SUM(ns) OVER (PARTITION BY context_id ORDER BY t, eid
        |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM s),
        |p AS (SELECT context_id, session_idx,
        |    list(event_type ORDER BY t, eid) AS ys
        |  FROM x GROUP BY 1, 2),
        |g AS (SELECT unnest([ys[i] || '>' || ys[i+1] || '>' || ys[i+2]
        |    for i in range(1, len(ys) - 1)]) AS pattern FROM p)
        |SELECT pattern, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM g GROUP BY 1 ORDER BY n_occurrences DESC, pattern ASC LIMIT 25""".stripMargin,

    // sessionized journeys: the funnel oracle's session assembly, paths as
    // the first-5-step string_agg, top-25 by (count DESC, path ASC)
    "q_top_paths" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type FROM events),
        |s AS (SELECT context_id, t, eid, event_type,
        |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY context_id ORDER BY t, eid)),
        |x AS (SELECT context_id, t, eid, event_type,
        |    CAST(SUM(ns) OVER (PARTITION BY context_id ORDER BY t, eid
        |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM s),
        |p AS (SELECT context_id, session_idx,
        |    string_agg(event_type, '>' ORDER BY t, eid) AS path
        |  FROM (SELECT *, row_number() OVER (PARTITION BY context_id, session_idx
        |          ORDER BY t, eid) AS rn FROM x)
        |  WHERE rn <= 5 GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path ASC LIMIT 25""".stripMargin,

    // priority sampling: rank = u div w, both operands non-negative so
    // DuckDB's flooring // IS truncation; window formulation defines the
    // semantics the bounded two-phase aggregate must reproduce
    "q_weighted_sample" ->
      s"""WITH w AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS wt,
         |    ${Hashing.duckMd5Long("'wmix:' || CAST(doc_id AS VARCHAR)")} AS u
         |  FROM documents WHERE n_chars > 0),
         |k AS (SELECT source, doc_id, wt,
         |    row_number() OVER (PARTITION BY source ORDER BY u // wt, doc_id) AS rn
         |  FROM w)
         |SELECT source, doc_id, CAST(rn - 1 AS BIGINT) AS rk, wt AS weight
         |FROM k WHERE rn <= 20""".stripMargin,

    // equal split of each purchase's cents across its window touches in
    // truncating micro-cents (operands non-negative so // = div)
    "q_attribution_linear" ->
      """WITH p AS (SELECT CAST(user_id AS VARCHAR) AS context_id, event_id AS p_eid,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS p_ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |tc AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t_ts,
        |    arg_max(event_type, event_id) AS channel
        |  FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2),
        |m AS (SELECT p.context_id, p.p_eid, p.cents, tc.channel,
        |    count(*) OVER (PARTITION BY p.context_id, p.p_eid) AS n
        |  FROM p JOIN tc ON tc.context_id = p.context_id
        |    AND tc.t_ts <= p.p_ts AND tc.t_ts >= p.p_ts - 604800)
        |SELECT channel, CAST(count(DISTINCT p_eid) AS BIGINT) AS touched_purchases,
        |  CAST(sum((cents * 1000000) // n) AS BIGINT) AS credit_microcents
        |FROM m GROUP BY 1""".stripMargin,

    // time-decay attribution replayed: integer 2^(7−age) weights, the
    // per-purchase weight sum as a window, truncating credit division
    "q_attribution_decay" ->
      """WITH p AS (SELECT CAST(user_id AS VARCHAR) AS ctx, event_id AS p_eid,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS p_ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |tc AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t_ts,
        |    arg_max(event_type, event_id) AS channel
        |  FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2),
        |m AS (SELECT p.ctx, p.p_eid, p.cents, tc.channel,
        |    CAST(1 << CAST(7 - (p.p_ts - tc.t_ts) // 86400 AS INTEGER) AS BIGINT) AS w
        |  FROM p JOIN tc ON tc.ctx = p.ctx
        |    AND tc.t_ts <= p.p_ts AND tc.t_ts >= p.p_ts - 604800),
        |ws AS (SELECT *, CAST(sum(w) OVER (PARTITION BY ctx, p_eid) AS BIGINT) AS sumw
        |  FROM m)
        |SELECT channel, CAST(count(DISTINCT p_eid) AS BIGINT) AS touched_purchases,
        |  CAST(sum((cents * 1000000 * w) // sumw) AS BIGINT) AS credit_microcents
        |FROM ws GROUP BY 1""".stripMargin,

    // last-touch attribution: per purchase, the latest deduped touch in
    // the 7-day lookback (inclusive both ends, ties impossible after the
    // (context, ts) dedup), then revenue per channel in exact cents
    "q_attribution" ->
      """WITH p AS (SELECT CAST(user_id AS VARCHAR) AS context_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, value
        |  FROM events WHERE event_type = 'purchase'),
        |tc AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tt,
        |    arg_max(event_type, event_id) AS channel
        |  FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2),
        |m AS (SELECT p.context_id, p.event_id, p.value,
        |    arg_max(tc.channel, tc.tt) AS channel
        |  FROM p LEFT JOIN tc ON tc.context_id = p.context_id
        |    AND tc.tt <= p.t AND tc.tt >= p.t - 604800
        |  GROUP BY 1, 2, 3)
        |SELECT coalesce(channel, 'unattributed') AS channel,
        |  CAST(count(*) AS BIGINT) AS purchases,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM m GROUP BY 1""".stripMargin,

    // both key families derived analytically: frame pixels are
    // ((v + 6·fi)·31 + bx·7 + by·13) % 256 on the VIDEO's grid, image
    // pixels K·31 + … on the IMAGE's own grid — a pair matches iff the
    // grids AND every block value coincide (incl. mod-256 aliases)
    "q_media_crossdup" ->
      s"""WITH dims AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INTEGER) AS nf,
         |    8 * (1 << (doc_id % 3)) AS w, 8 * (1 << (doc_id % 2)) AS h FROM documents),
         |fr AS (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS fi FROM dims),
         |py AS (SELECT doc_id, fi, w, h, unnest(range(0, h)) AS y2 FROM fr),
         |px AS (SELECT doc_id, fi, w, h, y2, unnest(range(0, w)) AS x2 FROM py),
         |pk AS (SELECT doc_id, fi,
         |    ${Hashing.duckMd5Long("CAST(w AS VARCHAR) || 'x' || CAST(h AS VARCHAR) || ':' || string_agg(CAST(((doc_id + 6*fi)*31 + (x2//8)*7 + (y2//8)*13) % 256 AS VARCHAR), ',' ORDER BY y2, x2)")} AS frame_key
         |  FROM px GROUP BY 1, 2, w, h),
         |idm AS (SELECT doc_id, 8 * (1 << (doc_id % 3)) AS w, 8 * (1 << (doc_id % 2)) AS h FROM documents),
         |iy AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y2 FROM idm),
         |ix AS (SELECT doc_id, w, h, y2, unnest(range(0, w)) AS x2 FROM iy),
         |ik AS (SELECT doc_id,
         |    ${Hashing.duckMd5Long("CAST(w AS VARCHAR) || 'x' || CAST(h AS VARCHAR) || ':' || string_agg(CAST((doc_id*31 + (x2//8)*7 + (y2//8)*13) % 256 AS VARCHAR), ',' ORDER BY y2, x2)")} AS img_key
         |  FROM ix GROUP BY 1, w, h)
         |SELECT ik.doc_id AS image_id, pk.doc_id AS video_id, CAST(pk.fi AS BIGINT) AS frame_idx
         |FROM ik JOIN pk ON ik.img_key = pk.frame_key""".stripMargin,

    "q_pivot_daily" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS day_start,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        |FROM events GROUP BY 1""".stripMargin,

    "q_scd2" ->
      """WITH v AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS vt, arg_max(value, event_id) AS value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT context_id, vt AS valid_from,
        |  lead(vt) OVER (PARTITION BY context_id ORDER BY vt) AS valid_to, value
        |FROM v""".stripMargin,

    // window formulation over densified day-grain rows; deviation division
    // truncates toward zero (CASE) to match Spark's integral div
    "q_anomaly_days" ->
      """WITH c AS (SELECT event_type AS et, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |sp AS (SELECT et, min(day) AS d0, max(day) AS d1 FROM c GROUP BY 1),
        |dense AS (SELECT sp.et, sp.d0, gs.day
        |  FROM sp, LATERAL (SELECT unnest(generate_series(sp.d0, sp.d1)) AS day) gs),
        |dc AS (SELECT dense.et, dense.d0, dense.day, coalesce(c.cnt, 0) AS cnt
        |  FROM dense LEFT JOIN c ON dense.et = c.et AND dense.day = c.day),
        |tr AS (SELECT et, d0, day, cnt,
        |    sum(cnt) OVER (PARTITION BY et ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail FROM dc),
        |dev AS (SELECT et, day, cnt, trail, (cnt * 7 - trail) * 1000000 AS nn FROM tr
        |  WHERE day >= d0 + 7 AND trail > 0)
        |SELECT et AS event_type, CAST(day * 86400 AS BIGINT) AS day_start, cnt,
        |  CAST(trail AS BIGINT) AS trail_total,
        |  CAST(CASE WHEN nn >= 0 THEN nn // trail ELSE -((-nn) // trail) END AS BIGINT) AS dev_ppm
        |FROM dev
        |WHERE abs(CASE WHEN nn >= 0 THEN nn // trail ELSE -((-nn) // trail) END) >= 200000""".stripMargin,

    // the oracle IS the naive inequality join — it defines the semantics
    // the bucket-chopped equi-join must reproduce exactly
    "q_range_join" ->
      """WITH bands AS (
        |  SELECT i*1000000 AS lo, i*1000000 + 500000 + (i%3)*250000 AS hi,
        |    'tier' || CAST(i AS VARCHAR) AS tier FROM range(10) t(i)
        |  UNION ALL SELECT 2500000, 7500000, 'promo'),
        |li AS (SELECT l_orderkey*10 + l_linenumber AS id,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS price_c FROM lineitem)
        |SELECT id, price_c, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi, tier
        |FROM li JOIN bands ON price_c >= lo AND price_c < hi""".stripMargin,

    // brute-force overlap predicate defines the semantics the bucketized
    // claim-once plan must reproduce pair-for-pair
    "q_interval_join" ->
      """WITH o AS (SELECT o_orderkey AS order_id,
        |    CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS o_lo FROM orders),
        |oi AS (SELECT order_id, o_lo, o_lo + 7 + order_id % 30 AS o_hi FROM o),
        |p AS (SELECT i AS promo_id, 8035 + i*35 AS p_lo,
        |    8035 + i*35 + 14 + (i%3)*7 AS p_hi
        |  FROM (SELECT unnest(range(0, 75)) AS i) t)
        |SELECT order_id, o_lo, o_hi, promo_id, p_lo, p_hi
        |FROM oi JOIN p ON o_lo < p_hi AND p_lo < o_hi""".stripMargin,

    // native DuckDB ASOF LEFT JOIN defines the semantics the carry-forward
    // pass must reproduce (match: latest view with view_ts <= purchase ts)
    "q_asof_join" ->
      s"""WITH v AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS vt, arg_max(value, event_id) AS vv
         |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         |p AS (SELECT CAST(user_id AS VARCHAR) AS context_id, event_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS t, value
         |  FROM events WHERE event_type = 'purchase')
         |SELECT p.context_id, p.event_id, p.t AS "timestamp", p.value,
         |  v.vt AS view_timestamp, v.vv AS view_value
         |FROM p ASOF LEFT JOIN v
         |  ON p.context_id = v.context_id AND p.t >= v.vt""".stripMargin,

    // forward truth by bounded join + arg_min: the earliest deduped error
    // at or after each purchase, within the 1-day tolerance
    "q_asof_forward" ->
      s"""WITH er AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS et, arg_max(value, event_id) AS ev
         |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
         |p AS (SELECT CAST(user_id AS VARCHAR) AS context_id, event_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS t, value
         |  FROM events WHERE event_type = 'purchase'),
         |m AS (SELECT p.context_id, p.event_id, p.t, p.value,
         |    min(er.et) AS met, arg_min(er.ev, er.et) AS mev
         |  FROM p LEFT JOIN er ON er.context_id = p.context_id
         |    AND er.et >= p.t AND er.et <= p.t + 86400
         |  GROUP BY 1, 2, 3, 4)
         |SELECT context_id, event_id, t AS "timestamp", value,
         |  met AS err_timestamp, mev AS err_value
         |FROM m""".stripMargin,

    "q_sessionize" ->
      s"""WITH e AS ($eventsView),
         |s AS (SELECT context_id, t, eid,
         |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
         |         THEN 1 ELSE 0 END AS ns
         |  FROM e WINDOW w AS (PARTITION BY context_id ORDER BY t, eid)),
         |x AS (SELECT context_id, t,
         |    CAST(SUM(ns) OVER (PARTITION BY context_id ORDER BY t, eid
         |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
         |  FROM s)
         |SELECT context_id, session_idx, min(t) AS start_ts, max(t) AS end_ts,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  max(t) - min(t) AS duration_s
         |FROM x GROUP BY 1, 2""".stripMargin,

    // session assignment replayed, then first-touch stepA via row_number
    // and the earliest strictly-later stepB, LEFT-joined so unconverted
    // sessions stay visible
    "q_session_funnel" -> sessionFunnelOracle,

    // the UNSALTED join defines the truth — salting must be invisible in
    // the result
    "q_salted_join" ->
      """SELECT s.s_nationkey, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1""".stripMargin,

    // expected days via generate_series per type, missing = anti-join;
    // the same (day + len(type)) % 7 gap injection
    "q_coverage_gaps" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
        |f AS (SELECT DISTINCT event_type, day FROM e
        |  WHERE (day + length(event_type)) % 7 <> 0),
        |m AS (SELECT event_type, min(day) AS first_day, max(day) AS last_day,
        |    CAST(count(*) AS BIGINT) AS observed_days FROM f GROUP BY 1),
        |x AS (SELECT event_type,
        |    unnest(generate_series(first_day, last_day)) AS day FROM m),
        |miss AS (SELECT x.event_type, x.day FROM x
        |  LEFT JOIN f ON f.event_type = x.event_type AND f.day = x.day
        |  WHERE f.day IS NULL),
        |ms AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    array_to_string(list_sort(list(day)), ',') AS l
        |  FROM miss GROUP BY 1)
        |SELECT m.event_type, m.first_day, m.last_day,
        |  m.last_day - m.first_day + 1 AS span_days, m.observed_days,
        |  CAST(coalesce(ms.n, 0) AS BIGINT) AS missing_days,
        |  coalesce(ms.l, '') AS missing
        |FROM m LEFT JOIN ms USING (event_type)""".stripMargin,

    // positional-lag products over the ranked day series; ppm division
    // sign-split because DuckDB's // floors while Spark's div truncates
    "q_autocorr" -> {
      def lagCte(k: Int) =
        s"""n$k AS (SELECT a.event_type, CAST(sum(a.dev * b.dev) AS BIGINT) AS num
           |  FROM r a JOIN r b ON a.event_type = b.event_type
           |    AND a.rn = b.rn + $k GROUP BY 1)""".stripMargin
      def rCol(k: Int) =
        s"""CASE WHEN dn.den = 0 OR n$k.num IS NULL THEN NULL
           |  WHEN n$k.num >= 0 THEN (n$k.num * 1000000) // dn.den
           |  ELSE -(((-n$k.num) * 1000000) // dn.den) END AS r${k}_ppm""".stripMargin
      s"""WITH e AS (SELECT event_type,
         |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
         |c AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS cnt
         |  FROM e GROUP BY 1, 2),
         |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1),
         |d AS (SELECT c.event_type, c.day, c.cnt * m.n - m.tot AS dev
         |  FROM c JOIN m USING (event_type)),
         |r AS (SELECT d.*, row_number() OVER (PARTITION BY event_type
         |    ORDER BY day) AS rn FROM d),
         |dn AS (SELECT event_type, CAST(sum(dev * dev) AS BIGINT) AS den
         |  FROM d GROUP BY 1),
         |${lagCte(1)},
         |${lagCte(7)}
         |SELECT m.event_type, m.n AS n_days,
         |  (m.tot * 1000) // m.n AS mean_milli,
         |  ${rCol(1)},
         |  ${rCol(7)}
         |FROM m JOIN dn USING (event_type)
         |LEFT JOIN n1 ON n1.event_type = m.event_type
         |LEFT JOIN n7 ON n7.event_type = m.event_type""".stripMargin
    },

    // the CUSUM recurrence replayed as a recursive CTE: one walk row per
    // (type, day) past the 7-day burn-in, state FROZEN at first crossing
    // exactly as the Spark fold freezes; the doubled-after-19875 fixture
    // is a count multiplier here
    "q_changepoint" -> {
      val up = "greatest(0, w.sp + r.cnt*1000 - m.base_milli - m.base_milli*10//100)"
      val dn = "greatest(0, w.sn + m.base_milli - r.cnt*1000 - m.base_milli*10//100)"
      val h = "m.base_milli*400//100"
      s"""WITH RECURSIVE e AS (SELECT event_type,
         |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
         |c AS (SELECT event_type, day,
         |    CAST(count(*) * CASE WHEN day >= 19738 THEN 2 ELSE 1 END AS BIGINT) AS cnt
         |  FROM e GROUP BY 1, 2),
         |r AS (SELECT event_type, day, cnt,
         |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM c),
         |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST((sum(cnt) FILTER (WHERE rn <= 7) * 1000) // 7 AS BIGINT) AS base_milli
         |  FROM r GROUP BY 1 HAVING count(*) > 7),
         |walk(event_type, rn, sp, sn, msp, msn, cp, dir) AS (
         |  SELECT event_type, CAST(7 AS BIGINT), CAST(0 AS BIGINT),
         |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         |    CAST(-1 AS BIGINT), 0 FROM m
         |  UNION ALL
         |  SELECT w.event_type, w.rn + 1,
         |    CASE WHEN w.cp >= 0 THEN w.sp ELSE $up END,
         |    CASE WHEN w.cp >= 0 THEN w.sn ELSE $dn END,
         |    CASE WHEN w.cp >= 0 THEN w.msp ELSE greatest(w.msp, $up) END,
         |    CASE WHEN w.cp >= 0 THEN w.msn ELSE greatest(w.msn, $dn) END,
         |    CASE WHEN w.cp >= 0 THEN w.cp
         |      WHEN $up > $h THEN r.day WHEN $dn > $h THEN r.day
         |      ELSE CAST(-1 AS BIGINT) END,
         |    CASE WHEN w.cp >= 0 THEN w.dir
         |      WHEN $up > $h THEN 1 WHEN $dn > $h THEN 2 ELSE 0 END
         |  FROM walk w
         |  JOIN r ON r.event_type = w.event_type AND r.rn = w.rn + 1
         |  JOIN m ON m.event_type = w.event_type)
         |SELECT w.event_type, m.n_days, m.base_milli,
         |  CAST(w.msp AS BIGINT) AS max_sp, CAST(w.msn AS BIGINT) AS max_sn,
         |  CAST(CASE WHEN w.cp >= 0 THEN w.cp END AS BIGINT) AS cp_day,
         |  CASE w.dir WHEN 1 THEN 'up' WHEN 2 THEN 'down' END AS direction
         |FROM walk w JOIN m USING (event_type) WHERE w.rn = m.n_days""".stripMargin
    },

    // the same three windowed conditional extrema over the packed
    // ts·2³²+eid order key; NULL comparisons fall through exactly as
    // Spark's when() does
    "q_funnel_exclusion" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 4294967296 + event_id AS k
        |  FROM events),
        |a AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN k END)
        |    OVER (PARTITION BY context_id) AS ka FROM e),
        |b AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND k > ka
        |    THEN k END) OVER (PARTITION BY context_id) AS kb FROM a),
        |c AS (SELECT *, max(CASE WHEN event_type = 'error' AND k > ka
        |    AND k < kb THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY context_id) AS exc FROM b)
        |SELECT context_id, min(ka) // 4294967296 AS a_ts,
        |  min(kb) // 4294967296 AS b_ts,
        |  max(exc) = 1 AS excluded,
        |  min(kb) IS NOT NULL AND max(exc) = 0 AS converted_clean
        |FROM c GROUP BY 1""".stripMargin,

    // conversion latency over the funnel's converted sessions
    "q_time_to_convert" ->
      s"""WITH sf AS ($sessionFunnelOracle)
         |SELECT 'signup_to_purchase' AS funnel, CAST(count(*) AS BIGINT) AS n,
         |  min(b_ts - a_ts) AS lat_min, max(b_ts - a_ts) AS lat_max,
         |  round(quantile_cont(b_ts - a_ts, 0.5), 6) AS p50,
         |  round(quantile_cont(b_ts - a_ts, 0.9), 6) AS p90
         |FROM sf WHERE converted""".stripMargin,

    "q_funnel_weekly" ->
      s"""WITH sf AS ($sessionFunnelOracle)
         |SELECT a_ts // 604800 AS week,
         |  CAST(count(*) AS BIGINT) AS reached_a,
         |  CAST(count(b_ts) AS BIGINT) AS converted,
         |  CAST((count(b_ts) * 1000000) // count(*) AS BIGINT) AS conv_ppm
         |FROM sf WHERE a_ts IS NOT NULL GROUP BY 1""".stripMargin,

    "q_funnel_dropoff" ->
      s"""WITH sf AS ($sessionFunnelOracle)
         |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(count(a_ts) AS BIGINT) AS reached_a,
         |  CAST(count(b_ts) AS BIGINT) AS converted,
         |  CAST((count(b_ts) * 1000000) // count(*) AS BIGINT) AS conv_ppm,
         |  CAST(CASE WHEN count(a_ts) = 0 THEN 0
         |       ELSE (count(b_ts) * 1000000) // count(a_ts) END AS BIGINT) AS conv_of_a_ppm
         |FROM sf""".stripMargin,

    "q_event_transitions" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type FROM events),
        |p AS (SELECT lag(event_type) OVER (PARTITION BY ctx ORDER BY t, eid) AS from_type,
        |    event_type AS to_type FROM e),
        |m AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST((n * 1000000) // CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS BIGINT) AS p_ppm
        |FROM m""".stripMargin,

    // ratio-of-sums trailing baseline; truncate-toward-zero deviation via
    // CASE (DuckDB // floors negatives)
    "q_anomaly_rate" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c FROM events),
        |ud AS (SELECT ctx, d, CAST(max(c) AS BIGINT) AS c FROM e GROUP BY 1, 2),
        |pd AS (SELECT d, CAST(count(*) AS BIGINT) AS act, CAST(sum(c) AS BIGINT) AS cv
        |  FROM ud GROUP BY d),
        |tr AS (SELECT d + o AS d, act, cv FROM pd, (SELECT unnest(range(1, 8)) AS o)),
        |tw AS (SELECT d, CAST(sum(act) AS BIGINT) AS tact, CAST(sum(cv) AS BIGINT) AS tcv
        |  FROM tr GROUP BY d),
        |j AS (SELECT pd.d, pd.act, pd.cv,
        |    (pd.cv * 1000000) // pd.act AS rate_ppm,
        |    (tw.tcv * 1000000) // tw.tact AS trail_rate_ppm
        |  FROM pd JOIN tw ON tw.d = pd.d WHERE tw.tact > 0),
        |k AS (SELECT *, CASE WHEN rate_ppm >= trail_rate_ppm
        |      THEN (rate_ppm - trail_rate_ppm) * 1000000 // trail_rate_ppm
        |      ELSE -((trail_rate_ppm - rate_ppm) * 1000000 // trail_rate_ppm) END AS dev_ppm
        |  FROM j WHERE trail_rate_ppm > 0)
        |SELECT d * 86400 AS day_start, act AS n_active, cv AS n_conv,
        |  rate_ppm, trail_rate_ppm, dev_ppm
        |FROM k WHERE abs(dev_ppm) >= 50000""".stripMargin,

    "q_props_profile" ->
      """WITH e AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, CAST(count(k) AS BIGINT) AS n_with_k,
        |  min(k) AS k_min, max(k) AS k_max,
        |  CAST((sum(k) * 1000) // count(k) AS BIGINT) AS k_mean_milli
        |FROM e GROUP BY event_type""".stripMargin,

    "q_activity_heatmap" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow,
        |  (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600 AS hour,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_power_curve" ->
      """WITH u AS (SELECT CAST(user_id AS VARCHAR) AS ctx, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT list_transform(quantile_cont(n, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |    x -> round(x, 6)) AS bs FROM u),
        |s AS (SELECT CAST(len(list_filter(b.bs, x -> n > x)) AS BIGINT) AS decile, n
        |  FROM u, b),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(n) AS BIGINT) AS n_events FROM s GROUP BY 1),
        |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tt FROM g)
        |SELECT decile, n_users, n_events, (n_events * 1000000) // t.tt AS share_ppm
        |FROM g, t""".stripMargin,

    // identity: actives(d) = new + retained + resurrected; churned(d) =
    // actives(d-1) - retained(d); runs ending at the corpus edge churn on
    // their last-day + 1
    "q_growth_accounting" ->
      """WITH e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d FROM events),
        |m AS (SELECT ctx, d,
        |    lag(d) OVER (PARTITION BY ctx ORDER BY d) AS pd,
        |    lead(d) OVER (PARTITION BY ctx ORDER BY d) AS nd
        |  FROM e),
        |act AS (SELECT d,
        |    CAST(count(*) FILTER (WHERE pd IS NULL) AS BIGINT) AS n_new,
        |    CAST(count(*) FILTER (WHERE d - pd = 1) AS BIGINT) AS n_retained,
        |    CAST(count(*) FILTER (WHERE pd IS NOT NULL AND d - pd > 1) AS BIGINT) AS n_resurrected
        |  FROM m GROUP BY d),
        |ch AS (SELECT d + 1 AS d, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM m WHERE nd IS NULL OR nd > d + 1 GROUP BY 1)
        |SELECT coalesce(act.d, ch.d) * 86400 AS day_start,
        |  coalesce(n_new, 0) AS n_new, coalesce(n_retained, 0) AS n_retained,
        |  coalesce(n_resurrected, 0) AS n_resurrected,
        |  coalesce(n_churned, 0) AS n_churned
        |FROM act FULL OUTER JOIN ch ON act.d = ch.d""".stripMargin,

    // per-term truncating ppm products summed each iteration — the exact
    // integer map the driver-side power iteration applies
    "q_steady_mix" ->
      """WITH RECURSIVE e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type FROM events),
        |p AS (SELECT lag(event_type) OVER (PARTITION BY ctx ORDER BY t, eid) AS from_type,
        |    event_type AS to_type FROM e),
        |m AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |pr AS (SELECT from_type, to_type,
        |    CAST((n * 1000000) // CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS BIGINT) AS p_ppm
        |  FROM m),
        |ty AS (SELECT DISTINCT ty FROM (
        |  SELECT from_type AS ty FROM pr UNION SELECT to_type FROM pr)),
        |it AS (
        |  SELECT 0 AS iter, ty, CAST(1000000 // (SELECT count(*) FROM ty) AS BIGINT) AS v FROM ty
        |  UNION ALL
        |  SELECT it.iter + 1, tj.ty,
        |    CAST(coalesce(sum((it.v * coalesce(pr.p_ppm, 0)) // 1000000), 0) AS BIGINT)
        |  FROM it CROSS JOIN ty tj
        |  LEFT JOIN pr ON pr.from_type = it.ty AND pr.to_type = tj.ty
        |  WHERE it.iter < 32
        |  GROUP BY it.iter, tj.ty)
        |SELECT ty AS event_type, v AS steady_ppm FROM it WHERE iter = 32""".stripMargin,

    "q_event_gaps" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type FROM events),
        |g AS (SELECT event_type, t - lag(t) OVER (PARTITION BY ctx ORDER BY t, eid) AS gap FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  min(gap) AS g_min, max(gap) AS g_max,
        |  round(quantile_cont(gap, 0.5), 6) AS p50,
        |  round(quantile_cont(gap, 0.9), 6) AS p90
        |FROM g WHERE gap IS NOT NULL GROUP BY event_type""".stripMargin,

    "q_engagement" ->
      """WITH ud AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |cov AS (SELECT DISTINCT ctx, day + o AS day FROM ud, unnest(range(0, 7)) AS t(o)),
        |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau FROM cov GROUP BY 1)
        |SELECT dau.day * 86400 AS day, dau.dau, wau.wau,
        |  CAST((dau.dau * 1000000) // wau.wau AS BIGINT) AS stickiness_ppm
        |FROM dau JOIN wau ON dau.day = wau.day""".stripMargin,

    "q_retention" ->
      s"""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
         |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events),
         |w AS (SELECT DISTINCT ctx, wk FROM e),
         |c AS (SELECT ctx, min(wk) AS cw FROM w GROUP BY ctx)
         |SELECT c.cw * 604800 AS cohort_week, w.wk - c.cw AS week_offset,
         |  CAST(count(*) AS BIGINT) AS n_users
         |FROM w JOIN c ON w.ctx = c.ctx GROUP BY 1, 2""".stripMargin,

    // retained-at-or-after: each user contributes one row per offset up to
    // their LAST active week
    "q_retention_rolling" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events),
        |u AS (SELECT ctx, min(wk) AS cw, max(wk) AS lw FROM e GROUP BY ctx),
        |o AS (SELECT cw, unnest(range(0, lw - cw + 1)) AS week_offset FROM u)
        |SELECT cw * 604800 AS cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_retained
        |FROM o GROUP BY 1, 2""".stripMargin,

    // NY-local calendar weeks (Monday start): UTC instant → NY wall time →
    // date_trunc('week') → back to a UTC epoch; offsets are local-calendar
    // week differences
    "q_retention_cal" ->
      """WITH e AS (SELECT l_suppkey AS ctx,
        |    date_trunc('week', timezone('America/New_York',
        |      l_shipdate::TIMESTAMPTZ))::DATE AS wk
        |  FROM lineitem),
        |w AS (SELECT DISTINCT ctx, wk FROM e),
        |c AS (SELECT ctx, min(wk) AS cw FROM w GROUP BY ctx)
        |SELECT CAST(floor(epoch(timezone('America/New_York', cw::TIMESTAMP))) AS BIGINT) AS cohort_week,
        |  CAST((w.wk - c.cw) // 7 AS BIGINT) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM w JOIN c ON w.ctx = c.ctx GROUP BY 1, 2""".stripMargin,

    "q_engagement_cal" ->
      """WITH ud AS (SELECT DISTINCT l_suppkey AS ctx,
        |    date_trunc('day', timezone('America/New_York',
        |      l_shipdate::TIMESTAMPTZ))::DATE AS d
        |  FROM lineitem),
        |dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |cov AS (SELECT DISTINCT ctx, d + CAST(o AS INTEGER) AS d
        |  FROM ud, unnest(range(0, 7)) AS t(o)),
        |wau AS (SELECT d, CAST(count(*) AS BIGINT) AS wau FROM cov GROUP BY 1)
        |SELECT CAST(floor(epoch(timezone('America/New_York', dau.d::TIMESTAMP))) AS BIGINT) AS day,
        |  dau.dau, wau.wau,
        |  CAST((dau.dau * 1000000) // wau.wau AS BIGINT) AS stickiness_ppm
        |FROM dau JOIN wau ON dau.d = wau.d""".stripMargin,

    "q_value_percentiles" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  min(CAST(round(value * 1000) AS BIGINT)) AS v_min,
        |  max(CAST(round(value * 1000) AS BIGINT)) AS v_max,
        |  round(quantile_cont(CAST(round(value * 1000) AS BIGINT), 0.5), 6) AS p50,
        |  round(quantile_cont(CAST(round(value * 1000) AS BIGINT), 0.9), 6) AS p90,
        |  round(quantile_cont(CAST(round(value * 1000) AS BIGINT), 0.99), 6) AS p99
        |FROM events GROUP BY event_type""".stripMargin,

    // the oracle MAY use the per-context window — it defines the ranking
    // semantics the bounded two-phase aggregate must reproduce
    "q_top_events_per_ctx" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vq,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT context_id, event_id, vq, t,
        |    row_number() OVER (PARTITION BY context_id
        |      ORDER BY vq DESC, event_id) AS rank
        |  FROM e)
        |SELECT context_id, CAST(rank AS BIGINT) AS rank, event_id,
        |  vq AS value_milli, t AS "timestamp"
        |FROM r WHERE rank <= 3""".stripMargin,

    "q_line_dedup" ->
      """WITH injected AS (SELECT doc_id,
        |  'SHARED HEADER' || chr(10) || 'para-' || CAST(doc_id % 50 AS VARCHAR) || chr(10) ||
        |  CASE WHEN doc_id % 4 = 0 THEN chr(10) ELSE '' END || text ||
        |  chr(10) || 'tail-' || CAST(doc_id % 7 AS VARCHAR) AS text
        |  FROM documents),
        |l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM injected),
        |l1 AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, ls FROM l0),
        |l AS (SELECT doc_id, pos, ls[pos] AS line FROM l1),
        |k AS (SELECT doc_id, pos, line,
        |    trim(line) = '' OR
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1 AS keep
        |  FROM l)
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS text,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT) AS n_dropped
        |FROM k GROUP BY doc_id""".stripMargin,

    // both retrieval halves reproduced from first principles and blended
    // with the same integer weights
    "q_hybrid_search" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |q AS (SELECT qv FROM v WHERE vec_id = 0),
        |dfs AS (SELECT
        |  (SELECT count(*) FROM t WHERE list_contains(w, 'dup')) AS df_dup,
        |  (SELECT count(*) FROM t WHERE list_contains(w, 'vector')) AS df_vector),
        |s AS (SELECT doc_id,
        |  len(list_filter(w, x -> x = 'dup'))
        |    * (CASE WHEN df_dup > 0 THEN 1000000 // df_dup ELSE 0 END) +
        |  len(list_filter(w, x -> x = 'vector'))
        |    * (CASE WHEN df_vector > 0 THEN 1000000 // df_vector ELSE 0 END) AS term_score
        |  FROM t, dfs),
        |j AS (SELECT s.doc_id AS id, CAST(s.term_score AS BIGINT) AS term_score,
        |    CAST(list_dot_product(v.qv, q.qv) AS BIGINT) AS dot
        |  FROM s JOIN v ON v.vec_id = s.doc_id, q WHERE s.doc_id <> 0)
        |SELECT id, term_score * 1000 + dot AS score, term_score, dot FROM j
        |ORDER BY score DESC, id LIMIT 15""".stripMargin,

    // every (query, doc) pair scored from first principles: per-token df
    // over the corpus, tf per doc, blended with the exact integer dot,
    // per-query top-5 by (score DESC, id)
    "q_hybrid_search_batch" ->
      """WITH qterms AS (SELECT CAST(c0 AS BIGINT) AS query_id, c1 AS tok
        |  FROM (VALUES (0, 'dup'), (0, 'vector'), (1, 'data'), (1, 'sample'),
        |               (2, 'unique'), (2, 'hash')) x(c0, c1)),
        |t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |toks AS (SELECT DISTINCT tok FROM qterms),
        |dfs AS (SELECT tok, (SELECT count(*) FROM t WHERE list_contains(t.w, toks.tok)) AS df FROM toks),
        |tfx AS (SELECT t.doc_id, dfs.tok,
        |    len(list_filter(t.w, x -> x = dfs.tok)) AS n,
        |    CASE WHEN dfs.df > 0 THEN 1000000 // dfs.df ELSE 0 END AS wt
        |  FROM t CROSS JOIN dfs),
        |ts AS (SELECT qt.query_id, tfx.doc_id, CAST(SUM(tfx.n * tfx.wt) AS BIGINT) AS term_score
        |  FROM qterms qt JOIN tfx ON tfx.tok = qt.tok GROUP BY 1, 2),
        |j AS (SELECT ts.query_id, ts.doc_id AS id,
        |    ts.term_score * 1000 + CAST(list_dot_product(vd.qv, vq.qv) AS BIGINT) AS score,
        |    ts.term_score,
        |    CAST(list_dot_product(vd.qv, vq.qv) AS BIGINT) AS dot
        |  FROM ts JOIN v vd ON vd.vec_id = ts.doc_id
        |    JOIN v vq ON vq.vec_id = ts.query_id
        |  WHERE ts.doc_id <> ts.query_id)
        |SELECT query_id, id, score, term_score, dot FROM j
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) <= 5""".stripMargin,

    "q_embed_quantize" ->
      s"""WITH e1 AS (SELECT vec_id, embedding AS em, len(embedding) AS nd,
         |    unnest(range(1, len(embedding) + 1)) AS i FROM embeddings),
         |x AS (SELECT vec_id, nd, CAST(i AS BIGINT) AS i,
         |    CAST(em[i] AS DOUBLE) AS v FROM e1),
         |mm AS (SELECT i, min(v) AS mn, max(v) AS mx FROM x GROUP BY i),
         |q AS (SELECT vec_id, nd, x.i,
         |    CASE WHEN mx = mn THEN 0
         |         ELSE CAST(least(greatest(floor((v - mn) * 255 / (mx - mn)), 0), 255) AS BIGINT)
         |    END AS c
         |  FROM x JOIN mm ON x.i = mm.i)
         |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
         |  min(CASE WHEN i = 1 THEN c END) AS q_first,
         |  min(CASE WHEN i = nd THEN c END) AS q_last,
         |  CAST(sum(c) AS BIGINT) AS q_sum,
         |  ${duckMd5Long("string_agg(CAST(c AS VARCHAR), ',' ORDER BY i)")} AS fp
         |FROM q GROUP BY vec_id, nd""".stripMargin,

    // the q_multimodal_wav formula (int16 of u = (id*13 + i*97) % 65536)
    // re-aggregated per 64-sample frame; zero counted non-negative
    // the oracle is the routing rule alone — signatures must be read off
    // the real generator bytes
    "q_media_sniff" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 9 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |    WHEN 2 THEN 'gif' WHEN 3 THEN 'tiff' WHEN 4 THEN 'avi'
        |    WHEN 5 THEN 'bmp' WHEN 6 THEN 'ppm' WHEN 7 THEN 'wav'
        |    ELSE 'mp3' END AS format
        |FROM documents""".stripMargin,

    // analytic truth: frame g of doc id is active iff (g + id) mod 3 ≠ 0;
    // the merge is the standard sessionization window pair on frame index
    "q_audio_vad" ->
      """WITH f AS (SELECT doc_id AS media_id, t.g AS g
        |  FROM documents CROSS JOIN range(0, 6) t(g)
        |  WHERE (t.g + doc_id) % 3 <> 0),
        |s AS (SELECT media_id, g,
        |    CASE WHEN lag(g) OVER w IS NULL OR g - lag(g) OVER w > 1
        |         THEN 1 ELSE 0 END AS ns
        |  FROM f WINDOW w AS (PARTITION BY media_id ORDER BY g)),
        |x AS (SELECT media_id, g,
        |    CAST(SUM(ns) OVER (PARTITION BY media_id ORDER BY g
        |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS seg_idx
        |  FROM s)
        |SELECT media_id, seg_idx, min(g) AS start_frame, max(g) AS end_frame,
        |  CAST(count(*) AS BIGINT) AS n_active,
        |  max(g) - min(g) + 1 AS span_frames
        |FROM x GROUP BY 1, 2""".stripMargin,

    "q_audio_frames" ->
      """WITH s AS (SELECT doc_id, unnest(range(0, 256)) AS i FROM documents),
        |v AS (SELECT doc_id, i, CAST(i // 64 AS INTEGER) AS frame_idx,
        |    CASE WHEN (doc_id*13 + i*97) % 65536 < 32768 THEN (doc_id*13 + i*97) % 65536
        |         ELSE (doc_id*13 + i*97) % 65536 - 65536 END AS x FROM s),
        |z AS (SELECT doc_id, frame_idx, i, x,
        |    lag(x) OVER (PARTITION BY doc_id, frame_idx ORDER BY i) AS px FROM v)
        |SELECT doc_id AS media_id, frame_idx,
        |  CAST(sum(x) AS BIGINT) AS sum_amp,
        |  CAST(max(abs(x)) AS BIGINT) AS peak_abs,
        |  CAST(count(CASE WHEN px IS NOT NULL AND ((x >= 0) != (px >= 0)) THEN 1 END) AS BIGINT) AS zero_crossings,
        |  round(sqrt(sum(x * x) / 64.0), 6) AS rms
        |FROM z GROUP BY 1, 2""".stripMargin,

    // the 320-sample WAV corpus's per-frame Walsh–Hadamard peaks, replayed
    // bit-for-bit from the generation formula via bit_count
    "q_audio_wht" ->
      s"""WITH pk AS (${whtPeaksSql(320, 0, "")})
         |SELECT doc_id AS media_id, f AS frame_idx, CAST(k AS INTEGER) AS peak_k,
         |  CAST(a AS BIGINT) AS peak_abs
         |FROM pk""".stripMargin,

    "q_audio_fp" ->
      s"""WITH pk AS (${walshPeaksSql(0, 5, "")}),
         |fp AS (${whtFpSql("pk")})
         |SELECT doc_id AS media_id, f AS frame_idx, CAST(fp_key AS BIGINT) AS fp_key
         |FROM fp""".stripMargin,

    // probes: every 4th track, global frames 1..3 (a one-frame-shifted
    // 3-frame trim); the match joins on fp_key, votes on (media, offset),
    // and keeps the (votes DESC, media ASC, offset ASC) best per probe
    "q_audio_match" ->
      s"""WITH cp AS (${walshPeaksSql(0, 5, "")}),
         |pp AS (${walshPeaksSql(1, 4, " WHERE doc_id % 4 = 0")}),
         |cf AS (${whtFpSql("cp")}),
         |pf AS (${whtFpSql("pp")}),
         |j AS (SELECT pf.doc_id AS probe_id, cf.doc_id AS media_id,
         |    cf.f - pf.f AS off
         |  FROM pf JOIN cf ON pf.fp_key = cf.fp_key),
         |v AS (SELECT probe_id, media_id, off, CAST(count(*) AS BIGINT) AS votes
         |  FROM j GROUP BY 1, 2, 3),
         |r AS (SELECT v.*, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY votes DESC, media_id, off) AS rn FROM v)
         |SELECT probe_id, media_id, CAST(off AS BIGINT) AS offset_frames, votes
         |FROM r WHERE rn = 1""".stripMargin,

    // the q_audio_match oracle with the probe side restricted to the
    // even-doc videos' soundtracks (global frames 1..3 of the doc's track)
    "q_av_soundtrack" ->
      s"""WITH cp AS (${walshPeaksSql(0, 5, "")}),
         |pp AS (${walshPeaksSql(1, 4, " WHERE doc_id % 2 = 0")}),
         |cf AS (${whtFpSql("cp")}),
         |pf AS (${whtFpSql("pp")}),
         |j AS (SELECT pf.doc_id AS probe_id, cf.doc_id AS media_id,
         |    cf.f - pf.f AS off
         |  FROM pf JOIN cf ON pf.fp_key = cf.fp_key),
         |v AS (SELECT probe_id, media_id, off, CAST(count(*) AS BIGINT) AS votes
         |  FROM j GROUP BY 1, 2, 3),
         |r AS (SELECT v.*, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY votes DESC, media_id, off) AS rn FROM v)
         |SELECT probe_id, media_id, CAST(off AS BIGINT) AS offset_frames, votes
         |FROM r WHERE rn = 1""".stripMargin,

    // sessionization replayed, entry/exit from the per-session first/last
    // rows, bounce = single-event session
    "q_entry_exit" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type
        |  FROM events),
        |s AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
        |      THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY ctx ORDER BY t, eid)),
        |x AS (SELECT *, SUM(ns) OVER (PARTITION BY ctx ORDER BY t, eid
        |    ROWS UNBOUNDED PRECEDING) - 1 AS sid FROM s),
        |o AS (SELECT *, row_number() OVER (PARTITION BY ctx, sid ORDER BY t, eid) AS rf,
        |    row_number() OVER (PARTITION BY ctx, sid ORDER BY t DESC, eid DESC) AS rl
        |  FROM x),
        |ss AS (SELECT ctx, sid,
        |    min(CASE WHEN rf = 1 THEN event_type END) AS entry_type,
        |    min(CASE WHEN rl = 1 THEN event_type END) AS exit_type,
        |    count(*) AS n, max(t) - min(t) AS dur
        |  FROM o GROUP BY 1, 2)
        |SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |  CAST((sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS bounce_ppm,
        |  CAST(sum(dur) AS BIGINT) AS total_duration_s
        |FROM ss GROUP BY 1, 2""".stripMargin,

    // per-context lifetimes, churn = silent >7 days before the corpus's
    // last active day, risk sets by descending-cumulative count
    "q_churn_hazard" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d FROM events),
        |p AS (SELECT ctx, min(d) AS fd, max(d) AS ld FROM e GROUP BY 1),
        |m AS (SELECT max(ld) AS endd FROM p),
        |lv AS (SELECT ld - fd AS t_days,
        |    CASE WHEN ld + 7 < endd THEN 1 ELSE 0 END AS ch FROM p, m),
        |g AS (SELECT t_days, CAST(count(*) AS BIGINT) AS n_end,
        |    CAST(sum(ch) AS BIGINT) AS n_churn FROM lv GROUP BY 1)
        |SELECT t_days, n_end, n_churn, n_end - n_churn AS n_censored,
        |  CAST(sum(n_end) OVER dw AS BIGINT) AS n_risk,
        |  CAST((n_churn * 1000000) // sum(n_end) OVER dw AS BIGINT) AS hazard_ppm
        |FROM g WINDOW dw AS (ORDER BY t_days DESC ROWS UNBOUNDED PRECEDING)""".stripMargin,

    // all ordered pairs within ±2 positions per doc, brute-force via the
    // positions self-join the scaled plan must reproduce
    "q_skipgram" ->
      """WITH d0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ls
        |  FROM documents),
        |p0 AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, ls FROM d0),
        |tk AS (SELECT doc_id, pos, ls[pos] AS tok FROM p0)
        |SELECT a.tok AS center, b.tok AS context, CAST(count(*) AS BIGINT) AS n
        |FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.pos <> b.pos
        |  AND abs(a.pos - b.pos) <= 2
        |GROUP BY 1, 2""".stripMargin,

    "q_target_encode" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS value_milli FROM events),
        |s AS (SELECT event_type, CAST(sum(value_milli) AS BIGINT) AS sm,
        |    CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value_milli,
        |  CASE WHEN s.n > 1 THEN
        |    CASE WHEN sm - value_milli >= 0 THEN (sm - value_milli) // (s.n - 1)
        |         ELSE -((-(sm - value_milli)) // (s.n - 1)) END
        |  END AS loo_milli
        |FROM e JOIN s USING (event_type)""".stripMargin,

    // the q_bootstrap_ci draw split per md5-parity arm, replicas paired
    "q_bootstrap_lift" -> {
      val cdf = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
        999405L, 999916L, 999989L, 999998L)
      val w = cdf.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH e AS (SELECT event_id,
         |    ${Hashing.duckMd5Long("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         |    CAST(round(value * 1000) AS BIGINT) AS vm
         |  FROM events WHERE event_type = 'purchase'),
         |x AS (SELECT event_id, arm, vm, unnest(range(0, 32)) AS replica FROM e),
         |u AS (SELECT CAST(replica AS INTEGER) AS replica, arm, vm,
         |    ${Hashing.duckMd5Long(
               "'boot:' || CAST(event_id AS VARCHAR) || ':' || CAST(replica AS VARCHAR)")} % 1000000 AS u
         |  FROM x),
         |w AS (SELECT replica, arm, vm, CAST($w AS BIGINT) AS w FROM u),
         |pa AS (SELECT replica, arm, CAST(sum(w) AS BIGINT) AS n,
         |    CASE WHEN sum(w) > 0 THEN CAST(sum(w * vm) // sum(w) AS BIGINT) END AS m
         |  FROM w GROUP BY 1, 2)
         |SELECT a.replica, a.n AS n_a, b.n AS n_b,
         |  a.m AS mean_a_milli, b.m AS mean_b_milli,
         |  b.m - a.m AS lift_milli
         |FROM (SELECT * FROM pa WHERE arm = 0) a
         |JOIN (SELECT * FROM pa WHERE arm = 1) b USING (replica)""".stripMargin
    },

    // 32 replicas, weights from the md5-uniform inverted through the
    // literal Poisson(1) ppm CDF — identical draws on both engines
    "q_bootstrap_ci" -> {
      val cdf = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
        999405L, 999916L, 999989L, 999998L)
      val w = cdf.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH e AS (SELECT event_id, CAST(round(value * 1000) AS BIGINT) AS vm
         |  FROM events WHERE event_type = 'purchase'),
         |x AS (SELECT event_id, vm, unnest(range(0, 32)) AS replica FROM e),
         |u AS (SELECT CAST(replica AS INTEGER) AS replica, vm,
         |    ${Hashing.duckMd5Long(
               "'boot:' || CAST(event_id AS VARCHAR) || ':' || CAST(replica AS VARCHAR)")} % 1000000 AS u
         |  FROM x),
         |w AS (SELECT replica, vm, CAST($w AS BIGINT) AS w FROM u)
         |SELECT replica, CAST(sum(w) AS BIGINT) AS n_eff,
         |  CAST(sum(w * vm) AS BIGINT) AS sum_milli,
         |  CASE WHEN sum(w) > 0
         |    THEN CAST(sum(w * vm) // sum(w) AS BIGINT) END AS mean_milli
         |FROM w GROUP BY replica""".stripMargin
    },

    // value-grain arm counts, strictly-below cumulatives, doubled U
    "q_ab_mwu" ->
      s"""WITH e AS (SELECT
         |    ${Hashing.duckMd5Long("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         |    CAST(round(value * 1000) AS BIGINT) AS vm
         |  FROM events WHERE event_type = 'purchase'),
         |g AS (SELECT vm,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         |  FROM e GROUP BY 1),
         |c AS (SELECT g.*,
         |    CAST(coalesce(sum(na) OVER w, 0) AS BIGINT) AS cuma,
         |    CAST(coalesce(sum(nb) OVER w, 0) AS BIGINT) AS cumb
         |  FROM g WINDOW w AS (ORDER BY vm ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND 1 PRECEDING))
         |SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b,
         |  CAST(sum(na * (cumb * 2 + nb)) AS BIGINT) AS u2_a,
         |  CAST(sum(nb * (cuma * 2 + na)) AS BIGINT) AS u2_b
         |FROM c""".stripMargin,

    // four conditional cells in one aggregate; means truncate per cell
    // before differencing, exactly as the Spark divs do
    "q_ab_did" ->
      s"""WITH e AS (SELECT
         |    ${Hashing.duckMd5Long("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 < 19738 AS pre,
         |    CAST(round(value * 1000) AS BIGINT) AS vm
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT
         |    CAST(sum(CASE WHEN arm = 0 AND pre THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_a,
         |    CAST(sum(CASE WHEN arm = 0 AND NOT pre THEN 1 ELSE 0 END) AS BIGINT) AS n_post_a,
         |    CAST(sum(CASE WHEN arm = 1 AND pre THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_b,
         |    CAST(sum(CASE WHEN arm = 1 AND NOT pre THEN 1 ELSE 0 END) AS BIGINT) AS n_post_b,
         |    CAST(sum(CASE WHEN arm = 0 AND pre THEN vm ELSE 0 END) AS BIGINT) AS spa,
         |    CAST(sum(CASE WHEN arm = 0 AND NOT pre THEN vm ELSE 0 END) AS BIGINT) AS soa,
         |    CAST(sum(CASE WHEN arm = 1 AND pre THEN vm ELSE 0 END) AS BIGINT) AS spb,
         |    CAST(sum(CASE WHEN arm = 1 AND NOT pre THEN vm ELSE 0 END) AS BIGINT) AS sob
         |  FROM e)
         |SELECT n_pre_a, n_post_a, n_pre_b, n_post_b,
         |  spa // n_pre_a AS mean_pre_a_milli,
         |  soa // n_post_a AS mean_post_a_milli,
         |  spb // n_pre_b AS mean_pre_b_milli,
         |  sob // n_post_b AS mean_post_b_milli,
         |  (sob // n_post_b - spb // n_pre_b)
         |    - (soa // n_post_a - spa // n_pre_a) AS did_milli
         |FROM c""".stripMargin,

    // trimmed/winsorized means replayed over the same value-grain table:
    // per-grain kept mass is the rank-interval intersection, cut values
    // are the grains containing ranks k+1 and n−k; all integer div
    "q_ab_trimmed" ->
      s"""WITH e AS (SELECT
         |    ${Hashing.duckMd5Long("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         |    CAST(round(value * 1000) AS BIGINT) AS vm
         |  FROM events WHERE event_type = 'purchase'),
         |g AS (SELECT vm,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         |  FROM e GROUP BY 1),
         |c AS (SELECT g.*,
         |    CAST(coalesce(sum(na) OVER w, 0) AS BIGINT) AS cuma,
         |    CAST(coalesce(sum(nb) OVER w, 0) AS BIGINT) AS cumb,
         |    CAST(sum(na) OVER () AS BIGINT) AS n_a,
         |    CAST(sum(nb) OVER () AS BIGINT) AS n_b
         |  FROM g WINDOW w AS (ORDER BY vm ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND 1 PRECEDING)),
         |k AS (SELECT c.*, n_a * 10 // 100 AS ka, n_b * 10 // 100 AS kb,
         |    greatest(0, least(cuma + na, n_a - n_a * 10 // 100)
         |      - greatest(cuma, n_a * 10 // 100)) AS keepa,
         |    greatest(0, least(cumb + nb, n_b - n_b * 10 // 100)
         |      - greatest(cumb, n_b * 10 // 100)) AS keepb
         |  FROM c)
         |SELECT max(n_a) AS n_a, max(n_b) AS n_b,
         |  max(ka) AS trim_k_a, max(kb) AS trim_k_b,
         |  CAST(sum(na * vm) // max(n_a) AS BIGINT) AS mean_a_milli,
         |  CAST(sum(nb * vm) // max(n_b) AS BIGINT) AS mean_b_milli,
         |  CAST(sum(keepa * vm) // (max(n_a) - max(ka) * 2) AS BIGINT) AS trimmed_a_milli,
         |  CAST(sum(keepb * vm) // (max(n_b) - max(kb) * 2) AS BIGINT) AS trimmed_b_milli,
         |  CAST((sum(keepa * vm) + max(ka) *
         |      (min(CASE WHEN cuma + na > ka THEN vm END)
         |       + min(CASE WHEN cuma + na >= n_a - ka THEN vm END)))
         |    // max(n_a) AS BIGINT) AS winsor_a_milli,
         |  CAST((sum(keepb * vm) + max(kb) *
         |      (min(CASE WHEN cumb + nb > kb THEN vm END)
         |       + min(CASE WHEN cumb + nb >= n_b - kb THEN vm END)))
         |    // max(n_b) AS BIGINT) AS winsor_b_milli,
         |  CAST(sum(keepb * vm) // (max(n_b) - max(kb) * 2)
         |    - sum(keepa * vm) // (max(n_a) - max(ka) * 2) AS BIGINT) AS trimmed_diff_milli
         |FROM k""".stripMargin,

    // same interpolated-percentile definition (h = p·(n−1)) on both
    // engines; bin = count of thresholds at or below the value
    "q_quantile_bins" ->
      """WITH e AS (SELECT event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS value_milli FROM events),
        |t AS (SELECT quantile_cont(value_milli,
        |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS th FROM e)
        |SELECT event_id, value_milli,
        |  CAST((CASE WHEN value_milli >= th[1] THEN 1 ELSE 0 END) +
        |    (CASE WHEN value_milli >= th[2] THEN 1 ELSE 0 END) +
        |    (CASE WHEN value_milli >= th[3] THEN 1 ELSE 0 END) +
        |    (CASE WHEN value_milli >= th[4] THEN 1 ELSE 0 END) +
        |    (CASE WHEN value_milli >= th[5] THEN 1 ELSE 0 END) +
        |    (CASE WHEN value_milli >= th[6] THEN 1 ELSE 0 END) +
        |    (CASE WHEN value_milli >= th[7] THEN 1 ELSE 0 END) AS BIGINT) AS bin
        |FROM e, t""".stripMargin,

    "q_feature_hash" ->
      s"""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id,
         |    event_type || '|' ||
         |      CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 7 AS VARCHAR) AS f
         |  FROM events)
         |SELECT context_id, CAST(${Hashing.duckMd5Long("f")} % 64 AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM e GROUP BY 1, 2""".stripMargin,

    "q_set_completion" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type
        |  FROM events),
        |s AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
        |      THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY ctx ORDER BY t, eid)),
        |x AS (SELECT *, SUM(ns) OVER (PARTITION BY ctx ORDER BY t, eid
        |    ROWS UNBOUNDED PRECEDING) - 1 AS sid FROM s)
        |SELECT ctx AS context_id, CAST(sid AS BIGINT) AS session_idx,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT CASE WHEN event_type IN ('signup', 'view', 'purchase')
        |    THEN event_type END) AS BIGINT) AS n_done,
        |  count(DISTINCT CASE WHEN event_type IN ('signup', 'view', 'purchase')
        |    THEN event_type END) = 3 AS completed
        |FROM x GROUP BY 1, 2""".stripMargin,

    // sessionization replayed, per-session distinct types, brute-force
    // pair/single/total counts, lift in exact integer ppm
    "q_basket_lift" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, event_type
        |  FROM events),
        |s AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
        |      THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY ctx ORDER BY t, eid)),
        |x AS (SELECT *, SUM(ns) OVER (PARTITION BY ctx ORDER BY t, eid
        |    ROWS UNBOUNDED PRECEDING) - 1 AS sid FROM s),
        |st AS (SELECT DISTINCT ctx, sid, event_type FROM x),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions
        |  FROM (SELECT DISTINCT ctx, sid FROM st)),
        |sing AS (SELECT event_type AS t, CAST(count(*) AS BIGINT) AS n
        |  FROM st GROUP BY 1),
        |pr AS (SELECT l.event_type AS a, r.event_type AS b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM st l JOIN st r ON l.ctx = r.ctx AND l.sid = r.sid
        |    AND l.event_type < r.event_type
        |  GROUP BY 1, 2)
        |SELECT pr.a, pr.b, pr.n_ab, sa.n AS n_a, sb.n AS n_b, tot.n_sessions,
        |  CAST((pr.n_ab * 1000000) // tot.n_sessions AS BIGINT) AS support_ppm,
        |  CAST((pr.n_ab * tot.n_sessions * 1000000) // (sa.n * sb.n) AS BIGINT) AS lift_ppm
        |FROM pr JOIN sing sa ON pr.a = sa.t JOIN sing sb ON pr.b = sb.t
        |CROSS JOIN tot""".stripMargin,

    "q_reach_curve" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d FROM events),
        |f AS (SELECT ctx, min(d) AS fd FROM e GROUP BY 1),
        |g AS (SELECT fd, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1)
        |SELECT fd * 86400 AS day_start, n_new,
        |  CAST(sum(n_new) OVER (ORDER BY fd ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_reach
        |FROM g""".stripMargin,

    // weekly revenue cohorts: milli-quantized before summing, cumulative
    // via a window over the (cohort, offset) matrix
    "q_cohort_ltv" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS ctx,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS bk,
        |    CAST(round(value * 1000) AS BIGINT) AS vm FROM events),
        |pb AS (SELECT ctx, bk, sum(vm) AS rev FROM e GROUP BY 1, 2),
        |ch AS (SELECT ctx, min(bk) AS cohort FROM pb GROUP BY 1),
        |cells AS (SELECT cohort, bk - cohort AS bucket_offset,
        |    CAST(count(*) AS BIGINT) AS n_active, CAST(sum(rev) AS BIGINT) AS revenue_milli
        |  FROM pb JOIN ch USING (ctx) GROUP BY 1, 2),
        |w AS (SELECT cells.*,
        |    CAST(sum(revenue_milli) OVER (PARTITION BY cohort ORDER BY bucket_offset
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_milli,
        |    CAST(max(CASE WHEN bucket_offset = 0 THEN n_active END)
        |      OVER (PARTITION BY cohort) AS BIGINT) AS cohort_size
        |  FROM cells)
        |SELECT cohort * 604800 AS cohort_start, bucket_offset, n_active,
        |  revenue_milli, cum_revenue_milli, cohort_size,
        |  CAST(CASE WHEN cum_revenue_milli >= 0 THEN cum_revenue_milli // cohort_size
        |       ELSE -((-cum_revenue_milli) // cohort_size) END AS BIGINT) AS ltv_milli
        |FROM w""".stripMargin,

    "q_image_dhash" ->
      s"""WITH h AS ($dhashOracle)
         |SELECT media_id, CAST(5 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
         |  hash_hi, hash_lo FROM h""".stripMargin,

    // frame f of video id is the quality-1.0 block-constant JPEG of
    // id' = id + 6f (bit-exact DCT round trip, the q_multimodal_jpeg
    // argument): pixel (x,y) = (id'*31 + (x//8)*7 + (y//8)*13) % 256 on an
    // (8·2^(id%3)) × (8·2^(id%2)) canvas — the oracle recomputes the
    // NN-sampled gray grid from that formula
    "q_video_dhash" -> videoDhashOracle,

    // lag over each video's per-frame hashes (from the synthesis formula),
    // Hamming to the previous frame, running cut count
    "q_video_scenes" ->
      s"""WITH vd AS ($videoDhashOracle),
         |z AS (SELECT media_id, frame_idx, hash_hi, hash_lo,
         |    lag(hash_hi) OVER w AS phi, lag(hash_lo) OVER w AS plo
         |  FROM vd WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
         |d AS (SELECT media_id, frame_idx,
         |    CASE WHEN phi IS NULL THEN 0
         |         ELSE bit_count(xor(hash_hi, phi)) + bit_count(xor(hash_lo, plo)) END AS dist,
         |    phi IS NULL OR
         |      bit_count(xor(hash_hi, phi)) + bit_count(xor(hash_lo, plo)) > 8 AS is_cut
         |  FROM z)
         |SELECT media_id, frame_idx, CAST(dist AS BIGINT) AS dist, is_cut,
         |  CAST(SUM(CASE WHEN is_cut THEN 1 ELSE 0 END) OVER (
         |    PARTITION BY media_id ORDER BY frame_idx ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS scene_idx
         |FROM d""".stripMargin,

    // distinct (video, frame-content-key) sets intersected per pair;
    // candidates from the key equi-join, same as the Spark plan
    "q_video_neardup" ->
      s"""WITH vd AS ($videoDhashOracle),
         |vh AS (SELECT DISTINCT media_id, frame_key FROM vd),
         |pv AS (SELECT media_id, CAST(count(*) AS BIGINT) AS nh FROM vh GROUP BY 1),
         |p AS (SELECT a.media_id AS a, b.media_id AS b, CAST(count(*) AS BIGINT) AS shared
         |  FROM vh a JOIN vh b ON a.frame_key = b.frame_key
         |    AND a.media_id < b.media_id
         |  GROUP BY 1, 2)
         |SELECT p.a, p.b, p.shared,
         |  CAST((p.shared * 1000000) // least(pa.nh, pb.nh) AS BIGINT) AS sim_ppm
         |FROM p JOIN pv pa ON pa.media_id = p.a JOIN pv pb ON pb.media_id = p.b
         |WHERE p.shared >= 1""".stripMargin,

    // brute-force pair graph from the formula hashes → recursive min-label
    // walk (the q_dedup_cluster oracle pattern)
    "q_image_clusters" ->
      s"""WITH RECURSIVE h AS ($dhashOracle),
         |p AS (SELECT a.media_id AS id_1, b.media_id AS id_2
         |  FROM h a JOIN h b ON a.media_id < b.media_id
         |  WHERE bit_count(xor(a.hash_hi, b.hash_hi)) + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
         |e AS (SELECT id_1 AS u, id_2 AS v FROM p UNION SELECT id_2, id_1 FROM p),
         |n AS (SELECT DISTINCT u AS id FROM e),
         |walk(id, label) AS (
         |  SELECT id, id FROM n
         |  UNION
         |  SELECT e.v, w.label FROM walk w JOIN e ON e.u = w.id WHERE w.label < e.v)
         |SELECT id, min(label) AS cluster_id, id = min(label) AS is_survivor
         |FROM walk GROUP BY id""".stripMargin,

    "q_image_neardup" ->
      s"""WITH h AS ($dhashOracle)
         |SELECT a.media_id AS a, b.media_id AS b,
         |  CAST(bit_count(xor(a.hash_hi, b.hash_hi)) + bit_count(xor(a.hash_lo, b.hash_lo)) AS BIGINT) AS dist
         |FROM h a JOIN h b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.hash_hi, b.hash_hi)) + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3""".stripMargin,

    // ten unrolled iterations of the truncating-integer PageRank map over
    // the q_image_neardup graph — CTE r_i references r_{i-1}, every
    // division floors on non-negative operands exactly as Spark's div
    "q_graph_pagerank" -> {
      val iterCtes = (1 to 10).map { i =>
        s"""r$i AS (SELECT dg.src AS node,
           |    CAST(150000 + (850000 * coalesce(c.s, 0)) // 1000000 AS BIGINT) AS r
           |  FROM dg LEFT JOIN (
           |    SELECT ed.dst, CAST(sum(r.r // d2.deg) AS BIGINT) AS s
           |    FROM ed JOIN r${i - 1} r ON ed.src = r.node
           |    JOIN dg d2 ON ed.src = d2.src
           |    GROUP BY 1) c ON dg.src = c.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH h AS ($dhashOracle),
         |ed0 AS (SELECT a.media_id AS a, b.media_id AS b
         |  FROM h a JOIN h b ON a.media_id < b.media_id
         |  WHERE bit_count(xor(a.hash_hi, b.hash_hi)) + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
         |ed AS (SELECT a AS src, b AS dst FROM ed0
         |  UNION ALL SELECT b AS src, a AS dst FROM ed0),
         |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM dg),
         |$iterCtes
         |SELECT node, r AS rank_ppm FROM r10""".stripMargin
    },

    // the q_image_neardup pair graph, triangles enumerated once per
    // oriented (x < y < z) closure, coefficients in truncated ppm
    "q_graph_triangles" ->
      s"""WITH h AS ($dhashOracle),
         |ed AS (SELECT a.media_id AS a, b.media_id AS b
         |  FROM h a JOIN h b ON a.media_id < b.media_id
         |  WHERE bit_count(xor(a.hash_hi, b.hash_hi)) + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM ed e1 JOIN ed e2 ON e1.b = e2.a
         |  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
         |tn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri
         |  FROM (SELECT unnest([x, y, z]) AS node FROM tri) t GROUP BY 1),
         |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
         |  FROM (SELECT unnest([a, b]) AS node FROM ed) t GROUP BY 1)
         |SELECT dg.node, degree, coalesce(n_tri, 0) AS n_tri,
         |  CAST(CASE WHEN degree >= 2
         |    THEN (2 * coalesce(n_tri, 0) * 1000000) // (degree * (degree - 1))
         |    ELSE 0 END AS BIGINT) AS lcc_ppm
         |FROM dg LEFT JOIN tn USING (node)""".stripMargin,

    // three unrolled synchronous LPA rounds: neighbor-label counts, then
    // the per-node winner via (count DESC, label) row_number — the same
    // min-tie argmax the Spark max(struct) computes
    "q_graph_lpa" -> {
      val rounds = (1 to 3).map { i =>
        s"""n$i AS (SELECT e.u AS node, l.label, CAST(count(*) AS BIGINT) AS c
           |  FROM ed e JOIN l${i - 1} l ON e.v = l.node GROUP BY 1, 2),
           |l$i AS (SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER (PARTITION BY node
           |      ORDER BY c DESC, label) AS rn FROM n$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH h AS ($dhashOracle),
         |ed0 AS (SELECT a.media_id AS a, b.media_id AS b
         |  FROM h a JOIN h b ON a.media_id < b.media_id
         |  WHERE bit_count(xor(a.hash_hi, b.hash_hi)) + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
         |ed AS (SELECT a AS u, b AS v FROM ed0
         |  UNION ALL SELECT b AS u, a AS v FROM ed0),
         |l0 AS (SELECT DISTINCT u AS node, u AS label FROM ed),
         |$rounds
         |SELECT node, label AS community FROM l3""".stripMargin
    },

    // self-retrieval truth by cross scan: same overlap score, rank via
    // count-of-better against the relevant row — no top-k replay needed
    "q_search_mrr" ->
      """WITH t AS (SELECT doc_id,
        |    list_distinct(regexp_split_to_array(trim(text), '\s+')) AS w,
        |    regexp_split_to_array(trim(text), '\s+') AS raw FROM documents),
        |q AS (SELECT doc_id AS query_id, list_distinct(raw[1:3]) AS qt
        |  FROM t WHERE doc_id % 25 = 0),
        |f AS (SELECT q.query_id, d.doc_id AS did,
        |    len(list_intersect(q.qt, d.w)) AS sc
        |  FROM q CROSS JOIN t d
        |  WHERE len(list_intersect(q.qt, d.w)) > 0),
        |rel AS (SELECT query_id, sc AS rsc FROM f WHERE did = query_id),
        |r AS (SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_matched,
        |    CAST(1 + count(*) FILTER (WHERE f.sc > rel.rsc
        |      OR (f.sc = rel.rsc AND f.did < f.query_id)) AS BIGINT) AS rank
        |  FROM f JOIN rel USING (query_id) GROUP BY 1)
        |SELECT q.query_id, CAST(coalesce(r.n_matched, 0) AS BIGINT) AS n_matched,
        |  r.rank,
        |  CASE WHEN r.rank IS NOT NULL AND r.rank <= 10
        |    THEN 1000000 // r.rank ELSE 0 END AS rr_ppm
        |FROM q LEFT JOIN r USING (query_id)""".stripMargin,

    // the stitched labeling replayed (recursive walk), then the standard
    // sessionization windows at identity grain
    "q_identity_sessions" ->
      """WITH RECURSIVE u AS (SELECT DISTINCT user_id AS id FROM events),
        |k AS (SELECT id, (id*7)%97 AS dev, (id*11)%89 AS em FROM u),
        |pd AS (SELECT a.id AS u, b.id AS v FROM k a JOIN k b
        |       ON a.dev = b.dev AND a.id <> b.id),
        |pe AS (SELECT a.id AS u, b.id AS v FROM k a JOIN k b
        |       ON a.em = b.em AND a.id <> b.id),
        |e AS (SELECT u, v FROM pd UNION SELECT u, v FROM pe),
        |walk(id, label) AS (
        |  SELECT id, id FROM u
        |  UNION
        |  SELECT e.v, w.label FROM walk w JOIN e ON e.u = w.id
        |  WHERE w.label < e.v),
        |lab AS (SELECT id, min(label) AS identity_id FROM walk GROUP BY id),
        |ev AS (SELECT l.identity_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    event_id AS eid
        |  FROM events JOIN lab l ON events.user_id = l.id),
        |s AS (SELECT identity_id, t, eid,
        |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600
        |         THEN 1 ELSE 0 END AS ns
        |  FROM ev WINDOW w AS (PARTITION BY identity_id ORDER BY t, eid)),
        |x AS (SELECT identity_id, t,
        |    CAST(SUM(ns) OVER (PARTITION BY identity_id ORDER BY t, eid
        |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM s)
        |SELECT identity_id, session_idx, min(t) AS start_ts, max(t) AS end_ts,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  max(t) - min(t) AS duration_s
        |FROM x GROUP BY 1, 2""".stripMargin,

    // identity stitching replayed pairwise: the oracle connects EVERY
    // co-keyed context pair and min-labels via the recursive walk — the
    // star-edge Spark plan must land on identical components
    "q_identity_stitch" ->
      """WITH RECURSIVE u AS (
        |  SELECT user_id AS id, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1),
        |k AS (SELECT id, (id*7)%97 AS dev, (id*11)%89 AS em FROM u),
        |pd AS (SELECT a.id AS u, b.id AS v FROM k a JOIN k b
        |       ON a.dev = b.dev AND a.id <> b.id),
        |pe AS (SELECT a.id AS u, b.id AS v FROM k a JOIN k b
        |       ON a.em = b.em AND a.id <> b.id),
        |e AS (SELECT u, v FROM pd UNION SELECT u, v FROM pe),
        |walk(id, label) AS (
        |  SELECT id, id FROM u
        |  UNION
        |  SELECT e.v, w.label FROM walk w JOIN e ON e.u = w.id
        |  WHERE w.label < e.v),
        |lab AS (SELECT id, min(label) AS identity_id FROM walk GROUP BY id),
        |j AS (SELECT u.id, u.n_events, lab.identity_id
        |      FROM u JOIN lab USING (id)),
        |g AS (SELECT identity_id, CAST(count(*) AS BIGINT) AS n_members,
        |        CAST(sum(n_events) AS BIGINT) AS identity_events
        |      FROM j GROUP BY 1)
        |SELECT CAST(j.id AS VARCHAR) AS context_id, j.n_events,
        |  j.identity_id, g.n_members, g.identity_events
        |FROM j JOIN g USING (identity_id)""".stripMargin
  )
}
