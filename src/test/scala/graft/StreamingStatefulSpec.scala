package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.pipeline.CorpusSignals
import graft.streaming.{StreamingPipeline, StreamingSequence, StreamingSessions}

/** Stateful Structured Streaming operators: the flatMapGroupsWithState
  * funnel (streaming FOLLOWED BY) and watermark-bounded streaming curation
  * (dropDuplicatesWithinWatermark dedup). */
class StreamingStatefulSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("streaming funnel: first-touch completion, re-fire, equal-ts eid ordering") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "event_type", "timestamp", "event_id")
    val q = StreamingSequence.funnel(events, Seq("signup", "purchase"))
      .writeStream.outputMode("append").format("memory").queryName("funnel").start()

    // u1 completes; u2 has the purchase BEFORE the signup → no match
    mem.addData(("u1", "signup", 10L, 1L), ("u1", "purchase", 20L, 2L),
      ("u2", "purchase", 5L, 3L), ("u2", "signup", 8L, 4L))
    q.processAllAvailable()
    // u1 re-fires with later events (state reset after completion)
    mem.addData(("u1", "signup", 30L, 5L), ("u1", "purchase", 40L, 6L))
    q.processAllAvailable()
    // equal timestamps: ordered by event_id, so signup(eid 7) → purchase(eid 8)
    mem.addData(("u3", "signup", 50L, 7L), ("u3", "purchase", 50L, 8L))
    q.processAllAvailable()
    val rows = spark.table("funnel").collect()
      .map(r => (r.getAs[String]("link"), r.getAs[Seq[Long]]("stepTs"))).toSet
    q.stop()
    assert(rows == Set(
      ("u1", Seq(10L, 20L)), ("u1", Seq(30L, 40L)), ("u3", Seq(50L, 50L))))
  }

  test("streaming funnel: 3-step chain across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "event_type", "timestamp", "event_id")
    val q = StreamingSequence.funnel(events, Seq("view", "cart", "buy"))
      .writeStream.outputMode("append").format("memory").queryName("funnel3").start()

    mem.addData(("u1", "view", 10L, 1L))
    q.processAllAvailable()
    mem.addData(("u1", "cart", 20L, 2L)) // partial state carried between batches
    q.processAllAvailable()
    assert(spark.table("funnel3").isEmpty)
    mem.addData(("u1", "buy", 30L, 3L))
    q.processAllAvailable()
    val rows = spark.table("funnel3").collect()
      .map(r => (r.getAs[String]("link"), r.getAs[Seq[Long]]("stepTs")))
    q.stop()
    assert(rows.toSeq == Seq(("u1", Seq(10L, 20L, 30L))))
  }

  test("streaming exclusion funnel: veto carries across micro-batches, clean conversion stays clean") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "event_type", "timestamp", "event_id")
    val q = graft.streaming.StreamingExclusion.exclusionFunnel(
        events, "signup", "purchase", "error")
      .writeStream.outputMode("update").format("memory").queryName("fxl").start()

    // u1: signup then error in batch 1 — the pending C's key is recorded
    // but excluded stays FALSE while B is unseen (a context whose B never
    // arrives must not read as excluded — matches the batch operator)
    mem.addData(("u1", "signup", 10L, 1L), ("u1", "error", 15L, 2L),
      ("u2", "error", 5L, 3L), ("u2", "signup", 10L, 4L))
    q.processAllAvailable()
    val interim = spark.table("fxl").collect()
      .map(r => (r.getAs[String]("context_id"), r.getAs[Boolean]("excluded"),
        r.getAs[Boolean]("converted_clean"))).toSet
    assert(interim == Set(("u1", false, false), ("u2", false, false)))
    // batch 2: u1's purchase arrives AFTER the recorded error → now
    // excluded; u2 converts clean (its error was BEFORE the signup); a
    // late error after u2's purchase must not retro-veto
    mem.addData(("u1", "purchase", 30L, 5L), ("u2", "purchase", 20L, 6L),
      ("u2", "error", 40L, 7L))
    q.processAllAvailable()
    val rows = spark.table("fxl").collect()
      .map(r => (r.getAs[String]("context_id"), r.getAs[Boolean]("excluded"),
        r.getAs[Boolean]("converted_clean"))).toSet
    q.stop()
    // the veto recorded in batch 1 lands when B arrives; u2 stays clean
    assert(rows == Set(("u1", false, false), ("u1", true, false),
      ("u2", false, false), ("u2", false, true)))
  }

  test("streaming sessions: open session spans batches, closes by event or timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "timestamp", "event_id")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("e"))
      .withColumn("value", org.apache.spark.sql.functions.lit(0.0))
      .withColumn("props", org.apache.spark.sql.functions.lit(""))
    val q = StreamingSessions.sessions(events, gapSec = 100L,
      watermarkDelay = "0 seconds")
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("sess").start()

    mem.addData(("u", 1000L, 1L), ("u", 1050L, 2L))
    q.processAllAvailable()
    // session still open — nothing emitted
    assert(spark.table("sess").isEmpty)

    // next batch: an in-gap event EXTENDS the session across the batch
    // boundary, then a far event closes it and opens session 1
    mem.addData(("u", 1100L, 3L), ("u", 1500L, 4L))
    q.processAllAvailable()
    val closed = spark.table("sess").collect()
      .map(r => (r.getAs[String]("context_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("start_ts"), r.getAs[Long]("end_ts"), r.getAs[Long]("n_events")))
    assert(closed.toSeq == Seq(("u", 0L, 1000L, 1100L, 3L)))

    // a late-timestamped event from ANOTHER context pushes the watermark
    // past 1500 + gap → u's open session 1 times out and flushes
    mem.addData(("w", 2000L, 5L))
    q.processAllAvailable()
    mem.addData(("w", 2001L, 6L)) // one more batch so the new watermark applies
    q.processAllAvailable()
    val all = spark.table("sess").collect()
      .map(r => (r.getAs[String]("context_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("start_ts"), r.getAs[Long]("end_ts"), r.getAs[Long]("n_events")))
      .toSet
    q.stop()
    assert(all.contains(("u", 1L, 1500L, 1500L, 1L)),
      s"open session must flush via event-time timeout, got: $all")
  }

  test("streaming sessions: late in-watermark event lowers the open session's start_ts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "timestamp", "event_id")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("e"))
      .withColumn("value", org.apache.spark.sql.functions.lit(0.0))
      .withColumn("props", org.apache.spark.sql.functions.lit(""))
    val q = StreamingSessions.sessions(events, gapSec = 100L,
      watermarkDelay = "600 seconds")
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("sess_late").start()

    // batch 1 opens u's session at 2000; watermark after the batch = 1400
    mem.addData(("u", 2000L, 1L), ("x", 2000L, 99L))
    q.processAllAvailable()
    // batch 2: ts 1900 is LATE but within the watermark (1900 >= 1400) — it
    // must extend the session BACKWARD (start 2000 → 1900), then 2500 closes
    // it (gap 100 exceeded)
    mem.addData(("u", 1900L, 2L), ("u", 2500L, 3L))
    q.processAllAvailable()
    val rows = spark.table("sess_late").collect()
      .map(r => (r.getAs[String]("context_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("start_ts"), r.getAs[Long]("end_ts"),
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_s")))
    q.stop()
    assert(rows.toSeq == Seq(("u", 0L, 1900L, 2000L, 2L, 100L)),
      s"late event must lower start_ts, got: ${rows.toSeq}")
  }

  test("streaming funnel: abandoned partial state is dropped by the event-time timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "event_type", "timestamp", "event_id")
    val q = StreamingSequence.funnel(events, Seq("signup", "purchase"),
      watermarkDelay = "10 minutes", horizonMs = 1000L)
      .writeStream.outputMode("append").format("memory").queryName("funneltmo").start()

    mem.addData(("u4", "signup", 100L, 1L)) // partial funnel
    q.processAllAvailable()
    // advance the watermark far past signup+horizon. NB the filler must be a
    // funnel STEP: Catalyst pushes the side filter below the watermark node,
    // so only step events advance the watermark (documented caveat)
    mem.addData(("w", "signup", 10000L, 2L))
    q.processAllAvailable()
    mem.addData(("w", "signup", 10001L, 3L)) // batch where u4's timeout fires
    q.processAllAvailable()
    // state gone: a purchase alone must NOT complete the funnel
    mem.addData(("u4", "purchase", 10002L, 4L))
    q.processAllAvailable()
    val n = spark.table("funneltmo").count()
    q.stop()
    assert(n == 0)
  }

  test("streaming curation: lang/quality filters and watermark-bounded dedup") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val good = ("the quick brown fox jumps over the lazy dog and it is that for " * 4).trim
    val spanish = "el la de y que los en un una es " * 5
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF.toDF("doc_id", "text", "ts")
    val q = StreamingPipeline.curateStream(stream, "doc_id", "text", "ts")
      .writeStream.outputMode("append").format("memory").queryName("curated").start()

    mem.addData((1L, good, 100L), (2L, "x", 101L), (3L, spanish, 102L))
    q.processAllAvailable()
    mem.addData((4L, good, 103L)) // exact duplicate of doc 1 within the watermark
    q.processAllAvailable()
    val ids = spark.table("curated").collect().map(_.getAs[Long]("doc_id")).toSet
    q.stop()
    // doc 2 fails quality, doc 3 fails language, doc 4 is a duplicate
    assert(ids == Set(1L))
  }

  test("streaming scoring: frozen DSIR weights give the batch decisions") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Seq(
      (1L, "aa bb aa bb aa bb", "t"), (2L, "cc dd ee ff", "u"),
      (3L, "cc dd cc dd", "u"), (4L, "gg hh aa bb", "t"))
      .toDF("doc_id", "text", "source")
    val weights = CorpusSignals.importanceWeights(
      corpus, "doc_id", "text", col("source") === "t", buckets = 64)
    // the batch chain on the SAME corpus is the ground truth
    val batch = CorpusSignals.importanceResample(
        CorpusSignals.importanceScore(corpus, "doc_id", "text",
          col("source") === "t", buckets = 64),
        "id", "dsir_score", basePpm = 500000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val mem = MemoryStream[(Long, String, Long)]
    val q = StreamingPipeline.scoreStream(mem.toDF.toDF("doc_id", "text", "ts"),
        weights, "doc_id", "text", "ts", basePpm = 500000L, buckets = 64,
        dedupWithinWatermark = false) // complete mode hosts one stateful op
      .writeStream.outputMode("complete").format("memory").queryName("scored").start()
    mem.addData((1L, "aa bb aa bb aa bb", 100L), (2L, "cc dd ee ff", 101L))
    q.processAllAvailable()
    mem.addData((3L, "cc dd cc dd", 7300L), (4L, "gg hh aa bb", 7301L)) // later window
    q.processAllAvailable()
    val got = spark.table("scored").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    q.stop()
    assert(got == batch)
  }

  test("streaming scoring: redelivered documents decide once within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Seq((1L, "aa bb aa bb", "t"), (2L, "cc dd ee", "u"))
      .toDF("doc_id", "text", "source")
    val weights = CorpusSignals.importanceWeights(
      corpus, "doc_id", "text", col("source") === "t", buckets = 64)
    val expected = CorpusSignals.importanceResample(
        CorpusSignals.importanceScore(corpus, "doc_id", "text",
          col("source") === "t", buckets = 64),
        "id", "dsir_score", basePpm = 500000L)
      .filter(col("id") === 1L).collect().head
    val mem = MemoryStream[(Long, String, Long)]
    // append mode + the dedup guard (default): copies inside the watermark
    // horizon must not double the feature sums or emit twice
    val q = StreamingPipeline.scoreStream(mem.toDF.toDF("doc_id", "text", "ts"),
        weights, "doc_id", "text", "ts", basePpm = 500000L, buckets = 64)
      .writeStream.outputMode("append").format("memory").queryName("once").start()
    mem.addData((1L, "aa bb aa bb", 100L), (1L, "aa bb aa bb", 101L))
    q.processAllAvailable()
    mem.addData((1L, "aa bb aa bb", 200L)) // redelivery, same window
    q.processAllAvailable()
    mem.addData((9L, "zz", 100000L)) // advances the watermark; flushes the window
    q.processAllAvailable()
    val rows = spark.table("once").filter(col("id") === 1L).collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == expected.getLong(1)) // single, batch-equal score
    assert(rows.head.getBoolean(3) == expected.getBoolean(3))
  }

  test("streaming admission: corpus keys, min-id in batch, state across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val inCorpus = "this exact text already lives in the corpus today"
    val novel = "a brand new paragraph nobody has stored before anywhere"
    val other = "another fresh document with its own distinct content entirely"
    val corpusKeys = Seq(inCorpus).toDF("text")
      .select(graft.pipeline.Dedup.contentKey($"text").as("ck"))
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF.toDF("doc_id", "text", "ts")
    val q = StreamingPipeline
      .admitStream(stream, corpusKeys, "doc_id", "text", "ts")
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("admitted").start()

    // batch 1: corpus dup (norm-insensitive), novel key held by min id 2 of {2,5}
    mem.addData((1L, inCorpus.toUpperCase, 100L), (2L, novel, 101L), (5L, novel, 102L))
    q.processAllAvailable()
    // batch 2: same key again (state says admitted), plus a new novel key
    mem.addData((7L, novel, 103L), (8L, other, 104L))
    q.processAllAvailable()
    val out = spark.table("admitted").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    q.stop()
    assert(out == Map(
      1L -> "dup_exact_corpus",
      2L -> "admitted", 5L -> "dup_exact_batch",
      7L -> "dup_exact_batch", // blocked by batch-1 state
      8L -> "admitted"))
  }

  test("streaming first touch: one row per context at first arrival, later events silent") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "timestamp", "event_id")
    val q = StreamingSessions.firstTouch(events).toDF()
      .writeStream.outputMode("append").format("memory").queryName("ftouch").start()
    // batch 1: u arrives twice (equal ts → eid breaks the tie), v once
    mem.addData(("u", 100L, 2L), ("u", 100L, 1L), ("v", 50L, 3L))
    q.processAllAvailable()
    // batch 2: u again (silent — already seen, even with an EARLIER ts),
    // w for the first time
    mem.addData(("u", 10L, 4L), ("w", 200L, 5L))
    q.processAllAvailable()
    val out = spark.table("ftouch").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    q.stop()
    assert(out == Map("u" -> ((100L, 1L)), "v" -> ((50L, 3L)), "w" -> ((200L, 5L))))
  }

  test("streaming audio admission: trimmed re-uploads matched per batch, malformed dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.pipeline.Multimodal
    def wavOf(id: Long, n: Int, start: Int): Array[Byte] =
      Seq(id).toDF("id")
        .select(Multimodal.syntheticWalshWav(col("id"), n, 16000, start).as("b"))
        .head().getAs[Array[Byte]](0)
    val corpusFps = Multimodal.audioLocalFingerprints(
      Seq(10L, 11L).toDF("id")
        .select(col("id").as("media_id"),
          Multimodal.syntheticWalshWav(col("id"), 320, 16000).as("bytes")), 64, 2)
    val mem = MemoryStream[(Long, Array[Byte])]
    val stream = mem.toDF.toDF("media_id", "bytes")
    val (decisions, cache) = StreamingPipeline.admitAudioStreamCached(
      stream, corpusFps, minVotes = 2L)
    val q = decisions.toDF()
      .writeStream.outputMode("append").format("memory").queryName("audioadm").start()
    // batch 1: a one-frame trim of corpus track 10 under a fresh id, plus
    // a genuinely novel track
    mem.addData((100L, wavOf(10L, 192, 64)), (77L, wavOf(77L, 192, 64)))
    q.processAllAvailable()
    // batch 2: ANOTHER trim of track 10 (decisions are per-batch — no
    // cross-batch suppression), plus a malformed blob (no decision row)
    mem.addData((200L, wavOf(10L, 192, 64)), (300L, "not a wav".getBytes))
    q.processAllAvailable()
    val out = spark.table("audioadm").collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("status"), r.getAs[Long]("matched_id"),
          r.getAs[Long]("offset_frames"), r.getAs[Long]("votes")))).toMap
    q.stop(); cache.unpersist(blocking = false)
    assert(out == Map(
      100L -> (("dup_audio_corpus", 10L, 1L, 3L)),
      77L -> (("admitted", -1L, 0L, 0L)),
      200L -> (("dup_audio_corpus", 10L, 1L, 3L))))
  }

  test("streaming near-dup admission: frozen artifacts, exact + near statuses, no state for near losers") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val nearDup = base.replace("runs", "walks")
    val novel = "a brand new paragraph nobody has stored before anywhere in this corpus"
    val art = graft.pipeline.Dedup
      .buildDedupArtifacts(Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text")
      .materialize()
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF.toDF("doc_id", "text", "ts")
    val q = StreamingPipeline
      .admitStreamNear(stream, art, "doc_id", "text", "ts")
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("admit_near").start()

    // batch 1: exact corpus dup, near-dup vs corpus, novel ×2 (min id wins)
    mem.addData((1L, base.toUpperCase, 100L), (2L, nearDup, 101L),
      (3L, novel, 102L), (4L, novel, 103L))
    q.processAllAvailable()
    // batch 2: novel again (admitted state blocks), near-dup again — the
    // near loser left NO state, so it re-evaluates against the frozen
    // artifacts and is near_dup_corpus again, not dup_exact_batch
    mem.addData((7L, novel, 104L), (8L, nearDup, 105L))
    q.processAllAvailable()
    val out = spark.table("admit_near").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    q.stop()
    assert(out == Map(
      1L -> "dup_exact_corpus",
      2L -> "near_dup_corpus",
      3L -> "admitted", 4L -> "dup_exact_batch",
      7L -> "dup_exact_batch",
      8L -> "near_dup_corpus"))
  }

  test("streaming near-dup admission: LIVE (lineage-shared) artifacts take the " +
      "single-tokenize static-side path and decide identically to at-rest artifacts") {
    // the r19 shared-base optimization: framesAtRest = false artifacts make
    // admitStreamNear persist ONE combined (cid, ck, sh) projection and
    // derive the key set + band table from it — this pins that branch's
    // decisions against the materialized (at-rest) branch the sibling test
    // covers, over the same corpus/stream fixture
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val nearDup = base.replace("runs", "walks")
    val novel = "a brand new paragraph nobody has stored before anywhere in this corpus"
    val art = graft.pipeline.Dedup
      .buildDedupArtifacts(Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text")
    assert(!art.framesAtRest, "in-memory builder artifacts must be lineage-shared")
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF.toDF("doc_id", "text", "ts")
    val q = StreamingPipeline
      .admitStreamNear(stream, art, "doc_id", "text", "ts")
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("admit_near_live").start()
    mem.addData((1L, base.toUpperCase, 100L), (2L, nearDup, 101L),
      (3L, novel, 102L), (4L, novel, 103L))
    q.processAllAvailable()
    mem.addData((7L, novel, 104L), (8L, nearDup, 105L))
    q.processAllAvailable()
    val out = spark.table("admit_near_live").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    q.stop()
    graft.pipeline.Projections.release()
    assert(out == Map(
      1L -> "dup_exact_corpus",
      2L -> "near_dup_corpus",
      3L -> "admitted", 4L -> "dup_exact_batch",
      7L -> "dup_exact_batch",
      8L -> "near_dup_corpus"))
  }

  test("streaming anomaly: later-day closure across batches scores spikes and zero gap days") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val events = mem.toDF.toDF("event_type", "timestamp")
    val q = graft.streaming.StreamingAnomaly
      .anomalies(events, windowDays = 2, thresholdPpm = 500000L).toDF()
      .writeStream.outputMode("append").format("memory").queryName("anom").start()

    def day(d: Long, n: Int): Seq[(String, Long)] =
      (0 until n).map(i => ("a", d * 86400L + i))
    // batch 1: day0 ×2, day1 ×1, day2 ×5 — day2 stays open, nothing scored
    // yet (day0/day1 are warmup)
    mem.addData(day(0, 2) ++ day(1, 1) ++ day(2, 5): _*)
    q.processAllAvailable()
    assert(spark.table("anom").count() == 0, "open/warmup days must not be scored")
    // batch 2: one event at day5 closes day2 (spike) and the zero days 3, 4
    mem.addData(day(5, 1): _*)
    q.processAllAvailable()
    val rows = spark.table("anom").collect()
      .map(r => (r.getAs[Long]("day_start") / 86400, r.getAs[Long]("cnt"),
        r.getAs[Long]("trail_total"), r.getAs[Long]("dev_ppm"))).toSet
    q.stop()
    assert(rows == Set(
      (2L, 5L, 3L, 2333333L),   // (5*2-3)/3 = +2.33
      (3L, 0L, 6L, -1000000L),  // zero gap day vs trail {d1:1, d2:5}
      (4L, 0L, 5L, -1000000L)), // zero gap day vs trail {d2:5, d3:0}
      s"got $rows")
  }

  test("streaming KMV sketch: batching-invariant state, bounded, re-emits refreshed estimates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val events = mem.toDF.toDF("grp", "v")
    val q = graft.streaming.StreamingSketches
      .kmvDistinct(events, "grp", col("v"), k = 8).toDF()
      .writeStream.outputMode("update").format("memory").queryName("kmv").start()

    // batch 1: 5 distinct values (below k → exact), duplicates ignored
    mem.addData(("a", "v1"), ("a", "v2"), ("a", "v3"), ("a", "v1"), ("a", "v4"), ("a", "v5"))
    q.processAllAvailable()
    // batch 2: 7 more distinct → 12 total, sketch saturates at k=8
    mem.addData((6 to 12).map(i => ("a", s"v$i")): _*)
    q.processAllAvailable()
    val rows = spark.table("kmv").collect()
      .map(r => (r.getAs[Long]("sketch_size"), r.getAs[Long]("est_distinct")))
    q.stop()
    assert(rows.length == 2, "one refreshed estimate per touched batch")
    assert(rows(0) == ((5L, 5L)), "below-k sketch is exact")
    assert(rows(1)._1 == 8L, "state bounded at k")

    // the final estimate must equal a single-batch (batch-operator) run of
    // the same 12-value set: the sketch is a pure set function
    val batchEst = graft.pipeline.Sketches.kmvDistinct(
      (1 to 12).map(i => ("a", s"v$i")).toDF("grp", "v"), "grp", col("v"), 8)
      .head.getAs[Long]("est_distinct")
    assert(rows(1)._2 == batchEst, "streaming estimate == batch estimate")
  }

  test("stream-stream window join: cross-batch match, inclusive bounds, window cut-off") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lMem = MemoryStream[(String, Long, Long)]
    val rMem = MemoryStream[(String, Long, Long)]
    val cols = Seq("context_id", "timestamp", "event_id")
    val joined = graft.streaming.StreamingJoins.windowJoin(
      lMem.toDF.toDF(cols: _*), rMem.toDF.toDF(cols: _*),
      "context_id", "timestamp", "event_id", windowSec = 100L,
      watermarkDelay = "10 seconds")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("sjoin").start()

    // batch 1: left rows only — no matches yet, state held
    lMem.addData(("u", 1000L, 1L), ("u", 2000L, 2L), ("v", 1000L, 3L))
    q.processAllAvailable()
    assert(spark.table("sjoin").count() == 0)
    // batch 2: right rows — u@1100 matches left u@1000 (boundary, inclusive)
    // from the PREVIOUS batch; u@2101 is 101s after left u@2000 → no match;
    // w has no left side at all
    rMem.addData(("u", 1100L, 10L), ("u", 2101L, 11L), ("w", 1000L, 12L))
    q.processAllAvailable()
    val rows = spark.table("sjoin").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("left_id"),
        r.getAs[Long]("right_id"))).toSet
    q.stop()
    assert(rows == Set(("u", 1L, 10L)))
  }

  test("stream-stream LEFT OUTER join: null row only after the watermark closes the window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lMem = MemoryStream[(String, Long, Long)]
    val rMem = MemoryStream[(String, Long, Long)]
    val cols = Seq("context_id", "timestamp", "event_id")
    val joined = graft.streaming.StreamingJoins.windowJoin(
      lMem.toDF.toDF(cols: _*), rMem.toDF.toDF(cols: _*),
      "context_id", "timestamp", "event_id", windowSec = 100L,
      watermarkDelay = "10 seconds", joinType = "left_outer")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("sjoin_outer").start()

    // batch 1: one matched pair and one unmatched left
    lMem.addData(("u", 1000L, 1L), ("v", 1000L, 2L))
    rMem.addData(("u", 1050L, 10L))
    q.processAllAvailable()
    val afterB1 = spark.table("sjoin_outer").collect()
      .map(r => (r.getAs[Long]("left_id"), Option(r.get(3)))).toSet
    // v@1000 is unmatched but its window [1000,1100] is NOT below the
    // watermark (1050-10) yet → held, no null row
    assert(afterB1 == Set((1L, Some(10L))))
    // batch 2: far-future rows on BOTH sides push the global watermark
    // past 1100 → v's null row flushes
    lMem.addData(("z", 5000L, 3L)); rMem.addData(("z", 9000L, 11L))
    q.processAllAvailable()
    // one more batch so the eviction-then-emit cycle definitely runs
    lMem.addData(("z2", 6000L, 4L)); rMem.addData(("z2", 9500L, 12L))
    q.processAllAvailable()
    val rows = spark.table("sjoin_outer").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("left_id"),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    q.stop()
    assert(rows.contains(("v", 2L, None)), s"unmatched left must flush: $rows")
    assert(rows.contains(("u", 1L, Some(10L))))
  }

  test("streaming funnel: repeated step type (A FOLLOWED BY A) completes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "event_type", "timestamp", "event_id")
    val q = StreamingSequence.funnel(events, Seq("click", "click"))
      .writeStream.outputMode("append").format("memory").queryName("funnel_rep").start()
    // two clicks complete; a single click (u2) stays partial; one event
    // must never fill both steps (u3's lone click at equal ts)
    mem.addData(("u1", "click", 10L, 1L), ("u1", "click", 20L, 2L),
      ("u2", "click", 30L, 3L))
    q.processAllAvailable()
    val rows = spark.table("funnel_rep").collect()
      .map(r => (r.getAs[String]("link"), r.getAs[Seq[Long]]("stepTs"))).toSet
    q.stop()
    assert(rows == Set(("u1", Seq(10L, 20L))),
      s"repeated-step funnel must complete exactly once for u1: $rows")
  }

  test("streaming sessions: numbering continues after a timeout-closed session") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "timestamp", "event_id")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("e"))
    val q = StreamingSessions.sessions(events, gapSec = 100L,
      watermarkDelay = "0 seconds")
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("sess_num").start()
    mem.addData(("u", 1000L, 1L))
    q.processAllAvailable()
    // another context pushes the watermark past 1000+gap → u's session 0
    // closes by TIMEOUT (the path that used to drop the counter)
    mem.addData(("w", 5000L, 2L))
    q.processAllAvailable()
    mem.addData(("w", 5001L, 3L))
    q.processAllAvailable()
    // u re-appears: must be session 1, not a duplicate (u, 0) key
    mem.addData(("u", 6000L, 4L))
    q.processAllAvailable()
    mem.addData(("u", 7000L, 5L)) // closes u's second session in-line
    q.processAllAvailable()
    val rows = spark.table("sess_num").collect()
      .map(r => (r.getAs[String]("context_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("start_ts"))).toSet
    q.stop()
    assert(rows.contains(("u", 0L, 1000L)) && rows.contains(("u", 1L, 6000L)),
      s"session numbering must survive a timeout close: $rows")
    assert(rows.count(_._1 == "u") == rows.filter(_._1 == "u").map(_._2).size,
      s"duplicate (context, session_idx) keys: $rows")
  }

  test("streaming sessions: tombstone TTL evicts numbering state (opt-in trade)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "timestamp", "event_id")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("e"))
    val q = StreamingSessions.sessions(events, gapSec = 100L,
      watermarkDelay = "0 seconds", tombstoneTtlSec = 500L)
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("sess_ttl").start()
    mem.addData(("u", 1000L, 1L))
    q.processAllAvailable()
    // w pushes the watermark past 1000+gap → u's session 0 closes by
    // timeout; its tombstone is armed to evict at watermark + 500 s
    mem.addData(("w", 2000L, 2L))
    q.processAllAvailable()
    mem.addData(("w", 2001L, 3L))
    q.processAllAvailable()
    // watermark sails past the tombstone's TTL → the numbering state evicts
    mem.addData(("w", 4000L, 4L))
    q.processAllAvailable()
    mem.addData(("w", 4001L, 5L))
    q.processAllAvailable()
    // u returns AFTER the TTL: numbering restarts at 0 — the documented
    // duplicate-key trade the TTL buys bounded state with
    mem.addData(("u", 5000L, 6L))
    q.processAllAvailable()
    mem.addData(("w", 6000L, 7L))
    q.processAllAvailable()
    mem.addData(("w", 6001L, 8L))
    q.processAllAvailable()
    val uRows = spark.table("sess_ttl").collect()
      .filter(_.getAs[String]("context_id") == "u")
      .map(r => (r.getAs[Long]("session_idx"), r.getAs[Long]("start_ts"))).toSet
    q.stop()
    assert(uRows == Set((0L, 1000L), (0L, 5000L)),
      s"post-TTL return must restart numbering at 0 (state evicted): $uRows")
  }

  test("streaming anomaly: a far-future corrupt day fast-forwards instead of spinning") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val events = mem.toDF.toDF("event_type", "timestamp")
    val q = graft.streaming.StreamingAnomaly.anomalies(events, windowDays = 3,
      thresholdPpm = 0L)
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("anom_ff").start()
    // four steady days, then an event whose ts is epoch-MILLIS garbage
    // (day ~19.7M) — the close must be O(windowDays), not O(gap)
    mem.addData((1L to 4L).map(d => ("t", d * 86400L + 10L)): _*)
    q.processAllAvailable()
    val t0 = System.nanoTime()
    mem.addData(("t", 1700000000000L)) // ~epoch-millis in a seconds field
    q.processAllAvailable()
    val closeSec = (System.nanoTime() - t0) / 1e9
    val rows = spark.table("anom_ff").collect()
      .map(r => (r.getAs[Long]("day_start") / 86400L, r.getAs[Long]("cnt")))
    q.stop()
    assert(closeSec < 30.0, f"far-future close took $closeSec%.1f s — gap loop not bounded")
    // day 4 (count 1 vs trailing 3 ones) scores at dev 0; the crater days
    // right after day 4 score too; days beyond the zero window emit nothing
    assert(rows.exists(_._1 == 4L), s"day 4 must score when closed: ${rows.toSeq}")
    assert(rows.forall(_._1 < 12L), s"days beyond the zero window must not emit: ${rows.toSeq}")
  }

  test("streaming exclusion funnel rejects a non-positive horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val events = mem.toDF.toDF("context_id", "event_type", "timestamp", "event_id")
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingExclusion.exclusionFunnel(events, "a", "b", "c",
        horizonMs = 0L)
    }
  }
}
