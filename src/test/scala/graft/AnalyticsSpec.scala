package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // ---- sessionization ----

  private def sess(rows: Seq[(String, Long, Long)], gap: Long) =
    EventAnalytics.sessionize(rows.toDF("context_id", "timestamp", "event_id"),
      "context_id", "timestamp", "event_id", gap)
      .collect()
      .map(r => (r.getAs[String]("context_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("start_ts"), r.getAs[Long]("end_ts"), r.getAs[Long]("n_events")))
      .toSet

  test("sessionize splits on gap strictly greater than gapSec") {
    val out = sess(Seq(
      ("u", 100L, 1L), ("u", 200L, 2L), // gap 100 == gapSec → same session
      ("u", 301L, 3L),                  // gap 101 > 100 → new session
      ("v", 50L, 4L)), gap = 100L)
    assert(out == Set(
      ("u", 0L, 100L, 200L, 2L),
      ("u", 1L, 301L, 301L, 1L),
      ("v", 0L, 50L, 50L, 1L)))
  }

  test("sessionize orders ties by event_id and never crosses contexts") {
    val out = sess(Seq(
      ("u", 100L, 2L), ("u", 100L, 1L), // same ts: ordered by id, one session
      ("w", 100L, 3L)), gap = 10L)
    assert(out == Set(("u", 0L, 100L, 100L, 2L), ("w", 0L, 100L, 100L, 1L)))
  }

  // ---- session funnel ----

  test("sessionFunnel: first-touch within session, cross-session steps never convert") {
    val events = Seq(
      // session 0 of u: signup then purchase → converted
      ("u", 100L, 1L, "signup"), ("u", 150L, 2L, "purchase"),
      // session 1 of u: purchase BEFORE signup → unconverted
      ("u", 1000L, 3L, "purchase"), ("u", 1010L, 4L, "signup"),
      // v: signup in session 0, purchase in session 1 → neither converts
      ("v", 100L, 5L, "signup"), ("v", 1000L, 6L, "purchase")
    ).toDF("context_id", "timestamp", "event_id", "event_type")
    val out = EventAnalytics.sessionFunnel(events,
      "context_id", "timestamp", "event_id", "event_type",
      gapSec = 100L, stepA = "signup", stepB = "purchase")
      .collect()
      .map(r => ((r.getAs[String]("context_id"), r.getAs[Long]("session_idx")),
        (r.getAs[Long]("n_events"), Option(r.getAs[Any]("a_ts")),
          Option(r.getAs[Any]("b_ts")), r.getAs[Boolean]("converted"))))
      .toMap
    assert(out(("u", 0L)) == ((2L, Some(100L), Some(150L), true)))
    assert(out(("u", 1L)) == ((2L, Some(1010L), None, false)))
    assert(out(("v", 0L)) == ((1L, Some(100L), None, false)))
    assert(out(("v", 1L)) == ((1L, None, None, false)))
  }

  test("trimmedMeans: the whale is trimmed out, winsorized sits between") {
    // 400 unit-value events + one 1000.0 whale: both arms' 10%-trimmed
    // means must be exactly 1000 milli; the whale's arm's plain mean is
    // inflated and its winsorized mean clamps back to 1000
    val rows = (0 until 400).map(i => (s"u$i", 1.0)) :+ (("whale", 1000.0))
    val out = EventAnalytics.trimmedMeans(
      rows.toDF("context_id", "value"), "context_id", "value").collect().head
    assert(out.getAs[Long]("trimmed_a_milli") == 1000L)
    assert(out.getAs[Long]("trimmed_b_milli") == 1000L)
    assert(out.getAs[Long]("trimmed_diff_milli") == 0L)
    assert(out.getAs[Long]("winsor_a_milli") == 1000L)
    assert(out.getAs[Long]("winsor_b_milli") == 1000L)
    assert(math.max(out.getAs[Long]("mean_a_milli"),
      out.getAs[Long]("mean_b_milli")) > 1000L)
    assert(out.getAs[Long]("n_a") + out.getAs[Long]("n_b") == 401L)
  }

  test("trimmedMeans with trimPct=0 degrades to the plain mean") {
    val rows = (0 until 50).map(i => (s"u$i", (i % 7).toDouble))
    val out = EventAnalytics.trimmedMeans(
      rows.toDF("context_id", "value"), "context_id", "value",
      trimPct = 0).collect().head
    assert(out.getAs[Long]("trimmed_a_milli") == out.getAs[Long]("mean_a_milli"))
    assert(out.getAs[Long]("winsor_a_milli") == out.getAs[Long]("mean_a_milli"))
    assert(out.getAs[Long]("trimmed_b_milli") == out.getAs[Long]("mean_b_milli"))
    assert(out.getAs[Long]("winsor_b_milli") == out.getAs[Long]("mean_b_milli"))
  }

  private def cusumOf(counts: Seq[Int], typ: String = "a") = {
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)((typ, d.toLong * 86400L)) }
    EventAnalytics.cusumChangepoint(
      rows.toDF("event_type", "timestamp"),
      "event_type", "timestamp", burnDays = 10, slackPct = 10, threshPct = 400)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("base_milli"), Option(r.getAs[Any]("cp_day")),
        Option(r.getAs[String]("direction")))).toList
  }

  test("asOf forward: earliest dim at or after the fact, tolerance bounds the gap") {
    val facts = Seq(("u", 100L, 1L), ("u", 205L, 2L), ("u", 400L, 3L))
      .toDF("context_id", "timestamp", "fid")
    val dims = Seq(("u", 100L, "a"), ("u", 200L, "b"), ("u", 210L, "c"))
      .toDF("context_id", "timestamp", "tag")
    val out = AsOfJoin.asOf(facts, dims, "context_id", "timestamp", "timestamp",
      dimPrefix = "nx_", toleranceSec = Some(50L), forward = true)
      .collect().map(r => r.getAs[Long]("fid") ->
        ((Option(r.getAs[Any]("nx_timestamp")), Option(r.getAs[String]("nx_tag")))))
      .toMap
    assert(out(1L) == ((Some(100L), Some("a")))) // equal ts matches
    assert(out(2L) == ((Some(210L), Some("c")))) // next at-or-after, within 50
    assert(out(3L) == ((None, None)))            // nothing after
  }

  test("voiceActivity: hangover bridges single-frame gaps, minFrames drops clicks") {
    // id 0 over 6 frames: silent at g ∈ {0, 3} → active {1,2} and {4,5}
    val media = Seq(0L).toDF("media_id").select(col("media_id"),
      Multimodal.syntheticGatedWav(col("media_id"), 384, 16000).as("bytes"))
    def segs(gap: Int, min: Int) =
      Multimodal.voiceActivity(media, 64, 1000L, gap, min)
        .select("seg_idx", "start_frame", "end_frame", "n_active", "span_frames")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(segs(0, 1) == Set((0L, 1L, 2L, 2L, 2L), (1L, 4L, 5L, 2L, 2L)))
    // one inactive frame bridged: a single 1..5 segment, 4 active of 5
    assert(segs(1, 1) == Set((0L, 1L, 5L, 4L, 5L)))
    // both raw segments are 2 frames: minFrames = 3 drops everything
    assert(segs(0, 3) == Set.empty)
  }

  test("dailyAutocorrelation: alternating series is anti-correlated at odd lags, null on constants") {
    def evOf(counts: Seq[Int], typ: String) = counts.zipWithIndex.flatMap {
      case (c, d) => Seq.fill(c)((typ, d.toLong * 86400L)) }
    // period-2 series, n=10: r1 = −(n−1)/n = −900000 ppm, r7 = −3/10
    val rows = evOf((0 until 10).map(d => if (d % 2 == 0) 10 else 20), "alt") ++
      evOf(Seq.fill(10)(5), "flat")
    val out = EventAnalytics.dailyAutocorrelation(
      rows.toDF("event_type", "timestamp"), "event_type", "timestamp")
      .collect().map(r => r.getAs[String]("event_type") ->
        ((Option(r.getAs[Any]("r1_ppm")), Option(r.getAs[Any]("r7_ppm"))))).toMap
    assert(out("alt") == ((Some(-900000L), Some(-300000L))))
    assert(out("flat") == ((None, None)))
  }

  test("cusumChangepoint flags an upward step a few days after it happens") {
    // 10/day for 80 days then 30/day: drift 19k milli/day crosses the
    // 40k threshold on the third shifted day (19k, 38k, 57k)
    val out = cusumOf(Seq.fill(80)(10) ++ Seq.fill(20)(30))
    assert(out == List(("a", 10000L, Some(82L), Some("up"))))
  }

  test("cusumChangepoint flags a downward step and stays quiet on steady series") {
    // drop 10/day → 2/day at day 80: drift 7k/day crosses 40k on day 85
    val down = cusumOf(Seq.fill(80)(10) ++ Seq.fill(20)(2))
    assert(down == List(("a", 10000L, Some(85L), Some("down"))))
    // steady series with ±1 jitter inside the slack: no changepoint
    val steady = cusumOf((0 until 100).map(d => 10 + (d % 2)))
    assert(steady == List(("a", 10500L, None, None)))
  }

  test("cusumChangepoint drops types with fewer than burn-in days") {
    assert(cusumOf(Seq.fill(10)(10)) == Nil)
  }

  test("funnelExclusion: C strictly between first A and first B vetoes; outside C does not") {
    val events = Seq(
      // u: signup, error BETWEEN, purchase → excluded, not clean
      ("u", 100L, 1L, "signup"), ("u", 150L, 2L, "error"), ("u", 200L, 3L, "purchase"),
      // v: error BEFORE signup and AFTER purchase → clean conversion
      ("v", 50L, 4L, "error"), ("v", 100L, 5L, "signup"),
      ("v", 200L, 6L, "purchase"), ("v", 300L, 7L, "error"),
      // w: purchase before signup only → reached A, no B
      ("w", 100L, 8L, "purchase"), ("w", 200L, 9L, "signup"),
      // x: no signup at all
      ("x", 100L, 10L, "purchase")
    ).toDF("context_id", "timestamp", "event_id", "event_type")
    val out = EventAnalytics.funnelExclusion(events,
      "context_id", "timestamp", "event_id", "event_type",
      stepA = "signup", stepB = "purchase", excludeC = "error")
      .collect()
      .map(r => r.getAs[String]("context_id") ->
        ((Option(r.getAs[Any]("a_ts")), Option(r.getAs[Any]("b_ts")),
          r.getAs[Boolean]("excluded"), r.getAs[Boolean]("converted_clean"))))
      .toMap
    assert(out("u") == ((Some(100L), Some(200L), true, false)))
    assert(out("v") == ((Some(100L), Some(200L), false, true)))
    assert(out("w") == ((Some(200L), None, false, false)))
    assert(out("x") == ((None, None, false, false)))
  }

  test("funnelExclusion: same-timestamp ties break by event id") {
    // error shares ts with the purchase but has a SMALLER id → it is
    // strictly between in (ts, id) order and vetoes
    val events = Seq(
      ("u", 100L, 1L, "signup"), ("u", 200L, 2L, "error"), ("u", 200L, 3L, "purchase")
    ).toDF("context_id", "timestamp", "event_id", "event_type")
    val out = EventAnalytics.funnelExclusion(events,
      "context_id", "timestamp", "event_id", "event_type",
      "signup", "purchase", "error").collect().head
    assert(out.getAs[Boolean]("excluded"))
    assert(!out.getAs[Boolean]("converted_clean"))
  }

  test("sessionFunnelK: greedy first-touch chain, out-of-order steps skipped, repeats allowed") {
    val events = Seq(
      // u session 0: full a→b→c chain, with an early c (eid 1) that must
      // NOT satisfy step 3 (it precedes the matched b) and a later c that does
      ("u", 90L, 1L, "c"), ("u", 100L, 2L, "a"), ("u", 110L, 3L, "b"),
      ("u", 120L, 4L, "c"),
      // u session 1: a then c but no b → stops at 1 step
      ("u", 1000L, 5L, "a"), ("u", 1010L, 6L, "c"),
      // v: b before a — only the a (and the later b) count, no c
      ("v", 100L, 7L, "b"), ("v", 110L, 8L, "a"), ("v", 120L, 9L, "b")
    ).toDF("context_id", "timestamp", "event_id", "event_type")
    val out = EventAnalytics.sessionFunnelK(events,
      "context_id", "timestamp", "event_id", "event_type",
      gapSec = 100L, steps = Seq("a", "b", "c"))
      .collect()
      .map(r => ((r.getAs[String]("context_id"), r.getAs[Long]("session_idx")),
        (r.getAs[scala.collection.Seq[Long]]("step_ts").toSeq, r.getAs[Long]("steps_done"),
          r.getAs[Boolean]("converted"))))
      .toMap
    assert(out(("u", 0L)) == ((Seq(100L, 110L, 120L), 3L, true)))
    assert(out(("u", 1L)) == ((Seq(1000L), 1L, false)))
    assert(out(("v", 0L)) == ((Seq(110L, 120L), 2L, false)))

    // repeated step types: the chain needs two distinct 'a's in order
    val rep = EventAnalytics.sessionFunnelK(
      Seq(("w", 10L, 1L, "a"), ("w", 20L, 2L, "a"), ("w", 30L, 3L, "x"))
        .toDF("context_id", "timestamp", "event_id", "event_type"),
      "context_id", "timestamp", "event_id", "event_type",
      gapSec = 100L, steps = Seq("a", "a"))
      .collect().head
    assert(rep.getAs[scala.collection.Seq[Long]]("step_ts").toSeq == Seq(10L, 20L) &&
      rep.getAs[Boolean]("converted"))
  }

  // ---- retention ----

  test("retention cohorts count users at each week offset from first activity") {
    val wk = 604800L
    val events = Seq(
      ("a", 0L), ("a", wk + 1), ("a", 3 * wk),  // cohort 0, offsets {0,1,3}
      ("b", 5L), ("b", 3 * wk + 7),             // cohort 0, offsets {0,3}
      ("c", wk), ("c", 2 * wk)                  // cohort 1, offsets {0,1}
    ).toDF("context_id", "timestamp")
    val out = EventAnalytics.retentionCohorts(events, "context_id", "timestamp")
      .collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("n_users"))).toSet
    assert(out == Set(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 2L),
      (wk, 0L, 1L), (wk, 1L, 1L)))
  }

  test("calendar retention: NY weeks hold across DST, Sunday-night NY stays in its local week") {
    // 2024-03-10 02:00 NY is the spring-forward transition; the Mar-11 week
    // has 167 wall-clock hours yet must count as exactly one week offset
    val mar4wk = 1709528400L   // Mon 2024-03-04 00:00 NY (EST, UTC-5)
    val events = Seq(
      ("a", 1709658000L), // Tue Mar 5 12:00 NY → cohort week Mar 4
      ("a", 1710259200L), // Tue Mar 12 12:00 NY (EDT) → offset 1, not 604800-based
      // Sun Mar 10 23:00 NY = Mon Mar 11 03:00 UTC: the UTC date is Monday
      // but the LOCAL week is still Mar 4's → offset 0, same cell as Mar 5
      ("b", 1710126000L),
      // fall-back coverage: Mon Oct 28 week then the 169-hour Nov 4 week
      ("c", 1730088000L), ("c", 1730692800L) // Sun Nov 3 23:00 NY → Oct 28 week
    ).toDF("context_id", "timestamp")
    val out = EventAnalytics.retentionCohortsCalendar(
      events, "context_id", "timestamp", zone = "America/New_York")
      .collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("n_users"))).toSet
    assert(out == Set(
      (mar4wk, 0L, 2L),        // a's first week + b's Sunday-night event
      (mar4wk, 1L, 1L),        // a crosses spring-forward: one calendar week
      (1730088000L, 0L, 1L)))  // c: both events in the Oct 28 NY week
  }

  test("calendar engagement: activity buckets on NY-local days") {
    val events = Seq(
      ("a", 1710126000L), // Sun Mar 10 23:00 NY = Mon Mar 11 03:00 UTC → NY day Mar 10
      ("b", 1710129600L)  // Mon Mar 11 00:00 NY → NY day Mar 11
    ).toDF("context_id", "timestamp")
    val out = EventAnalytics.engagementCalendar(
      events, "context_id", "timestamp", zone = "America/New_York", windowDays = 2)
      .collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("dau"), r.getAs[Long]("wau")))
      .toSet
    // Mar 10 NY midnight = 1710046800 (EST); Mar 11 NY midnight = 1710129600 (EDT)
    assert(out == Set(
      (1710046800L, 1L, 1L),       // day Mar 10: a only
      (1710129600L, 1L, 2L)))      // day Mar 11: b active, window covers a's Mar 10
  }

  // ---- top-k per group ----

  test("topEventsPerContext ranks by value desc with event_id tie-break, k-bounded") {
    val events = Seq(
      ("u", 1L, 5.0, 100L), ("u", 2L, 9.0, 200L), ("u", 3L, 9.0, 300L),
      ("u", 4L, 1.0, 400L), // rank 4 → cut at k=3
      ("v", 5L, 2.0, 500L)
    ).toDF("context_id", "event_id", "value", "timestamp")
    val out = EventAnalytics.topEventsPerContext(
      events, "context_id", "event_id", "value", "timestamp", k = 3)
      .collect()
      .map(r => (r.getAs[String]("context_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("event_id"), r.getAs[Long]("value_milli"), r.getAs[Long]("timestamp")))
      .toSet
    assert(out == Set(
      ("u", 1L, 2L, 9000L, 200L), // tie on 9.0 → smaller event_id first
      ("u", 2L, 3L, 9000L, 300L),
      ("u", 3L, 1L, 5000L, 100L),
      ("v", 1L, 5L, 2000L, 500L)))
  }

  // ---- gaps + engagement ----

  test("interEventGaps buckets each gap under the FOLLOWING event's type") {
    val events = Seq(
      ("u", 100L, 1L, "view"), ("u", 160L, 2L, "buy"),  // gap 60 → buy
      ("u", 170L, 3L, "view"),                          // gap 10 → view
      ("w", 500L, 4L, "buy")                            // no predecessor
    ).toDF("context_id", "timestamp", "event_id", "event_type")
    val out = EventAnalytics.interEventGaps(events,
      "context_id", "timestamp", "event_id", "event_type")
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("g_min"), r.getAs[Double]("p50"))))
      .toMap
    assert(out == Map("buy" -> ((1L, 60L, 60.0)), "view" -> ((1L, 10L, 10.0))))
  }

  test("engagement: trailing-window WAU counts a user once per covered day") {
    val day = 86400L
    val events = Seq(
      ("a", 0L), ("a", 10L),        // a active day 0 (twice — one distinct)
      ("b", day), ("a", 2 * day)    // b day 1, a day 2
    ).toDF("context_id", "timestamp")
    val out = EventAnalytics.engagement(events, "context_id", "timestamp",
      daySec = day, windowDays = 2)
      .collect()
      .map(r => (r.getAs[Long]("day") / day,
        r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("stickiness_ppm")))
      .toSet
    assert(out == Set(
      (0L, 1L, 1L, 1000000L),  // day 0: a
      (1L, 1L, 2L, 500000L),   // day 1: b active; window {day0 a, day1 b}
      (2L, 1L, 2L, 500000L)))  // day 2: a active; window {day1 b, day2 a}
  }

  test("eventTransitions: per-context order, row-conditional ppm") {
    val events = Seq(
      ("u", 1L, 1L, "a"), ("u", 2L, 2L, "b"), ("u", 3L, 3L, "a"),
      ("v", 1L, 4L, "a"), ("v", 2L, 5L, "c")
    ).toDF("context_id", "timestamp", "event_id", "event_type")
    val out = EventAnalytics.eventTransitions(events,
      "context_id", "timestamp", "event_id", "event_type")
      .collect()
      .map(r => ((r.getAs[String]("from_type"), r.getAs[String]("to_type")),
        (r.getAs[Long]("n"), r.getAs[Long]("p_ppm"))))
      .toMap
    // from a: b once, c once (500000 each); from b: a once (1000000)
    assert(out == Map(
      ("a", "b") -> ((1L, 500000L)),
      ("a", "c") -> ((1L, 500000L)),
      ("b", "a") -> ((1L, 1000000L))))
  }

  // ---- percentiles ----

  test("valuePercentiles interpolates h = p(n-1) over quantized values") {
    val events = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 7.0)
    ).toDF("event_type", "value")
    val out = EventAnalytics.valuePercentiles(events, "event_type", "value")
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("v_min"), r.getAs[Long]("v_max"),
          r.getAs[Double]("p50"), r.getAs[Double]("p90"))))
      .toMap
    // n=4: h50 = 1.5 → 2000 + 0.5·1000; h90 = 2.7 → 3000 + 0.7·1000
    assert(out("a") == ((4L, 1000L, 4000L, 2500.0, 3700.0)))
    assert(out("b") == ((1L, 7000L, 7000L, 7000.0, 7000.0)))
  }

  // ---- global line dedup ----

  test("dedupLinesGlobal keeps first occurrence, blanks always survive") {
    val docs = Seq(
      (1L, "header\nalpha\n\nbeta"),
      (2L, "header\ngamma\n\nbeta"), // header+beta duplicate doc 1's
      (3L, "gamma")                  // duplicates doc 2's gamma
    ).toDF("doc_id", "text")
    val out = CorpusSignals.dedupLinesGlobal(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_lines"), r.getAs[Long]("n_dropped"))))
      .toMap
    assert(out(1L) == (("header\nalpha\n\nbeta", 4L, 0L)))
    assert(out(2L) == (("gamma\n", 4L, 2L))) // header+beta dropped, blank kept
    assert(out(3L) == (("", 1L, 1L)))        // its only line lost to doc 2
  }

  // ---- scalar quantization ----

  test("scalarQuantize maps corpus min->0 and max->levels-1 per dimension") {
    val embs = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, Array(5.0f, 20.0f)),
      (3L, Array(10.0f, 30.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.scalarQuantize(embs, "vec_id", "embedding")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("q_first"), r.getAs[Long]("q_last"), r.getAs[Long]("n_dims"))))
      .toMap
    assert(out(1L) == ((0L, 0L, 2L)))     // both dims at corpus min
    assert(out(2L) == ((127L, 127L, 2L))) // floor(0.5 * 255)
    assert(out(3L) == ((255L, 255L, 2L))) // both dims at corpus max
  }

  test("scalarQuantize is constant-safe (mx == mn dimension codes to 0)") {
    val embs = Seq((1L, Array(7.0f)), (2L, Array(7.0f))).toDF("vec_id", "embedding")
    val codes = Similarity.scalarQuantize(embs, "vec_id", "embedding")
      .collect().map(_.getAs[Long]("q_first")).toSet
    assert(codes == Set(0L))
  }

  // ---- hybrid retrieval ----

  test("hybridTopK blends lexical and dense scores, excludes the query doc") {
    val docs = Seq(
      (0L, "query doc"), (1L, "dup dup x"), (2L, "y"), (3L, "dup")
    ).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.0f)), (3L, Array(0.5f, 0.0f))
    ).toDF("doc_id", "embedding")
    // df(dup)=2 → weight 500000; dots vs (1000,0): d1=0, d2=1e6, d3=5e5
    val out = Search.hybridTopK(docs, embs, "doc_id", "text", "embedding",
      Seq("dup"), queryId = 0L, k = 3, wTerm = 1L, wVec = 1L)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("score"),
        r.getAs[Long]("term_score"), r.getAs[Long]("dot")))
    // all three tie at 1e6 → ranked purely by id ASC
    assert(out.toSeq == Seq(
      (1L, 1000000L, 1000000L, 0L),       // lexical-only (2 hits × 5e5)
      (2L, 1000000L, 0L, 1000000L),       // dense-only
      (3L, 1000000L, 500000L, 500000L)))  // blended halves
  }

  test("bm25TopK saturates term frequency and rewards short documents") {
    // 4 docs of equal length 4: tf(dup) = 1, 2, 3, 0  → saturation means
    // score gaps shrink as tf grows; equal tf in a shorter doc wins
    val docs = Seq(
      (0L, "dup a b c"), (1L, "dup dup b c"), (2L, "dup dup dup c"),
      (3L, "x y z w"), (4L, "dup a")
    ).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, "doc_id", "text", Seq("dup"), k = 5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("score")).toMap
    assert(!out.contains(3L), "no-match doc must not score")
    // monotone in tf at equal length...
    assert(out(2L) > out(1L) && out(1L) > out(0L))
    // ...but saturating: the 2→3 gain is strictly smaller than 1→2
    assert(out(2L) - out(1L) < out(1L) - out(0L))
    // same tf=1, shorter doc (len 2 vs 4) ranks higher
    assert(out(4L) > out(0L))
  }

  test("asOf join: latest-at-or-before match, equal-ts visibility, tolerance, no-match nulls") {
    val facts = Seq(
      ("u1", 1L, 100L, "f1"), ("u1", 2L, 50L, "f2"), ("u1", 3L, 10L, "f3"),
      ("u2", 4L, 100L, "f4")
    ).toDF("k", "fid", "t", "fp")
    val dims = Seq(
      ("u1", 20L, "dA"), ("u1", 50L, "dB"), ("u1", 80L, "dC")
    ).toDF("k", "t", "dp")
    def run(tol: Option[Long]) = graft.pipeline.AsOfJoin
      .asOf(facts, dims, "k", "t", "t", dimPrefix = "d_", toleranceSec = tol)
      .collect().map(r => r.getAs[Long]("fid") ->
        (Option(r.getAs[Any]("d_t")), Option(r.getAs[String]("d_dp")))).toMap

    val out = run(None)
    assert(out(1L) == ((Some(80L), Some("dC"))), "latest at-or-before wins")
    assert(out(2L) == ((Some(50L), Some("dB"))), "equal-ts dim is visible to the fact")
    assert(out(3L) == ((None, None)), "fact before every dim matches nothing")
    assert(out(4L) == ((None, None)), "no dim for the key matches nothing")

    val tight = run(Some(10L))
    assert(tight(1L) == ((None, None)), "match older than the tolerance is dropped")
    assert(tight(2L) == ((Some(50L), Some("dB"))), "zero-age match survives any tolerance")
  }

  test("scd2 intervals are the dual of asOf: the match at t is the interval containing t") {
    val dims = Seq(("u1", 20L, "dA"), ("u1", 50L, "dB"), ("u1", 80L, "dC"))
      .toDF("k", "t", "dp")
    val iv = graft.pipeline.AsOfJoin.scd2(dims, "k", "t")
      .collect().map(r => (r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")), r.getAs[String]("dp"))).toSet
    assert(iv == Set((20L, Some(50L), "dA"), (50L, Some(80L), "dB"), (80L, None, "dC")))

    // every asOf match falls inside its version's [valid_from, valid_to)
    val facts = Seq(("u1", 1L, 35L), ("u1", 2L, 50L), ("u1", 3L, 200L)).toDF("k", "fid", "t")
    val matched = graft.pipeline.AsOfJoin.asOf(facts, dims, "k", "t", "t", "d_")
      .collect().map(r => r.getAs[Long]("t") -> r.getAs[Long]("d_t"))
    matched.foreach { case (ft, from) =>
      val (f, to, _) = iv.find(_._1 == from).get
      assert(ft >= f && to.forall(hi => ft < hi.asInstanceOf[Long]))
    }
  }

  test("bandJoin: boundary inclusivity, overlap multi-match, empty band, no-band drop") {
    val facts = Seq((1L, 10L), (2L, 19L), (3L, 20L), (4L, 25L), (5L, 99L)).toDF("id", "v")
    val bands = Seq(
      (10L, 20L, "a"),   // [10,20): matches 10, 19; NOT 20
      (15L, 30L, "b"),   // overlaps a: 19 matches both
      (40L, 40L, "e"),   // empty band: matches nothing
      (50L, 45L, "w")    // inverted band: matches nothing
    ).toDF("lo", "hi", "name")
    val out = graft.pipeline.RangeJoin.bandJoin(facts, col("v"), bands, "lo", "hi", 8L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSet
    assert(out == Set(
      (1L, "a"),            // lo inclusive
      (2L, "a"), (2L, "b"), // overlap → two rows
      (3L, "b"),            // hi exclusive for a, inside b
      (4L, "b")))           // 5/99 out of every band → dropped
  }

  test("anomalousDays flags spikes and densified zero-day craters, skips the warmup window") {
    // days 0-6: 10/day baseline; day 7: 30 (spike); day 8: NO ROWS (crater,
    // must come from densification); day 9: 10 (back to normal)
    val rows = (0 to 6).flatMap(d => Seq.fill(10)(("a", d * 86400L))) ++
      Seq.fill(30)(("a", 7 * 86400L)) ++
      Seq.fill(10)(("a", 9 * 86400L))
    val out = graft.pipeline.EventAnalytics.anomalousDays(
      rows.toDF("event_type", "timestamp"), "event_type", "timestamp",
      windowDays = 7, thresholdPpm = 500000L)
      .collect().map(r => r.getAs[Long]("day_start") / 86400 ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("dev_ppm"))).toMap
    // day 7: trail 70 → dev (210-70)/70 = +2.0; day 8: trail 90 → dev -1.0
    assert(out == Map(7L -> ((30L, 2000000L)), 8L -> ((0L, -1000000L))),
      s"got $out")
  }

  test("parseJsonl routes malformed / missing-field / ok, tolerates unknown fields") {
    val lines = Seq(
      (1L, """{"doc_id": 1, "text": "hello world", "lang": "en"}"""),
      (2L, """{"doc_id": 2, "lang": "en"}"""),                       // no text
      (3L, """{"doc_id": 3, "text": "x", "extra": [1, 2]}"""),       // unknown field ok
      (4L, """{"doc_id": 4, "text": "unterminated"""),               // malformed
      (5L, """not json at all"""),                                   // malformed
      (6L, """{"text": "orphan"}""")                                 // no doc_id
    ).toDF("orig_id", "line")
    val out = graft.pipeline.JsonIngest.parseJsonl(lines, "line")
      .collect().map(r => r.getAs[Long]("orig_id") -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "ok", 2L -> "missing_field", 3L -> "ok",
      4L -> "malformed", 5L -> "malformed", 6L -> "missing_field"))
  }

  test("editDistanceNearDups: confirms small edits, drops unrelated and over-length pairs") {
    val base = "quick brown fox jumps over the lazy dog now"
    val long60 = "a" * 30 + " bb cc dd ee ff gg " + "z" * 11 // > 50 chars
    val docs = Seq(
      (1L, base),
      (2L, base.dropRight(3) + "nov"),   // 1-char edit
      (3L, "completely different words about searching corpora daily"),
      (4L, long60), (5L, long60)          // identical but over maxLen
    ).toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.editDistanceNearDups(
      docs, "doc_id", "text", maxLen = 50, maxDistPpm = 100000L)
      .collect().map(r => (r.getAs[Long]("id_1"), r.getAs[Long]("id_2"),
        r.getAs[Long]("dist"))).toSet
    assert(out == Set((1L, 2L, 1L)),
      s"only the small-edit pair within maxLen survives: $out")
  }

  // ---- audio frames ----

  test("decodeWavFrames: full frames only, frame-local zero crossings, exact rms") {
    def wav(samples: Seq[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val out = Multimodal.decodeWavFrames(
      wav(Seq[Short](10, -10, 20, -20, 5, 5, 0, -1)), frameSize = 3).get
    assert(out == Seq( // trailing 2-sample partial frame dropped
      (0, 20L, 20L, 2L, math.sqrt(600.0 / 3)),
      (1, -10L, 20L, 1L, math.sqrt(450.0 / 3))))
    assert(Multimodal.decodeWavFrames("x".getBytes, 3).isEmpty)
  }

  test("parseMp3Frames: ID3v2 tag skipped; truncated/tag-only/corrupt tags reject") {
    val tagged = Multimodal.buildSyntheticMp3(2L) // even id ⇒ ID3v2 prefix
    assert(new String(tagged.take(3), "US-ASCII") == "ID3",
      "even-id synthetic MP3 must carry an ID3v2 tag")
    val tagLen = 10 + 19 // header + (17 + 2%5) payload bytes
    val frames = tagged.drop(tagLen)
    val meta = Multimodal.parseMp3Frames(tagged)
    assert(meta.isDefined, "tagged MP3 must parse (VERDICT r15: it was dropped)")
    assert(Multimodal.parseMp3Frames(frames) == meta,
      "the tag must not change any parsed field")
    // footer flag (0x10): 10 extra tag bytes between payload and frames
    val withFooter = {
      val h = tagged.take(tagLen); h(5) = 0x10.toByte
      h ++ Array.fill[Byte](10)(0) ++ frames
    }
    assert(Multimodal.parseMp3Frames(withFooter) == meta)
    // truncated tag (declared extent past blob end) rejects
    assert(Multimodal.parseMp3Frames(tagged.take(15)).isEmpty)
    // tag-only blob (no frames after the tag) rejects
    assert(Multimodal.parseMp3Frames(tagged.take(tagLen)).isEmpty)
    // non-syncsafe size byte rejects
    val bad = tagged.clone(); bad(6) = 0x80.toByte
    assert(Multimodal.parseMp3Frames(bad).isEmpty)
    // odd id stays untagged and parses as before
    assert((Multimodal.buildSyntheticMp3(1L)(0) & 0xff) == 0xff)
    assert(Multimodal.parseMp3Frames(Multimodal.buildSyntheticMp3(1L)).isDefined)
  }

  test("imageContentKeys: transposed-dimension pixel-identical images do not collide") {
    // two constant-gray JPEGs at 16×8 and 8×16 decode to IDENTICAL flat
    // pixel streams — before VERDICT r15 #2 the md5-over-pixels key called
    // them the same content
    def grayJpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(128, 128, 128)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val a = Multimodal.decodeJpegPixels(grayJpeg(16, 8)).get
    val b = Multimodal.decodeJpegPixels(grayJpeg(8, 16)).get
    assert(a._3.toSeq == b._3.toSeq, "premise: flat pixel streams identical")
    val media = Seq((1L, grayJpeg(16, 8)), (2L, grayJpeg(8, 16)))
      .toDF("media_id", "bytes")
    val keys = Multimodal.imageContentKeys(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("img_key")).toMap
    assert(keys(1L) != keys(2L),
      s"transposed-dimension pair collided as identical content: $keys")
  }

  // ---- dHash + near-dup ----

  test("dHash64 sets exactly the bits where left gray exceeds right") {
    // 9x8 image, gray strictly decreasing along x → every comparison true
    val w = 9; val h = 8
    val px = Array.tabulate(w * h * 3)(i => ((w - 1 - (i / 3) % w) * 20) + (i % 3 - 1))
    val (hi, lo) = Multimodal.dHash64(w, h, px)
    assert(hi == 0xffffffffL && lo == 0xffffffffL)
    // constant image → no bit set
    val flat = Array.fill(w * h * 3)(128)
    assert(Multimodal.dHash64(w, h, flat) == ((0L, 0L)))
  }

  test("nearDupVideos counts shared distinct frame keys, sim over the smaller side") {
    val frames = Seq(
      // video 1: keys {10, 11, 11} (distinct {10, 11}); video 2: {11, 12};
      // video 3: {99} — no overlap
      (1L, 0L, 3, 8, 8, 0L, 0L, 10L), (1L, 1L, 3, 8, 8, 0L, 0L, 11L),
      (1L, 2L, 3, 8, 8, 0L, 0L, 11L),
      (2L, 0L, 2, 8, 8, 0L, 0L, 11L), (2L, 1L, 2, 8, 8, 0L, 0L, 12L),
      (3L, 0L, 1, 8, 8, 0L, 0L, 99L)
    ).toDF("media_id", "frame_idx", "n_frames", "width", "height",
      "hash_hi", "hash_lo", "frame_key")
    val out = Multimodal.nearDupVideos(frames)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("shared"), r.getAs[Long]("sim_ppm")))
      .toSet
    // one shared distinct key (11) over min(2, 2) distinct keys = 0.5
    assert(out == Set((1L, 2L, 1L, 500000L)))
  }

  test("sceneCuts: frame 0 always cuts, distance vs previous frame, scene index runs") {
    val frames = Seq(
      (1L, 0L, 0L, 0L),           // cut (first): scene 0
      (1L, 1L, 0L, 1L),           // dist 1 <= 2: scene 0
      (1L, 2L, 0xffL, 1L),        // dist 8 > 2: cut, scene 1
      (2L, 0L, 0L, 0L)            // other video: its own scene 0
    ).toDF("media_id", "frame_idx", "hash_hi", "hash_lo")
    val out = Multimodal.sceneCuts(frames, cutDist = 2)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("dist"), r.getAs[Boolean]("is_cut"), r.getAs[Long]("scene_idx")))
      .toSet
    assert(out == Set(
      (1L, 0L, 0L, true, 0L),
      (1L, 1L, 1L, false, 0L),
      (1L, 2L, 8L, true, 1L), // 8 hi bits flipped vs frame 1, lo unchanged
      (2L, 0L, 0L, true, 0L)))
  }

  test("nearDupImages banding finds all pairs within distance 3 and none beyond") {
    val hashes = Seq(
      // a/b differ by 2 bits (both in band 0) → dist 2, caught via bands 1-3
      (1L, 5, 6, 0L, 0x3L),
      (2L, 5, 6, 0L, 0x0L),
      // c differs from b by 4 bits, one per band → excluded (dist 4)
      (3L, 5, 6, (1L | (1L << 16)), (1L | (1L << 16)))
    ).toDF("media_id", "width", "height", "hash_hi", "hash_lo")
    val pairs = Multimodal.nearDupImages(hashes, maxDist = 3)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("dist")))
      .toSet
    assert(pairs == Set((1L, 2L, 2L)))
  }

  test("incremental sessionization equals batch on every split shape") {
    val events = Seq(
      // u: session 0 = {100, 150}, session 1 = {400}; split at 120 puts
      // 150 (continues session 0) and 400 (new session) in the batch
      ("u", 100L, 1L), ("u", 150L, 2L), ("u", 400L, 3L),
      // v: entirely night-1
      ("v", 100L, 4L),
      // w: brand-new context appearing only in night-2
      ("w", 500L, 5L)
    ).toDF("context_id", "timestamp", "event_id")
    val full = EventAnalytics.assignSessions(events, "context_id", "timestamp",
        "event_id", gapSec = 100L)
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("session_idx"))).toMap
    Seq(120L, 200L, 450L).foreach { t0 =>
      val state = EventAnalytics.sessionState(
        EventAnalytics.sessionize(events.filter(col("timestamp") < t0),
          "context_id", "timestamp", "event_id", 100L), "context_id")
      val inc = EventAnalytics.assignSessionsIncremental(
          events.filter(col("timestamp") >= t0), state,
          "context_id", "timestamp", "event_id", 100L)
        .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("session_idx"))).toMap
      inc.foreach { case (eid, idx) =>
        assert(idx == full(eid), s"split $t0, event $eid: incremental $idx != batch ${full(eid)}")
      }
      assert(inc.keySet == full.keySet.filter(e =>
        events.filter(col("event_id") === e).head.getAs[Long]("timestamp") >= t0))
    }
  }

  test("sessionFunnelK withinSec: chain completes only inside the first-step budget") {
    val events = Seq(
      // u: a at 100, b at 150, c at 190 → all within 100s of a → converted
      ("u", 100L, 1L, "a"), ("u", 150L, 2L, "b"), ("u", 190L, 3L, "c"),
      // v: a at 100, b at 150, c at 250 → c exceeds the budget → 2 steps
      ("v", 100L, 4L, "a"), ("v", 150L, 5L, "b"), ("v", 250L, 6L, "c"),
      // w: first b arrives past budget, but no later b exists → 1 step;
      // greedy first-touch anchors on the FIRST a even though a later a
      // (at 300) would have allowed the chain
      ("w", 100L, 7L, "a"), ("w", 300L, 8L, "a"), ("w", 350L, 9L, "b")
    ).toDF("context_id", "timestamp", "event_id", "event_type")
    val out = EventAnalytics.sessionFunnelK(events, "context_id", "timestamp",
        "event_id", "event_type", gapSec = 10000L, steps = Seq("a", "b", "c"),
        withinSec = 100L)
      .collect().map(r => (r.getAs[String]("context_id"),
        r.getAs[Long]("steps_done"), r.getAs[Boolean]("converted"))).toSet
    assert(out == Set(("u", 3L, true), ("v", 2L, false), ("w", 1L, false)))
  }

  test("experimentLift: per-arm integer ppm rates, lift vs control truncates toward zero") {
    // hand-build assignment by reusing the same hash the operator uses
    val users = (1 to 60).map(_.toString)
    val byArm = users.groupBy(u =>
      Math.floorMod(Hashing.md5LongJvm(s"ab:$u"), 2L))
    // every user gets a view; users with even int id also convert
    val rows = users.flatMap { u =>
      Seq((u, "view")) ++ (if (u.toInt % 2 == 0) Seq((u, "purchase")) else Nil)
    }
    val out = EventAnalytics.experimentLift(
        rows.toDF("context_id", "event_type"), "context_id", "event_type",
        convType = "purchase", nVariants = 2)
      .collect().map(r => r.getAs[Long]("variant") ->
        ((r.getAs[Long]("users"), r.getAs[Long]("converters"),
          r.getAs[Long]("conv_ppm"), r.getAs[Long]("lift_ppm")))).toMap
    (0L to 1L).foreach { arm =>
      val us = byArm(arm)
      val conv = us.count(_.toInt % 2 == 0).toLong
      val ppm = conv * 1000000L / us.size
      assert(out(arm)._1 == us.size.toLong && out(arm)._2 == conv &&
        out(arm)._3 == ppm, s"arm $arm: ${out(arm)}")
    }
    assert(out(0L)._4 == 0L)
    val expLift = (out(1L)._3 - out(0L)._3) * 1000000L / out(0L)._3
    assert(out(1L)._4 == expLift)
  }

  test("topPaths: (ts, id)-ordered prefix paths, count desc / path asc ranking") {
    val events = Seq(
      ("u", 100L, 1L, "view"), ("u", 110L, 2L, "click"),
      ("v", 100L, 3L, "view"), ("v", 110L, 4L, "click"),
      // w: 3 steps but maxLen 2 truncates to view>click
      ("w", 100L, 5L, "view"), ("w", 110L, 6L, "click"), ("w", 120L, 7L, "buy"),
      // x alone: singleton path, ties with nothing
      ("x", 100L, 8L, "buy"),
      // y: same count as x's path but later alphabetically
      ("y", 100L, 9L, "view")
    ).toDF("context_id", "timestamp", "event_id", "event_type")
    val out = EventAnalytics.topPaths(events, "context_id", "timestamp",
        "event_id", "event_type", gapSec = 10000L, maxLen = 2, topN = 2)
      .collect().map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions")))
    assert(out.toSeq == Seq(("view>click", 3L), ("buy", 1L)))
  }

  test("bootstrapMeans: deterministic Poisson weights with unit mean, constant metric is invariant") {
    val df = (1L to 200L).map(i => (i, 2.0)).toDF("event_id", "value")
    val out = Profile.bootstrapMeans(df, "event_id", "value", replicas = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 8)
    out.foreach { case (_, nEff, sumM, meanM) =>
      // a constant metric bootstraps to itself exactly, whatever the weights
      assert(meanM == 2000L && sumM == nEff * 2000L)
      // Poisson(1) over 200 rows: n_eff concentrates near 200
      assert(nEff > 140L && nEff < 260L, s"n_eff=$nEff")
    }
    // fully deterministic: a second evaluation is identical
    val again = Profile.bootstrapMeans(df, "event_id", "value", replicas = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(_._1).sameElements(out.sortBy(_._1)))
  }

  test("mannWhitneyU: doubled U handles ties exactly, identity u2_a + u2_b = 2·n_a·n_b") {
    // pick two contexts landing in different arms (md5 parity), values
    // chosen so arm A dominates with one tie
    val ctxA = (1 to 50).map(_.toString)
      .find(c => Math.floorMod(graft.pipeline.Hashing.md5LongJvm("ab:" + c), 2L) == 0L).get
    val ctxB = (1 to 50).map(_.toString)
      .find(c => Math.floorMod(graft.pipeline.Hashing.md5LongJvm("ab:" + c), 2L) == 1L).get
    val e = Seq((ctxA, 3.0), (ctxA, 2.0), (ctxB, 1.0), (ctxB, 2.0))
      .toDF("context_id", "value")
    val r = EventAnalytics.mannWhitneyU(e, "context_id", "value").head()
    val (na, nb, u2a, u2b) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert((na, nb) == ((2L, 2L)))
    // pairs (a,b): (3,1) win, (3,2) win, (2,1) win, (2,2) tie →
    // U_A = 3.5 → u2_a = 7; u2_b = 2·2·2·... total 8 − 7 = 1
    assert((u2a, u2b) == ((7L, 1L)))
    assert(u2a + u2b == 2 * na * nb)
  }

  test("pageRank: hub outranks leaves, symmetric nodes tie, single edge is a fixed point") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Clustering.pageRank(path, "a", "b", iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == r(3L), s"symmetric leaves must tie: $r")
    assert(r(2L) > r(1L), s"the hub must outrank its leaves: $r")
    // one symmetric edge: shares are whole, every round reproduces 1e6
    val single = Clustering.pageRank(Seq((5L, 6L)).toDF("a", "b"), "a", "b",
      iters = 3, dampPpm = 500000L)
      .collect().map(_.getLong(1)).toSet
    assert(single == Set(1000000L))
    // reliable-scratch variant (checkpointDir) and per-round checkpointing
    // are bit-identical to the default cadence — only durability differs
    val ckDir = java.nio.file.Files.createTempDirectory("graft_pr_ck_").toString
    val r2 = Clustering.pageRank(path, "a", "b", iters = 10,
        checkpointEvery = 1, checkpointDir = Some(ckDir))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 == r, s"checkpointDir variant must be bit-identical: $r2 vs $r")
  }

  test("triangleStats: cliques close their triangles, stars close none") {
    // triangle {1,2,3} plus a star at 10 (leaves 11, 12, no leaf edge);
    // duplicate/reversed edges must not double-count, and an edge given
    // ONLY in reversed orientation (3,1) must still count; self-loops drop
    val e = Seq((1L, 2L), (3L, 1L), (2L, 3L), (3L, 2L), (1L, 2L), (2L, 2L),
      (10L, 11L), (10L, 12L)).toDF("a", "b")
    val out = Clustering.triangleStats(e, "a", "b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, 1000000L)))
    assert(out(2L) == ((2L, 1L, 1000000L)))
    assert(out(3L) == ((2L, 1L, 1000000L)))
    assert(out(10L) == ((2L, 0L, 0L)))
    assert(out(11L) == ((1L, 0L, 0L)))
    assert(out(12L) == ((1L, 0L, 0L)))
  }

  test("intervalJoin equals the brute-force overlap predicate on random intervals") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic random interval sets; spans straddle many buckets and
    // include empties (lo == hi) and containments
    val gen = Gen.listOfN(60, for {
      lo <- Gen.choose(0L, 500L); len <- Gen.choose(0L, 120L)
    } yield (lo, lo + len))
    val ls = gen(Gen.Parameters.default, Seed(7L)).get.zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
    val rs = gen(Gen.Parameters.default, Seed(8L)).get.zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong + 1000L, lo, hi) }
    val expected = (for {
      (li, llo, lhi) <- ls; (ri, rlo, rhi) <- rs
      if llo < rhi && rlo < lhi
    } yield (li, ri)).toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.intervalJoin(
        ls.toDF("lid", "l_lo", "l_hi"), "l_lo", "l_hi",
        rs.toDF("rid", "r_lo", "r_hi"), "r_lo", "r_hi", w)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == expected, s"bucketWidth=$w")
      assert(got.length == got.distinct.length, s"duplicates at bucketWidth=$w")
    }
  }

  test("intervalJoin: overlap pairs exactly once, touching intervals excluded") {
    val left = Seq((1L, 0L, 100L), (2L, 95L, 200L), (3L, 300L, 301L))
      .toDF("lid", "l_lo", "l_hi")
    val right = Seq((10L, 50L, 96L), (11L, 100L, 150L), (12L, 301L, 400L))
      .toDF("rid", "r_lo", "r_hi")
    // small bucket width forces every pair to share MANY buckets — the
    // claim-once filter must still emit each exactly once
    val out = RangeJoin.intervalJoin(left, "l_lo", "l_hi", right, "r_lo", "r_hi", 7L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // (1,10): [0,100)∩[50,96) overlap; (1,11): l_hi=100 = r_lo → half-open, NO
    // (2,10): [95,200)∩[50,96) overlap at 95; (2,11): overlap
    // (3,12): [300,301) vs [301,400): touching, NO
    assert(out.sorted == Seq((1L, 10L), (2L, 10L), (2L, 11L)))
    assert(out.distinct.size == out.size, "claim-once must not duplicate pairs")
  }

  test("sessionEntryExit: first/last by (ts, id), bounce = single-event session") {
    val events = Seq(
      // u session 0: home → buy, duration 50
      ("u", 100L, 1L, "home"), ("u", 150L, 2L, "buy"),
      // u session 1: lone home → bounce
      ("u", 1000L, 3L, "home"),
      // v: lone search → bounce; ties on ts broken by id for entry/exit
      ("v", 100L, 5L, "search"),
      ("w", 100L, 7L, "a"), ("w", 100L, 6L, "b") // same ts: entry=b(6), exit=a(7)
    ).toDF("context_id", "timestamp", "event_id", "event_type")
    val out = EventAnalytics.sessionEntryExit(events,
        "context_id", "timestamp", "event_id", "event_type", gapSec = 100L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("home", "buy")) == ((1L, 0L, 0L, 50L)))
    assert(out(("home", "home")) == ((1L, 1L, 1000000L, 0L)))
    assert(out(("search", "search")) == ((1L, 1L, 1000000L, 0L)))
    assert(out(("b", "a")) == ((1L, 0L, 0L, 0L)))
    assert(out.size == 4)
  }

  test("churnLifeTable: lifetimes, censoring at the horizon, descending risk sets") {
    val day = 86400L
    val events = Seq(
      // a: days 0..2 → lifetime 2, last=2, churned (2+7 < 10)
      ("a", 0L, 1L), ("a", 2 * day, 2L),
      // b: day 0 only → lifetime 0, churned
      ("b", 0L, 3L),
      // c: day 10 only → lifetime 0, last=10 = corpus end → censored
      ("c", 10 * day, 4L)
    ).toDF("context_id", "timestamp", "event_id")
    val out = EventAnalytics.churnLifeTable(events, "context_id", "timestamp", 7L)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // t=0: 2 end (b churn, c censored), risk = all 3
    assert(out(0L) == ((2L, 1L, 1L, 3L, 333333L)))
    // t=2: a ends churned, risk = 1
    assert(out(2L) == ((1L, 1L, 0L, 1L, 1000000L)))
    assert(out.size == 2)
  }

  test("cohortLtv: milli-exact revenue, cumulative per cohort, LTV per cohort user") {
    val events = Seq(
      ("a", 5L, 1.0), ("a", 15L, 2.0), // cohort 0: buckets 0 and 1
      ("b", 12L, 10.0) // cohort 1
    ).toDF("context_id", "timestamp", "value")
    val out = EventAnalytics.cohortLtv(events, "context_id", "timestamp", "value",
        bucketSec = 10L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out((0L, 0L)) == ((1L, 1000L, 1000L, 1L, 1000L)))
    assert(out((0L, 1L)) == ((1L, 2000L, 3000L, 1L, 3000L)))
    assert(out((10L, 0L)) == ((1L, 10000L, 10000L, 1L, 10000L)))
    assert(out.size == 3)
  }
}
