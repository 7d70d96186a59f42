package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond the reference's command surface:
  * gap-based sessionization and cohort retention. The reference stops at
  * funnels (FOLLOWED BY, `docs/src/design/query_replay.md`); these are the
  * two next operators every event-analytics user reaches for, built
  * Spark-first.
  *
  * Scale notes (100 TB): both operators shuffle ONCE on the context key and
  * stay partitioned on it for every later step. Per-context state (a
  * session's events, a user's active weeks) is bounded by a single entity's
  * activity, never by corpus size, so no per-query global window or
  * driver-side pass exists anywhere.
  */
object EventAnalytics {

  /** Gap-based sessionization: a new session starts when a context's
    * inter-event gap exceeds `gapSec` (industry-standard inactivity
    * sessioning, e.g. the 30-minute web-analytics default).
    *
    * One shuffle on `ctxCol`: the lag + running-sum windows and the final
    * per-(context, session) aggregate all reuse that partitioning (Spark's
    * EnsureRequirements accepts hash(ctx) for the (ctx, session_idx)
    * aggregate because the partitioning keys are a subset of the grouping
    * keys).
    *
    * Output: one row per session — context, 0-based `session_idx` in
    * (timestamp, event_id) order, start/end timestamps, event count,
    * duration in seconds.
    */
  /** Per-EVENT session assignment: the input rows plus a 0-based
    * `session_idx` (the gap rule of [[sessionize]]). One shuffle on the
    * context; everything downstream that groups by (context, session)
    * reuses the partitioning. */
  def assignSessions(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, gapSec: Long): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val byCtx = Window.partitionBy(col(ctxCol)).orderBy(col(tsCol), col(idCol))
    val run = byCtx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(byCtx))
      .withColumn("_new_session",
        (col("_prev_ts").isNull || col(tsCol) - col("_prev_ts") > gapSec).cast("long"))
      .withColumn("session_idx", sum(col("_new_session")).over(run) - 1)
      .drop("_prev_ts", "_new_session")
  }

  def sessionize(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, gapSec: Long): DataFrame = {
    assignSessions(events, ctxCol, tsCol, idCol, gapSec)
      .groupBy(col(ctxCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_s", col("end_ts") - col("start_ts"))
  }

  /** Within-session two-step funnel: for every session, the FIRST-TOUCH
    * completion of `stepA` → `stepB` (stepB strictly after stepA in
    * (timestamp, event_id) order, both inside the session) — the
    * session-scoped conversion measure web analytics reports. Sessions
    * without a stepA (or with no stepB after it) appear unconverted, so
    * conversion rates are computable directly from the output.
    *
    * Every stage — session assignment, the stepA minimum, the stepB
    * minimum, the session roll-up — aggregates or windows on (context,
    * session) keys, so the single hash(context) exchange from
    * [[assignSessions]] serves the whole plan.
    *
    * Output: context, session_idx, n_events, nullable `{a,b}_ts`,
    * `converted`. */
  def sessionFunnel(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSec: Long,
      stepA: String, stepB: String): DataFrame = {
    val se = assignSessions(events, ctxCol, tsCol, idCol, gapSec)
    val keys = Seq(col(ctxCol), col("session_idx"))
    val sessions = se.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_events"),
        min(when(col(typeCol) === stepA,
          struct(col(tsCol).as("t"), col(idCol).as("i")))).as("_a"))
    val b = se
      .join(sessions.select((keys :+ col("_a")): _*), Seq(ctxCol, "session_idx"))
      .filter(col(typeCol) === stepB && col("_a").isNotNull &&
        struct(col(tsCol).as("t"), col(idCol).as("i")) > col("_a"))
      .groupBy(keys: _*)
      .agg(min(col(tsCol)).as("b_ts"))
    sessions
      .join(b, Seq(ctxCol, "session_idx"), "left")
      .select(col(ctxCol), col("session_idx"), col("n_events"),
        col("_a.t").as("a_ts"), col("b_ts"),
        col("b_ts").isNotNull.as("converted"))
  }

  /** Multi-step (k-step) session funnel: within every session, the
    * FIRST-TOUCH strictly-ordered completion of the `steps` chain — the
    * k-step generalization of [[sessionFunnel]] (reference analog: PlotQL's
    * `a -> b -> c` chains, `commands/plotql.rs:579-610`, session-scoped).
    * Step i+1 matches the earliest event of its type strictly after the
    * matched step i in (timestamp, event_id) order; the scan is the
    * greedy forward pass, so `steps` may repeat a type (`view -> view`).
    *
    * Scale shape: ONE aggregation on (context, session) after
    * [[assignSessions]] — the single hash(context) exchange serves the
    * whole plan (grouping keys are a superset of the partitioning key).
    * Per-session state is the session's OWN step-typed events (bounded by
    * one entity's activity in one session, the same bound sessionization
    * itself needs); the chain walk is a codegen'd `aggregate` fold over
    * that sorted array — no per-step join, no k-pass scan.
    *
    * Output: context, session_idx, n_events, `step_ts` (array of matched
    * step timestamps, length = steps completed), `steps_done`,
    * `converted` (all k steps matched). */
  def sessionFunnelK(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSec: Long,
      steps: Seq[String], withinSec: Long = 0L): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got ${steps.size}")
    require(withinSec >= 0, s"withinSec must be >= 0 (0 = unbounded), got $withinSec")
    val k = steps.size
    val stepArr = array(steps.map(lit): _*)
    val se = assignSessions(events, ctxCol, tsCol, idCol, gapSec)
    val g = se.groupBy(col(ctxCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(when(col(typeCol).isin(steps: _*),
          struct(col(tsCol).cast("long").as("t"),
            col(idCol).cast("long").as("i"),
            col(typeCol).as("y"))))).as("_evs"))
    // greedy forward chain walk: acc = timestamps of steps matched so far;
    // the array is (t, i)-sorted, so "strictly after the previous match"
    // is exactly "later in the fold". With `withinSec > 0` a step only
    // matches while the chain stays inside the first-step time budget
    // (t − step1_ts ≤ withinSec) — events are scanned in time order, so
    // the first qualifying event is still the earliest qualifying event.
    val inBudget = (acc: Column, e: Column) =>
      if (withinSec == 0L) lit(true)
      else size(acc) === 0 || e.getField("t") - element_at(acc, 1) <= withinSec
    val chain = aggregate(col("_evs"), expr("cast(array() as array<bigint>)"),
      (acc, e) => when(size(acc) < k &&
          e.getField("y") === element_at(stepArr, size(acc) + 1) &&
          inBudget(acc, e),
        concat(acc, array(e.getField("t")))).otherwise(acc))
    g.withColumn("step_ts", chain)
      .select(col(ctxCol), col("session_idx"), col("n_events"), col("step_ts"),
        size(col("step_ts")).cast("long").as("steps_done"),
        (size(col("step_ts")) === k).as("converted"))
  }

  /** Top-k events per context by value — "each user's k biggest purchases",
    * the per-group ranking every analytics surface needs. Ranks by
    * (milli-quantized value DESC, event_id ASC) through the bounded
    * [[graft.functions.TopKByDot]] aggregate: map-side partial state ≤ k
    * per (context, partition), an exchange of ≤ partitions×k rows per
    * context, k-way final merge — NEVER the `row_number` window that
    * funnels every event of a hot context through one task.
    *
    * Output: context, 1-based `rank`, event id, `value_milli` (the ranking
    * key — quantization IS the documented tie semantics), event timestamp.
    */
  def topEventsPerContext(events: DataFrame, ctxCol: String, idCol: String,
      valueCol: String, tsCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    val ranked = events.select(col(ctxCol).as("_ctx"),
      expr(s"cast(round($valueCol * 1000) as bigint)").as("_vq"),
      col(idCol).cast("long").as("_eid"),
      col(tsCol).cast("double").as("_ts")) // ts ≪ 2^53: exact in the payload
    val tk = columnOf(graft.functions.TopKByDot(
      expressionOf(col("_vq")), expressionOf(col("_eid")),
      expressionOf(col("_ts")), k).toAggregateExpression())
    ranked.groupBy(col("_ctx")).agg(tk.as("tk"))
      .select(col("_ctx"), posexplode(col("tk")).as(Seq("_r0", "_e")))
      .select(col("_ctx").as(ctxCol),
        (col("_r0") + 1).cast("long").as("rank"),
        col("_e.id").as(idCol),
        col("_e.dot").as("value_milli"),
        col("_e.payload").cast("long").as(tsCol))
  }

  /** Exact per-group value percentiles (p50/p90/p99) over the
    * milli-quantized value — the latency-style distribution summary the
    * reference's 7 aggregates lack. Spark's exact `percentile` aggregate
    * and DuckDB's `quantile_cont` share the same definition (rank
    * `h = p·(n−1)`, linear interpolation between the adjacent order
    * statistics), and quantized BIGINT inputs make the interpolation
    * arithmetic reproducible; results round to 6 dp on both engines.
    *
    * Scale shape: one hash aggregation on the group key. Exact percentile
    * state is the group's value multiset — acceptable when groups are
    * bounded (event types, tenants); for unbounded groups switch to
    * `approx_percentile` and drop the oracle to rows-only. */
  def valuePercentiles(events: DataFrame, byCol: String, valueCol: String): DataFrame = {
    val vq = expr(s"cast(round($valueCol * 1000) as bigint)")
    events
      .select(col(byCol), vq.as("_vq"))
      .groupBy(col(byCol))
      .agg(
        count(lit(1)).as("n"),
        min(col("_vq")).as("v_min"),
        max(col("_vq")).as("v_max"),
        round(percentile(col("_vq"), lit(0.5)), 6).as("p50"),
        round(percentile(col("_vq"), lit(0.9)), 6).as("p90"),
        round(percentile(col("_vq"), lit(0.99)), 6).as("p99"))
  }

  /** Inter-event gap distribution: for every event with a predecessor in
    * its context's (timestamp, event_id) order, the gap in seconds —
    * aggregated per the FOLLOWING event's type (how long users idle before
    * each action). Exact percentiles over integer gaps, same engine-parity
    * argument as [[valuePercentiles]].
    *
    * Output per type: `n_gaps`, min/max, p50/p90 (6 dp). */
  def interEventGaps(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val byCtx = Window.partitionBy(col(ctxCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_gap", col(tsCol) - lag(col(tsCol), 1).over(byCtx))
      .filter(col("_gap").isNotNull)
      .groupBy(col(typeCol))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("_gap")).as("g_min"),
        max(col("_gap")).as("g_max"),
        round(percentile(col("_gap"), lit(0.5)), 6).as("p50"),
        round(percentile(col("_gap"), lit(0.9)), 6).as("p90"))
  }

  /** CUSUM changepoint detection over daily event counts — "did this
    * event type's volume shift, and on which day?" (Page's cumulative-sum
    * chart, the classic sequential level-shift detector). Everything is
    * exact integer milli-units so the recurrence is bit-identical on any
    * engine: the first `burnDays` observed days fix the baseline mean
    * `b = (Σ cnt · 1000) div burnDays`; then per subsequent day
    * `S⁺ = max(0, S⁺ + cnt·1000 − b − k)` and
    * `S⁻ = max(0, S⁻ + b − cnt·1000 − k)` with slack
    * `k = b·slackPct div 100`, and the changepoint is the first day either
    * side exceeds `h = b·threshPct div 100` (upward shift wins a
    * same-day tie).
    *
    * Scale shape: the (type, day) count aggregation is massively reducing
    * (the whole corpus collapses to types × days rows); the per-type fold
    * runs over a `sort_array(collect_list(...))` array bounded by CALENDAR
    * DAYS — a bound that holds at any corpus size — as a single
    * `aggregate` expression, never a driver loop or a self-join.
    *
    * Output per type with > `burnDays` observed days: `(event_type,
    * n_days, base_milli, max_sp, max_sn, cp_day, direction)`; `cp_day` is
    * the epoch day of first crossing (null = no shift), `direction` is
    * 'up' / 'down' / null. */
  def cusumChangepoint(events: DataFrame, typeCol: String, tsCol: String,
      burnDays: Int = 60, slackPct: Int = 10, threshPct: Int = 400): DataFrame = {
    require(burnDays >= 1 && slackPct >= 0 && threshPct > 0,
      s"bad CUSUM params: burn=$burnDays slack=$slackPct thresh=$threshPct")
    events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"cast($tsCol as bigint) div 86400").as("_day"))
      .agg(count(lit(1)).as("_cnt"))
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("_day").as("day"),
        col("_cnt").as("cnt")))).as("_arr"))
      .filter(size(col("_arr")) > burnDays)
      .withColumn("n_days", size(col("_arr")).cast("long"))
      .withColumn("base_milli", expr(
        s"aggregate(slice(_arr, 1, $burnDays), 0L, (a, x) -> a + x.cnt) * 1000 div $burnDays"))
      .withColumn("_st", expr(
        s"""aggregate(
           |  slice(_arr, $burnDays + 1, size(_arr) - $burnDays),
           |  named_struct('sp', 0L, 'sn', 0L, 'msp', 0L, 'msn', 0L,
           |               'cp', -1L, 'dir', 0),
           |  (s, x) -> CASE WHEN s.cp >= 0 THEN s ELSE
           |    named_struct(
           |      'sp', greatest(0L, s.sp + x.cnt * 1000 - base_milli
           |              - base_milli * $slackPct div 100),
           |      'sn', greatest(0L, s.sn + base_milli - x.cnt * 1000
           |              - base_milli * $slackPct div 100),
           |      'msp', greatest(s.msp, greatest(0L, s.sp + x.cnt * 1000
           |              - base_milli - base_milli * $slackPct div 100)),
           |      'msn', greatest(s.msn, greatest(0L, s.sn + base_milli
           |              - x.cnt * 1000 - base_milli * $slackPct div 100)),
           |      'cp', CASE
           |        WHEN greatest(0L, s.sp + x.cnt * 1000 - base_milli
           |               - base_milli * $slackPct div 100)
           |             > base_milli * $threshPct div 100 THEN x.day
           |        WHEN greatest(0L, s.sn + base_milli - x.cnt * 1000
           |               - base_milli * $slackPct div 100)
           |             > base_milli * $threshPct div 100 THEN x.day
           |        ELSE -1L END,
           |      'dir', CASE
           |        WHEN greatest(0L, s.sp + x.cnt * 1000 - base_milli
           |               - base_milli * $slackPct div 100)
           |             > base_milli * $threshPct div 100 THEN 1
           |        WHEN greatest(0L, s.sn + base_milli - x.cnt * 1000
           |               - base_milli * $slackPct div 100)
           |             > base_milli * $threshPct div 100 THEN 2
           |        ELSE 0 END) END)""".stripMargin))
      .select(col("event_type"), col("n_days"), col("base_milli"),
        col("_st.msp").as("max_sp"), col("_st.msn").as("max_sn"),
        when(col("_st.cp") >= 0, col("_st.cp")).as("cp_day"),
        when(col("_st.dir") === 1, lit("up"))
          .when(col("_st.dir") === 2, lit("down")).as("direction"))
  }

  /** Ingest-coverage gap report: per event type, the observed day span,
    * how many days inside it are MISSING, and the missing days themselves —
    * the "did last Tuesday's backfill actually land" check that catches
    * silent pipeline holes before they poison week-over-week metrics.
    *
    * Scale shape: the corpus collapses to distinct (type, day) rows first
    * (partial-aggregated); the expected-day expansion is a `sequence()`
    * over the span — CALENDAR-bounded per type — diffed against the
    * observed set with `array_except` inside one aggregation row per type.
    * Nothing here scales with event count, only with types × days.
    *
    * Output: `(event_type, first_day, last_day, span_days, observed_days,
    * missing_days, missing)` — days are epoch days, `missing` sorted. */
  def coverageGaps(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame =
    events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"cast($tsCol as bigint) div 86400").as("_day"))
      .agg(count(lit(1)).as("_c"))
      .groupBy("event_type")
      .agg(min(col("_day")).as("first_day"), max(col("_day")).as("last_day"),
        sort_array(collect_set(col("_day"))).as("_obs"))
      .withColumn("span_days", col("last_day") - col("first_day") + 1)
      .withColumn("observed_days", size(col("_obs")).cast("long"))
      .withColumn("missing",
        array_except(expr("sequence(first_day, last_day)"), col("_obs")))
      .select(col("event_type"), col("first_day"), col("last_day"),
        col("span_days"), col("observed_days"),
        size(col("missing")).cast("long").as("missing_days"),
        col("missing"))

  /** Lag-k autocorrelation of each type's daily count series — the
    * seasonality read ("is this metric weekly-periodic?") behind alerting
    * thresholds and forecast sanity checks. EXACT integer arithmetic: with
    * `n` observed days and `T = Σ cnt`, the centered deviation is
    * `d_t = cnt_t·n − T` (scaled by n so centering loses nothing), and
    * `r_k = (Σ_{t>k} d_t·d_{t−k}) · 1e6 div (Σ d_t²)` in signed ppm
    * (truncation toward zero on both engines — the SQL spelling
    * sign-splits `//` to match). Bound: |d| < ~3·10⁹·days keeps the i64
    * products exact — holds through billions of events/day on year-long
    * windows; shard longer horizons before correlating.
    *
    * Scale shape: identical to [[cusumChangepoint]] — the corpus collapses
    * to (type, day) counts first; the per-type series is a calendar-bounded
    * sorted array folded by codegen-friendly array expressions, never a
    * self-join of the series against its shifted self.
    *
    * Output per type: `(event_type, n_days, mean_milli, r1_ppm, r7_ppm)`;
    * r columns are null when the series is constant (zero variance) or
    * shorter than the lag. */
  def dailyAutocorrelation(events: DataFrame, typeCol: String,
      tsCol: String, lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"bad lags: $lags")
    val base = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"cast($tsCol as bigint) div 86400").as("_day"))
      .agg(count(lit(1)).as("_cnt"))
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("_day").as("day"),
        col("_cnt").as("cnt")))).as("_arr"))
      .withColumn("_n", size(col("_arr")).cast("long"))
      .withColumn("_tot", expr("aggregate(_arr, 0L, (a, x) -> a + x.cnt)"))
      // d_t = cnt_t·n − T  (exact centering, no division)
      .withColumn("_dev", expr("transform(_arr, x -> x.cnt * _n - _tot)"))
      .withColumn("_den", expr("aggregate(_dev, 0L, (a, x) -> a + x * x)"))
    val withLags = lags.foldLeft(base) { (df, k) =>
      df.withColumn(s"_num$k", expr(
        s"""CASE WHEN _n > $k THEN aggregate(
           |  zip_with(slice(_dev, $k + 1, cast(_n as int) - $k),
           |           slice(_dev, 1, cast(_n as int) - $k),
           |           (a, b) -> a * b), 0L, (a, x) -> a + x) END""".stripMargin))
        .withColumn(s"r${k}_ppm",
          when(col("_den") > 0 && col(s"_num$k").isNotNull,
            expr(s"_num$k * 1000000 div _den")))
    }
    withLags.select((Seq(col("event_type"), col("_n").as("n_days"),
      expr("_tot * 1000 div _n").as("mean_milli")) ++
      lags.map(k => col(s"r${k}_ppm"))): _*)
  }

  /** Exclusion funnel — "first A, then the first B after it, with NO C
    * strictly between": did the user sign up and then purchase WITHOUT
    * hitting an error in between? The exclusion step is the funnel shape
    * plain sequence matching can't express (FOLLOWED BY finds the pair;
    * it can't veto what happened inside the gap — the reference's sequence
    * grammar `commands/parser/ast.rs` has no NOT step either).
    *
    * Event order is the packed key `ts·2³² + event_id` (both engines
    * compare the same integer, so ties are (ts, id)-exact; valid while
    * event ids stay below 2³² — the testdata's ids are row ordinals —
    * AND epoch-second ts stays below 2³¹, i.e. before Jan 2038: past
    * that the signed-64-bit product wraps in Spark while DuckDB raises,
    * so the engines would diverge. Post-2038 corpora should order by a
    * `struct(ts, event_id)` instead of the packed long).
    *
    * Scale shape: three Window nodes over the SAME hash(context)
    * partitioning (first-A, first-B-after-A, any-C-between are each one
    * windowed conditional min/max), then the per-context collapse groups
    * on the partitioning key — ONE exchange serves the whole plan, no
    * joins, no per-step pass over the corpus.
    *
    * Output: `(context_id, a_ts, b_ts, excluded, converted_clean)` — one
    * row per context; `excluded` = a C fell inside the (A, B) gap;
    * `converted_clean` = B matched and nothing vetoed it. */
  def funnelExclusion(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String,
      stepA: String, stepB: String, excludeC: String): DataFrame = {
    val w = Window.partitionBy(col(ctxCol))
    val packed = col(tsCol).cast("long") * lit(4294967296L) +
      col(idCol).cast("long")
    events
      .select(col(ctxCol), col(typeCol), packed.as("_k"))
      .withColumn("_ka", min(when(col(typeCol) === stepA, col("_k"))).over(w))
      .withColumn("_kb", min(when(col(typeCol) === stepB &&
        col("_k") > col("_ka"), col("_k"))).over(w))
      .withColumn("_exc", max(when(col(typeCol) === excludeC &&
        col("_k") > col("_ka") && col("_k") < col("_kb"), lit(1))
        .otherwise(lit(0))).over(w))
      .groupBy(col(ctxCol))
      .agg(min(col("_ka")).as("_a"), min(col("_kb")).as("_b"),
        max(col("_exc")).as("_e"))
      .select(col(ctxCol),
        expr("_a div 4294967296").as("a_ts"),
        expr("_b div 4294967296").as("b_ts"),
        (col("_e") === 1).as("excluded"),
        (col("_b").isNotNull && col("_e") === 0).as("converted_clean"))
  }

  /** Engagement (stickiness): per active day, DAU, trailing-`windowDays`
    * WAU, and their ratio in ppm. The rolling distinct is computed WITHOUT
    * a per-day corpus scan: distinct (user, day) pairs explode to the ≤
    * `windowDays` window-end days they count toward (map-side ×7 on
    * already-deduplicated pairs), then one distinct + count per day — two
    * keyed shuffles, no self-join of the activity table against itself.
    *
    * Output: `day` (epoch seconds of day start), `dau`, `wau`,
    * `stickiness_ppm` = dau·1e6/wau (truncated); only days with activity
    * appear. */
  def engagement(events: DataFrame, ctxCol: String, tsCol: String,
      daySec: Long = 86400L, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = events
      .select(col(ctxCol).as("_ctx"),
        floor(col(tsCol).cast("double") / daySec).cast("long").as("_day"))
      .distinct()
    val dau = ud.groupBy("_day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("_ctx"),
        explode(sequence(col("_day"), col("_day") + (windowDays - 1))).as("_day"))
      .distinct()
      .groupBy("_day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("_day"))
      .select((col("_day") * daySec).as("day"), col("dau"), col("wau"),
        expr("(dau * 1000000) div wau").as("stickiness_ppm"))
  }

  /** Event transition matrix: counts of consecutive (from → to) event-type
    * pairs in each context's (timestamp, event_id) order, with the row-
    * conditional probability in ppm (`n · 1e6 / Σ n over the from-type`,
    * truncated) — the Markov "what happens next" report. One context-keyed
    * window pass + one small aggregation; the per-from totals ride on a
    * type-keyed window over the AGGREGATED matrix (≤ types² rows), never
    * over the events.
    *
    * Output: `from_type`, `to_type`, `n`, `p_ppm`. */
  def eventTransitions(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val byCtx = Window.partitionBy(col(ctxCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_from", lag(col(typeCol), 1).over(byCtx))
      .filter(col("_from").isNotNull)
      .groupBy(col("_from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("_tot", sum(col("n")).over(byFrom))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000) div _tot").as("p_ppm"))
  }

  /** RATE anomalies — the ratio sibling of [[anomalousDays]]: flag days
    * whose CONVERSION RATE (distinct contexts with a `convType` event ÷
    * distinct active contexts, in ppm) deviates from the trailing
    * `windowDays` rate by ≥ `thresholdPpm` (signed, truncated toward
    * zero). The trailing baseline is the RATIO OF SUMS (total converters
    * ÷ total actives over the window), not the mean of daily ratios —
    * low-traffic days would otherwise swing the baseline (the standard
    * rate-metric discipline). Days with no actives carry no rate and are
    * neither scored nor counted into baselines.
    *
    * Scale shape: the corpus collapses to distinct (context, day[, conv])
    * rows, then day-grain counts; trailing sums via the [[engagement]]
    * map-side window-end explosion — never a self-join.
    *
    * Output (flagged days only): day_start, n_active, n_conv, rate_ppm,
    * trail_rate_ppm, dev_ppm. */
  def anomalousRates(events: DataFrame, ctxCol: String, tsCol: String,
      typeCol: String, convType: String, windowDays: Int,
      thresholdPpm: Long): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val day = idiv(col(tsCol).cast("long"), lit(86400L))
    val perDay = events
      .select(col(ctxCol).as("_ctx"), day.as("_day"),
        (col(typeCol) === convType).cast("long").as("_c"))
      .groupBy("_ctx", "_day").agg(max(col("_c")).as("_c"))
      .groupBy("_day")
      .agg(count(lit(1)).as("_act"), sum(col("_c")).as("_cv"))
    val trailing = perDay
      .select(explode(sequence(col("_day") + 1, col("_day") + windowDays)).as("_day"),
        col("_act"), col("_cv"))
      .groupBy("_day")
      .agg(sum(col("_act")).as("_tact"), sum(col("_cv")).as("_tcv"))
    perDay.join(trailing, Seq("_day"))
      .filter(col("_tact") > 0)
      .withColumn("rate_ppm", idiv(col("_cv") * 1000000L, col("_act")))
      .withColumn("trail_rate_ppm", idiv(col("_tcv") * 1000000L, col("_tact")))
      .filter(col("trail_rate_ppm") > 0)
      .withColumn("dev_ppm",
        idiv((col("rate_ppm") - col("trail_rate_ppm")) * 1000000L,
          col("trail_rate_ppm")))
      .filter(abs(col("dev_ppm")) >= thresholdPpm)
      .select((col("_day") * 86400).as("day_start"),
        col("_act").as("n_active"), col("_cv").as("n_conv"),
        col("rate_ppm"), col("trail_rate_ppm"), col("dev_ppm"))
  }

  /** Steady-state event mix: the stationary distribution of the
    * [[eventTransitions]] Markov chain by power iteration — "if user
    * behavior keeps its current transition structure, what share of
    * activity does each event type converge to". The PageRank-style read
    * of the transition matrix, in EXACT integer ppm so an independent
    * engine replays every iteration bit-for-bit: v′_j = Σ_i v_i·p_ij
    * div 1e6 (truncating — mass leaks a few ppm per step and at types
    * with no outgoing transitions; the result is the fixed point of this
    * integer map, documented rather than renormalized).
    *
    * Scale shape: the matrix is TYPE-cardinality (the transition
    * aggregate's output), collected bounded; the iteration is driver-side
    * arithmetic on a k×k array — the corpus is touched exactly once, by
    * [[eventTransitions]] itself. */
  def steadyStateEventMix(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String, iters: Int = 32): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = events.sparkSession
    import spark.implicits._
    val trans = eventTransitions(events, ctxCol, tsCol, idCol, typeCol)
      .select(col("from_type"), col("to_type"), col("p_ppm"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val types = trans.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val n = types.size
    var v = Array.fill(n)(1000000L / n)
    (0 until iters).foreach { _ =>
      v = Array.tabulate(n) { j =>
        types.indices.map(i =>
          v(i) * trans.getOrElse((types(i), types(j)), 0L) / 1000000L).sum
      }
    }
    types.zip(v).toSeq.toDF(typeCol, "steady_ppm")
  }

  /** Cohort retention: bucket activity into fixed-width weeks (naive
    * epoch-floor buckets, the engine's PER WEEK naive semantics), cohort
    * each context by its FIRST active week, and count contexts active at
    * each (cohort, week-offset) cell.
    *
    * Two shuffles: one groupBy on the context (map-side-combined
    * `collect_set` of a user's active weeks — bounded by weeks-per-user,
    * not corpus size), one on the (cohort, offset) cell. No distinct-then-
    * window double pass.
    *
    * Output: `cohort_week` (epoch seconds of the cohort's first week),
    * `week_offset` (0 = the cohort week itself), `n_users`.
    */
  /** Calendar-aware cohort retention: weeks are CALENDAR weeks in `zone`
    * with the configured week start (reference
    * `shared/datetime/time_bucketing.rs:6-107` semantics via
    * [[graft.time.TimeBucketing]]) — the frame real cohort reports use,
    * where a week is Mon-00:00..Mon-00:00 LOCAL time and a DST-crossing
    * week (167/169 wall-clock hours) is still exactly one week.
    *
    * `week_offset` counts calendar weeks between LOCAL week-start dates
    * (always a multiple of 7 days in the local calendar, so the integer
    * division is exact); `cohort_week` is the epoch instant of the
    * cohort's local week-start midnight. Same two-shuffle shape and
    * bounded collect_set as the naive [[retentionCohorts]]. */
  def retentionCohortsCalendar(events: DataFrame, ctxCol: String, tsCol: String,
      zone: String = "UTC", weekStart: Int = 0): DataFrame = {
    import graft.time.TimeBucketing
    val wk = TimeBucketing.localWeekStartDate(col(tsCol).cast("long"), zone, weekStart)
    events
      .select(col(ctxCol).as("_ctx"), wk.as("_wk"))
      .groupBy("_ctx")
      .agg(min(col("_wk")).as("_cohort"), collect_set(col("_wk")).as("_wks"))
      .select(col("_cohort"), explode(col("_wks")).as("_wk"))
      .groupBy(col("_cohort"),
        (datediff(col("_wk"), col("_cohort")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        TimeBucketing.localDateToEpoch(col("_cohort"), zone).as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** Calendar-aware engagement: [[engagement]] with activity bucketed on
    * LOCAL calendar days in `zone` and the WAU window covering trailing
    * CALENDAR days (a DST-short day still counts as one day). Same
    * window-free map-side explosion shape. */
  def engagementCalendar(events: DataFrame, ctxCol: String, tsCol: String,
      zone: String = "UTC", windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    import graft.time.TimeBucketing
    val d = TimeBucketing.localDate(col(tsCol).cast("long"), zone)
    val ud = events.select(col(ctxCol).as("_ctx"), d.as("_day")).distinct()
    val dau = ud.groupBy("_day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("_ctx"),
        explode(sequence(col("_day"), date_add(col("_day"), windowDays - 1))).as("_day"))
      .distinct()
      .groupBy("_day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("_day"))
      .select(TimeBucketing.localDateToEpoch(col("_day"), zone).as("day"),
        col("dau"), col("wau"),
        expr("(dau * 1000000) div wau").as("stickiness_ppm"))
  }

  def retentionCohorts(events: DataFrame, ctxCol: String, tsCol: String,
      weekSec: Long = 604800L): DataFrame = {
    require(weekSec > 0, s"weekSec must be positive, got $weekSec")
    val wk = floor(col(tsCol).cast("double") / weekSec).cast("long")
    events
      .select(col(ctxCol).as("_ctx"), wk.as("_wk"))
      .groupBy("_ctx")
      .agg(min(col("_wk")).as("_cohort"), collect_set(col("_wk")).as("_wks"))
      .select(col("_cohort"), explode(col("_wks")).as("_wk"))
      .groupBy(col("_cohort"), (col("_wk") - col("_cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        (col("_cohort") * weekSec).as("cohort_week"),
        col("week_offset"),
        col("n_users"))
  }

  /** ROLLING retention: a cohort user counts as retained at offset w if
    * active at ANY week offset ≥ w ("came back at or after week w") — the
    * other standard retention read (classic/N-day retention is
    * [[retentionCohorts]]'s exact-week membership). Monotonically
    * non-increasing in w by construction, which is why growth teams
    * prefer it for trend lines.
    *
    * Scale shape: the corpus collapses to one (cohort, max_offset) row
    * per user (two bounded aggregations), then each user expands to
    * max_offset+1 rows — bounded by weeks-per-user, same as the
    * collect_set in the classic variant. No window.
    *
    * Output: cohort_week, week_offset, n_retained. */
  def retentionRolling(events: DataFrame, ctxCol: String, tsCol: String,
      weekSec: Long = 604800L): DataFrame = {
    require(weekSec > 0, s"weekSec must be positive, got $weekSec")
    val wk = floor(col(tsCol).cast("double") / weekSec).cast("long")
    events
      .select(col(ctxCol).as("_ctx"), wk.as("_wk"))
      .groupBy("_ctx")
      .agg(min(col("_wk")).as("_cohort"), max(col("_wk")).as("_last"))
      .select(col("_cohort"),
        explode(sequence(lit(0L), col("_last") - col("_cohort"))).as("week_offset"))
      .groupBy(col("_cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_retained"))
      .select((col("_cohort") * weekSec).as("cohort_week"),
        col("week_offset"), col("n_retained"))
  }

  /** Volume-anomaly detection on daily event counts: flag (type, day)
    * pairs whose count deviates from the trailing `windowDays`-day mean by
    * at least `thresholdPpm` (signed, truncated toward zero) — the ops
    * question "did any event type spike or crater today".
    *
    * Days with NO events are densified to zero counts (per-type
    * `sequence(min_day, max_day)` — bounded by the type's span), so a
    * crater to zero is flagged, not silently absent. The first
    * `windowDays` days of each type have no full trailing window and are
    * not scored.
    *
    * Scale shape: raw events collapse to day grain in ONE partial+final
    * aggregation; everything after runs on (type, day) rows — bounded by
    * types × span, millions of times smaller than the input. The trailing
    * sum is the [[engagement]] map-side explosion (each day contributes to
    * its next `windowDays` window-ends), never a self-join of the raw
    * table and never a window over event rows.
    *
    * Output: type, `day_start` (epoch sec), `cnt`, `trail_total`,
    * `dev_ppm` — flagged rows only. */
  def anomalousDays(events: DataFrame, typeCol: String, tsCol: String,
      windowDays: Int, thresholdPpm: Long): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    require(thresholdPpm >= 0, s"thresholdPpm must be >= 0, got $thresholdPpm")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val day = idiv(col(tsCol).cast("long"), lit(86400L))
    val counts = events.groupBy(col(typeCol).as("_et"), day.as("_day"))
      .agg(count(lit(1)).as("_cnt"))
    val span = counts.groupBy("_et").agg(min("_day").as("_d0"), max("_day").as("_d1"))
    val dense = span
      .select(col("_et"), col("_d0"), explode(sequence(col("_d0"), col("_d1"))).as("_day"))
      .join(counts, Seq("_et", "_day"), "left_outer")
      .select(col("_et"), col("_d0"), col("_day"),
        coalesce(col("_cnt"), lit(0L)).as("_cnt"))
    val trailing = counts // zero days contribute nothing to any window
      .select(col("_et"),
        explode(sequence(col("_day") + 1, col("_day") + windowDays)).as("_day"),
        col("_cnt"))
      .groupBy("_et", "_day").agg(sum("_cnt").as("_trail"))
    dense.join(trailing, Seq("_et", "_day"), "left_outer")
      .select(col("_et"), col("_d0"), col("_day"), col("_cnt"),
        coalesce(col("_trail"), lit(0L)).as("_trail"))
      .filter(col("_day") >= col("_d0") + windowDays && col("_trail") > 0)
      .withColumn("dev_ppm",
        idiv((col("_cnt") * windowDays - col("_trail")) * 1000000L, col("_trail")))
      .filter(abs(col("dev_ppm")) >= thresholdPpm)
      .select(col("_et").as(typeCol), (col("_day") * 86400).as("day_start"),
        col("_cnt").as("cnt"), col("_trail").as("trail_total"), col("dev_ppm"))
  }

  /** Per-context carry state for INCREMENTAL sessionization: the last
    * session's 0-based index and final event timestamp, distilled from a
    * [[sessionize]] output (or a previous incremental round). One
    * max-struct aggregate — rows = live contexts. */
  def sessionState(sessions: DataFrame, ctxCol: String): DataFrame =
    sessions.groupBy(col(ctxCol))
      .agg(max(struct(col("session_idx"), col("end_ts"))).as("_m"))
      .select(col(ctxCol), col("_m.session_idx").as("last_idx"),
        col("_m.end_ts").as("last_ts"))

  /** Incremental (nightly) sessionization: assign session indexes to a NEW
    * batch of events given the carry state of everything already
    * sessionized — the production shape where the event history is never
    * rescanned (the [[graft.pipeline.Dedup.DedupArtifacts]] boundary for
    * sessions). A batch event continues its context's last open session
    * when its gap from the carried `last_ts` is within `gapSec`, otherwise
    * starts session `last_idx + 1`; contexts absent from the state start
    * at 0. Batch events must not predate the state's `last_ts` (the same
    * append-only contract the batch gap rule assumes).
    *
    * Correctness contract (oracle-checked): for any split of the corpus
    * at a time boundary, `assignSessionsIncremental(night2,
    * sessionState(sessionize(night1)))` equals the full-corpus
    * [[assignSessions]] restricted to night-2 events.
    *
    * Scale shape: ONE shuffle on the context key shared by the state join
    * and the windows (state is context-grain — orders of magnitude
    * smaller than history); the batch is typically a day, not the corpus.
    *
    * Output: the batch rows + `session_idx`. */
  def assignSessionsIncremental(newEvents: DataFrame, state: DataFrame,
      ctxCol: String, tsCol: String, idCol: String, gapSec: Long): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val byCtx = Window.partitionBy(col(ctxCol)).orderBy(col(tsCol), col(idCol))
    val run = byCtx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    newEvents
      .join(state.select(col(ctxCol), col("last_idx"), col("last_ts")),
        Seq(ctxCol), "left")
      .withColumn("_prev_ts", coalesce(lag(col(tsCol), 1).over(byCtx), col("last_ts")))
      .withColumn("_new_session",
        (col("_prev_ts").isNull || col(tsCol) - col("_prev_ts") > gapSec).cast("long"))
      .withColumn("session_idx",
        coalesce(col("last_idx"), lit(-1L)) + sum(col("_new_session")).over(run))
      .drop("_prev_ts", "_new_session", "last_idx", "last_ts")
  }

  /** A/B experiment readout: contexts are hash-assigned to `nVariants`
    * arms (deterministic salted md5 of the context id — the standard
    * stable-bucketing assignment, reproducible by any engine), and each
    * arm reports its user count, converter count (contexts with ≥ 1
    * `convType` event), conversion rate in ppm, and lift vs the control
    * arm (variant 0) in ppm of the control's rate. All rate arithmetic is
    * integer (truncated toward zero), so an independent engine reproduces
    * every ppm bit-for-bit.
    *
    * Scale shape: ONE context-grain aggregation collapses the corpus
    * (map-side partials absorb per-user event counts), then an
    * arm-cardinality aggregate; the control row joins back as a
    * single-row broadcast. No window, nothing corpus-sized past the first
    * exchange.
    *
    * Output: variant, users, converters, conv_ppm, lift_ppm (0 for the
    * control arm). */
  def experimentLift(events: DataFrame, ctxCol: String, typeCol: String,
      convType: String, nVariants: Int, salt: String = "ab"): DataFrame = {
    require(nVariants >= 2, s"an experiment needs >= 2 variants, got $nVariants")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val variant = pmod(Hashing.md5Long(
      concat(lit(s"$salt:"), col(ctxCol).cast("string"))), lit(nVariants.toLong))
    val perUser = events
      .select(variant.as("variant"), col(ctxCol).as("_ctx"),
        (col(typeCol) === convType).cast("long").as("_conv"))
      .groupBy(col("variant"), col("_ctx"))
      .agg(max(col("_conv")).as("_conv"))
    val arms = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("users"), sum(col("_conv")).as("converters"))
      .withColumn("conv_ppm", idiv(col("converters") * 1000000L, col("users")))
    val control = arms.filter(col("variant") === 0)
      .select(col("conv_ppm").as("_ctl_ppm"))
    arms.crossJoin(broadcast(control))
      .withColumn("lift_ppm",
        idiv((col("conv_ppm") - col("_ctl_ppm")) * 1000000L, col("_ctl_ppm")))
      .select(col("variant"), col("users"), col("converters"),
        col("conv_ppm"), col("lift_ppm"))
  }

  /** POWER-USER CURVE: users bucketed into activity deciles (bounds = the
    * exact interior percentiles of per-user event counts, ties down — the
    * strata convention), each decile reporting its user count, event
    * count, and share of ALL events in ppm — the concentration read
    * ("the top decile drives X% of activity") behind every engagement
    * strategy. One user-grain collapse, one bounded percentile row,
    * decile-cardinality output.
    *
    * Output: decile (0 = least active), n_users, n_events, share_ppm. */
  def powerCurve(events: DataFrame, ctxCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val perUser = events.groupBy(col(ctxCol)).agg(count(lit(1)).as("_n"))
    val fracs = (1 until nBins).map(_.toDouble / nBins)
    val bounds = perUser
      .agg(transform(percentile(col("_n"), array(fracs.map(lit): _*)),
        b => round(b, 6)).as("bs"))
      .head.getSeq[Double](0)
    val decile = bounds.foldLeft(lit(0L): Column) { (acc, b) =>
      acc + (col("_n") > lit(b)).cast("long")
    }
    val byDecile = perUser.withColumn("decile", decile)
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum(col("_n")).as("n_events"))
    val total = broadcast(byDecile.agg(sum(col("n_events")).as("_t")))
    byDecile.crossJoin(total)
      .select(col("decile"), col("n_users"), col("n_events"),
        expr("(n_events * 1000000) div _t").as("share_ppm"))
  }

  /** Frequent behavioral n-grams: the top contiguous `n`-step event-type
    * sequences across all sessions — sequential-pattern mining's bread
    * and butter ("what 3-step motifs dominate"), complementing
    * [[topPaths]] (whole-journey prefixes) with within-journey motifs.
    * Same single context exchange; per-session n-grams are a map-side
    * generator over the session's own (bounded) event list; counting is
    * an ordinary aggregate and the ranking a bounded TakeOrdered.
    *
    * Output: pattern (types joined by `>`), n_occurrences — `topN` by
    * (count DESC, pattern ASC). */
  def topSequences(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSec: Long,
      n: Int, topN: Int): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(topN > 0, s"topN must be positive, got $topN")
    val se = assignSessions(events, ctxCol, tsCol, idCol, gapSec)
    se.groupBy(col(ctxCol), col("session_idx"))
      .agg(expr("transform(sort_array(collect_list(struct(" +
        s"cast($tsCol as long) as t, cast($idCol as long) as i, $typeCol as y" +
        "))), e -> e.y)").as("_ys"))
      .select(explode(Dedup.wordGrams(col("_ys"), n)).as("_g"))
      // wordGrams joins with spaces; the report convention is '>'
      .select(regexp_replace(col("_g"), " ", ">").as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pattern").asc)
      .limit(topN)
  }

  /** GROWTH ACCOUNTING — the standard DAU decomposition: every active
    * (context, day) is classified `new` (first day ever), `retained`
    * (also active the previous day), or `resurrected` (returning after a
    * gap), and every lapse produces a `churned` row on the first inactive
    * day (the day after the last activity of a run — including the run
    * ending at the corpus edge, which is the correct churn date for it).
    * By construction: actives(d) = new + retained + resurrected, and
    * retained(d+1) + churned(d+1) = actives(d).
    *
    * Scale shape: the corpus collapses to distinct (context, day) rows,
    * then ONE context-keyed exchange serves the lag/lead windows
    * (per-user state = that user's active-day list), and the output is a
    * day-grain aggregate. No self-joins, no corpus-sized windows.
    *
    * Output: day_start, n_new, n_retained, n_resurrected, n_churned. */
  def growthAccounting(events: DataFrame, ctxCol: String, tsCol: String): DataFrame = {
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val days = events
      .select(col(ctxCol).as("_ctx"),
        idiv(col(tsCol).cast("long"), lit(86400L)).as("_day"))
      .distinct()
    val byCtx = Window.partitionBy(col("_ctx")).orderBy(col("_day"))
    val marked = days
      .withColumn("_prev", lag(col("_day"), 1).over(byCtx))
      .withColumn("_next", lead(col("_day"), 1).over(byCtx))
      .withColumn("_kind",
        when(col("_prev").isNull, "new")
          .when(col("_day") - col("_prev") === 1, "retained")
          .otherwise("resurrected"))
    val active = marked.groupBy(col("_day"))
      .agg(
        sum((col("_kind") === "new").cast("long")).as("n_new"),
        sum((col("_kind") === "retained").cast("long")).as("n_retained"),
        sum((col("_kind") === "resurrected").cast("long")).as("n_resurrected"))
    val churn = marked
      .filter(col("_next").isNull || col("_next") > col("_day") + 1)
      .groupBy((col("_day") + 1).as("_day"))
      .agg(count(lit(1)).as("n_churned"))
    active.join(churn, Seq("_day"), "full_outer")
      .select((col("_day") * 86400).as("day_start"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** RFM segmentation — the classic customer-value grid: per context,
    * Recency (days since last `purchaseType` event, measured from the
    * corpus's own max timestamp), Frequency (event count), Monetary
    * (exact revenue cents), each scored into `nBins` corpus-relative
    * quantile bins (bounds = exact interior percentiles, 6 dp parity
    * regime, collected bounded; ties fall to the lower bin). R inverts so
    * R=`nBins` means MOST recent — the marketing convention; the segment
    * label concatenates the three scores ("R5F4M3").
    *
    * Scale shape: one context-grain aggregate collapses the corpus, one
    * bounded percentile row per dimension, scoring map-side — no window,
    * nothing context-cardinality ever sorts globally. */
  def rfmSegments(events: DataFrame, ctxCol: String, tsCol: String,
      typeCol: String, valueCol: String, purchaseType: String,
      nBins: Int = 5): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val p = events.filter(col(typeCol) === purchaseType)
    val anchor = p.agg(max(col(tsCol).cast("long"))).head.getLong(0)
    val perUser = p.groupBy(col(ctxCol))
      .agg(
        call_function("div", lit(anchor) - max(col(tsCol).cast("long")), lit(86400L))
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(expr(s"cast(round($valueCol * 100) as bigint)")).as("monetary_cents"))
    val fracs = (1 until nBins).map(_.toDouble / nBins)
    def boundsOf(c: String): Seq[Double] = perUser
      .agg(transform(percentile(col(c), array(fracs.map(lit): _*)),
        b => round(b, 6)).as("bs"))
      .head.getSeq[Double](0)
    def binUp(c: String, bs: Seq[Double]): Column =
      bs.foldLeft(lit(1L): Column) { (acc, b) => acc + (col(c) > lit(b)).cast("long") }
    val rB = boundsOf("recency_days")
    val fB = boundsOf("frequency")
    val mB = boundsOf("monetary_cents")
    perUser
      .withColumn("r_score", lit(nBins.toLong + 1) - binUp("recency_days", rB))
      .withColumn("f_score", binUp("frequency", fB))
      .withColumn("m_score", binUp("monetary_cents", mB))
      .withColumn("segment", concat(lit("R"), col("r_score"),
        lit("F"), col("f_score"), lit("M"), col("m_score")))
  }

  /** Sample-ratio-mismatch (SRM) guardrail for [[experimentLift]]: the
    * FIRST thing an experimentation platform checks — if the hash
    * assignment didn't land users on the expected equal split, every
    * downstream lift number is suspect (bots, filtering bias, a broken
    * salt). Per arm: observed users, expected users (milli-units), and
    * the arm's chi-square contribution `(obs·k − total)² / (k·total)` in
    * micro-units — the reader sums contributions and compares against the
    * χ²(k−1) critical value. Arithmetic runs in decimal(38,0) so the
    * squared term cannot overflow at billions of users, then truncates to
    * integer micro-units (engine-exact).
    *
    * Scale shape: one user-grain collapse (the [[experimentLift]]
    * exchange), arm-cardinality rows after, totals a 1-row broadcast. */
  def srmCheck(events: DataFrame, ctxCol: String, nVariants: Int,
      salt: String = "ab"): DataFrame = {
    require(nVariants >= 2, s"an experiment needs >= 2 variants, got $nVariants")
    val variant = pmod(Hashing.md5Long(
      concat(lit(s"$salt:"), col(ctxCol).cast("string"))), lit(nVariants.toLong))
    val arms = events.select(variant.as("variant"), col(ctxCol).as("_ctx"))
      .groupBy("variant", "_ctx").agg(lit(1))
      .groupBy("variant").agg(count(lit(1)).as("users"))
    val total = broadcast(arms.agg(sum(col("users")).as("_total")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    arms.crossJoin(total)
      .select(col("variant"), col("users"),
        call_function("div", col("_total") * 1000L, lit(nVariants.toLong))
          .as("exp_users_milli"),
        (dec(col("users") * nVariants - col("_total")) *
          dec(col("users") * nVariants - col("_total")) * dec(lit(1000000L)) /
          dec(lit(nVariants.toLong) * col("_total"))).cast("bigint")
          .as("chi2_micro"))
  }

  /** Top-N session paths: each session's journey as the `maxLen`-prefix of
    * its event-type sequence in (timestamp, event_id) order, joined with
    * `>`, counted across all sessions, top `topN` by (count DESC, path
    * ASC) — the "what do users actually do" flow report.
    *
    * Scale shape: session assembly reuses the single hash(context)
    * exchange of [[assignSessions]]; per-session state is one session's
    * events (the sessionization bound) and the emitted path string is
    * capped at `maxLen` steps regardless of session length. Path counting
    * is an ordinary partial+final aggregate on the path string (distinct
    * paths ≪ sessions), and the final ranking is a bounded
    * TakeOrderedAndProject — no global sort.
    *
    * Output: path, n_sessions. */
  def topPaths(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSec: Long,
      maxLen: Int, topN: Int): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    require(topN > 0, s"topN must be positive, got $topN")
    val se = assignSessions(events, ctxCol, tsCol, idCol, gapSec)
    val path = se.groupBy(col(ctxCol), col("session_idx"))
      .agg(sort_array(collect_list(struct(col(tsCol).cast("long").as("t"),
        col(idCol).cast("long").as("i"), col(typeCol).as("y")))).as("_evs"))
      .select(concat_ws(">",
        expr(s"transform(slice(_evs, 1, $maxLen), e -> e.y)")).as("path"))
    path.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topN)
  }

  /** Session entry/exit (landing/exit-page) report: each session's entry
    * type (first event in (timestamp, event_id) order), exit type (last
    * event), bounce flag (single-event session), rolled up per
    * (entry, exit) pair — the landing-page performance table web
    * analytics leads with.
    *
    * One aggregation on (context, session) after [[assignSessions]] (the
    * hash(context) exchange serves it), then one small aggregation on the
    * (entry, exit) matrix (≤ types² rows). Entry/exit come from struct
    * min/max over (ts, id, type) — (ts, id) is unique per event, so the
    * type rides along deterministically; no window, no self-join.
    *
    * Output: entry_type, exit_type, n_sessions, n_bounces, bounce_ppm
    * (truncated), total_duration_s. */
  def sessionEntryExit(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSec: Long): DataFrame = {
    val se = assignSessions(events, ctxCol, tsCol, idCol, gapSec)
    val ev = struct(col(tsCol).cast("long").as("t"),
      col(idCol).cast("long").as("i"), col(typeCol).as("y"))
    val sessions = se.groupBy(col(ctxCol), col("session_idx"))
      .agg(min(ev).as("_in"), max(ev).as("_out"), count(lit(1)).as("_n"))
    sessions
      .groupBy(col("_in.y").as("entry_type"), col("_out.y").as("exit_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum((col("_n") === 1).cast("long")).as("n_bounces"),
        sum(col("_out.t") - col("_in.t")).as("total_duration_s"))
      .select(col("entry_type"), col("exit_type"), col("n_sessions"),
        col("n_bounces"),
        expr("(n_bounces * 1000000) div n_sessions").as("bounce_ppm"),
        col("total_duration_s"))
  }

  /** Churn life table (the discrete Kaplan–Meier risk sets, in exact
    * integers): each context's lifetime is `last_day − first_day` (days,
    * epoch-floor); a context has CHURNED if its last activity is more
    * than `horizonDays` before the corpus's last active day, else it is
    * CENSORED (still alive at observation end). For every observed
    * lifetime t: `n_risk` = contexts with lifetime ≥ t, `n_churn` /
    * `n_censored` = contexts ending at exactly t, and the discrete hazard
    * `n_churn·1e6 div n_risk` — the life table a survival curve is read
    * from. Kept at the table (hazard) grain: the KM product is a
    * float cumulative product with engine-dependent rounding, while every
    * column here is exact.
    *
    * Scale shape: ONE corpus scan — the per-context rows AND the
    * corpus-end scalar come out of a single GROUPING SETS aggregation
    * ((context), ()), so the 1-row global branch is a ReusedExchange of
    * the per-context shuffle instead of a second scan-and-shuffle of the
    * corpus. The scalar cross-joins back (broadcast); the life table
    * itself is ≤ distinct-lifetime rows, and the descending-cumulative
    * n_risk is a window over THAT aggregated table, never over events.
    *
    * Output: t_days, n_end, n_churn, n_censored, n_risk, hazard_ppm. */
  def churnLifeTable(events: DataFrame, ctxCol: String, tsCol: String,
      horizonDays: Long): DataFrame = {
    require(horizonDays >= 0, s"horizonDays must be >= 0, got $horizonDays")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val day = idiv(col(tsCol).cast("long"), lit(86400L))
    val perCtxAll = events
      .select(col(ctxCol).as("_ctx"), day.as("_day"))
      .groupingSets(Seq(Seq(col("_ctx")), Seq.empty), col("_ctx"))
      .agg(min(col("_day")).as("_first"), max(col("_day")).as("_last"),
        grouping_id().as("_gid"))
    val perCtx = perCtxAll.filter(col("_gid") === 0)
      .select(col("_first"), col("_last"))
    val corpusEnd = perCtxAll.filter(col("_gid") =!= 0)
      .select(col("_last").as("_end"))
    val lives = perCtx.crossJoin(corpusEnd) // 1-row side: broadcast NL join
      .select((col("_last") - col("_first")).as("t_days"),
        (col("_last") + horizonDays < col("_end")).cast("long").as("_churn"))
      .groupBy("t_days")
      .agg(count(lit(1)).as("n_end"), sum(col("_churn")).as("n_churn"))
    val riskW = Window.orderBy(col("t_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // single-partition window over the AGGREGATED life table (≤ distinct
    // lifetimes rows) — the corpus never flows through it
    lives
      .withColumn("n_risk", sum(col("n_end")).over(riskW))
      .select(col("t_days"), col("n_end"), col("n_churn"),
        (col("n_end") - col("n_churn")).as("n_censored"), col("n_risk"),
        idiv(col("n_churn") * 1000000L, col("n_risk")).as("hazard_ppm"))
  }

  /** Cohort LTV: revenue retention by first-activity cohort — per
    * (cohort bucket, bucket offset): active contexts, period revenue, the
    * cohort's cumulative revenue through that offset, and cumulative
    * revenue per cohort user. Revenue is milli-quantized BEFORE summing
    * (the corpus-report discipline: aggregation-order-proof integers);
    * `ltv_milli` divides by the cohort's size (its offset-0 active count —
    * every cohort member is active in their first bucket by definition).
    *
    * Scale shape: the corpus collapses map-side-combined to
    * (context, bucket) revenue rows, then ONE context-keyed aggregation
    * pins each context's cohort alongside its bucket list (bounded by
    * buckets-per-context — the retention collect_set bound), exploding
    * straight to (cohort, offset) cells: no cohort join, no re-shuffle of
    * the bucket table. The cumulative sum is a window over the
    * (cohort, offset) MATRIX (≤ buckets² rows), never over events.
    *
    * Output: cohort_start (epoch sec), bucket_offset, n_active,
    * revenue_milli, cum_revenue_milli, cohort_size, ltv_milli. */
  def cohortLtv(events: DataFrame, ctxCol: String, tsCol: String,
      valueCol: String, bucketSec: Long = 604800L): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val bk = idiv(col(tsCol).cast("long"), lit(bucketSec))
    val perCtxBucket = events
      .select(col(ctxCol).as("_ctx"), bk.as("_bk"),
        expr(s"cast(round($valueCol * 1000) as bigint)").as("_vm"))
      .groupBy("_ctx", "_bk")
      .agg(sum(col("_vm")).as("_rev"))
    val cells = perCtxBucket
      .groupBy("_ctx")
      .agg(min(col("_bk")).as("_cohort"),
        collect_list(struct(col("_bk"), col("_rev"))).as("_bks"))
      .select(col("_cohort"), explode(col("_bks")).as("_e"))
      .groupBy(col("_cohort"), (col("_e._bk") - col("_cohort")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_active"), sum(col("_e._rev")).as("revenue_milli"))
    val cumW = Window.partitionBy(col("_cohort")).orderBy(col("bucket_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sizeW = Window.partitionBy(col("_cohort"))
    cells
      .withColumn("cum_revenue_milli", sum(col("revenue_milli")).over(cumW))
      .withColumn("cohort_size",
        max(when(col("bucket_offset") === 0, col("n_active"))).over(sizeW))
      .select((col("_cohort") * bucketSec).as("cohort_start"),
        col("bucket_offset"), col("n_active"), col("revenue_milli"),
        col("cum_revenue_milli"), col("cohort_size"),
        idiv(col("cum_revenue_milli"), col("cohort_size")).as("ltv_milli"))
  }

  /** Mann–Whitney U (rank-sum) between two hash-assigned experiment arms
    * over a per-event metric — the NONPARAMETRIC significance read that
    * doesn't assume the metric's distribution (the z-test sibling of
    * [[experimentLift]] assumes proportions). U is computed from
    * VALUE-GRAIN counts, never a global row ranking:
    * `U2_A = Σ_v nA(v)·(2·nB(<v) + nB(=v))` — doubled so tie halves stay
    * integral, hence exact on any engine. The cumulative runs over the
    * DISTINCT-VALUE table (bounded by metric cardinality, the histogram-
    * quantiles bound), so no corpus-sized single-partition sort exists.
    * `U2_A + U2_B = 2·nA·nB` is the built-in self-check.
    *
    * Output (one row): n_a, n_b, u2_a, u2_b. */
  def mannWhitneyU(events: DataFrame, ctxCol: String, valueCol: String,
      salt: String = "ab"): DataFrame = {
    val arm = pmod(graft.pipeline.Hashing.md5Long(
      concat(lit(s"$salt:"), col(ctxCol).cast("string"))), lit(2L))
    val g = events
      .select(arm.as("_arm"),
        expr(s"cast(round($valueCol * 1000) as bigint)").as("_vm"))
      .groupBy("_vm")
      .agg(sum((col("_arm") === 0).cast("long")).as("_na"),
        sum((col("_arm") === 1).cast("long")).as("_nb"))
    val below = Window.orderBy(col("_vm"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // single-partition window over the distinct-value table only
    g.withColumn("_cumA", coalesce(sum(col("_na")).over(below), lit(0L)))
      .withColumn("_cumB", coalesce(sum(col("_nb")).over(below), lit(0L)))
      .agg(sum(col("_na")).as("n_a"), sum(col("_nb")).as("n_b"),
        sum(col("_na") * (col("_cumB") * 2 + col("_nb"))).as("u2_a"),
        sum(col("_nb") * (col("_cumA") * 2 + col("_na"))).as("u2_b"))
  }

  /** Robust A/B comparison: EXACT trimmed and winsorized means per arm —
    * the outlier-proof read of a revenue experiment (one whale in arm B
    * should not decide the launch; the plain mean lets it). `trimPct`% of
    * each tail is dropped (trimmed) or clamped to the cut values
    * (winsorized); all means are integer milli-units of the value column,
    * computed from VALUE-GRAIN counts exactly like [[mannWhitneyU]]: the
    * corpus collapses to one row per distinct milli-value first, so the
    * single-partition rank window runs over the bounded distinct-value
    * table, never the event table. Rank clipping per grain is
    * `max(0, min(cum+cnt, n−k) − max(cum, k))` — exact positional trim,
    * ties handled by count mass, no row numbering.
    *
    * Output: ONE row — per-arm n, trim count k, plain/trimmed/winsorized
    * means (milli, truncating div), and `trimmed_diff_milli` (B − A). */
  def trimmedMeans(events: DataFrame, ctxCol: String, valueCol: String,
      trimPct: Int = 10, salt: String = "ab"): DataFrame = {
    require(trimPct >= 0 && trimPct < 50, s"trimPct must be in [0,50), got $trimPct")
    val arm = pmod(graft.pipeline.Hashing.md5Long(
      concat(lit(s"$salt:"), col(ctxCol).cast("string"))), lit(2L))
    val g = events
      .select(arm.as("_arm"),
        expr(s"cast(round($valueCol * 1000) as bigint)").as("_vm"))
      .groupBy("_vm")
      .agg(sum((col("_arm") === 0).cast("long")).as("_na"),
        sum((col("_arm") === 1).cast("long")).as("_nb"))
    // single-partition windows over the distinct-value table only (the
    // mannWhitneyU precedent); totals ride the same window pass
    val below = Window.orderBy(col("_vm"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.orderBy(col("_vm"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val ranked = g
      .withColumn("_cumA", coalesce(sum(col("_na")).over(below), lit(0L)))
      .withColumn("_cumB", coalesce(sum(col("_nb")).over(below), lit(0L)))
      .withColumn("_n_a", sum(col("_na")).over(all))
      .withColumn("_n_b", sum(col("_nb")).over(all))
      .withColumn("_k_a", idiv(col("_n_a") * trimPct, lit(100L)))
      .withColumn("_k_b", idiv(col("_n_b") * trimPct, lit(100L)))
      .withColumn("_keepA", greatest(lit(0L),
        least(col("_cumA") + col("_na"), col("_n_a") - col("_k_a")) -
          greatest(col("_cumA"), col("_k_a"))))
      .withColumn("_keepB", greatest(lit(0L),
        least(col("_cumB") + col("_nb"), col("_n_b") - col("_k_b")) -
          greatest(col("_cumB"), col("_k_b"))))
    val agg = ranked.agg(
      max(col("_n_a")).as("n_a"), max(col("_n_b")).as("n_b"),
      max(col("_k_a")).as("trim_k_a"), max(col("_k_b")).as("trim_k_b"),
      sum(col("_na") * col("_vm")).as("_totA"),
      sum(col("_nb") * col("_vm")).as("_totB"),
      sum(col("_keepA") * col("_vm")).as("_ttA"),
      sum(col("_keepB") * col("_vm")).as("_ttB"),
      // winsor cut values: the milli-values at ranks k+1 and n-k
      min(when(col("_cumA") + col("_na") > col("_k_a"), col("_vm"))).as("_loA"),
      min(when(col("_cumB") + col("_nb") > col("_k_b"), col("_vm"))).as("_loB"),
      min(when(col("_cumA") + col("_na") >= col("_n_a") - col("_k_a"),
        col("_vm"))).as("_hiA"),
      min(when(col("_cumB") + col("_nb") >= col("_n_b") - col("_k_b"),
        col("_vm"))).as("_hiB"))
    agg.select(
      col("n_a"), col("n_b"), col("trim_k_a"), col("trim_k_b"),
      idiv(col("_totA"), col("n_a")).as("mean_a_milli"),
      idiv(col("_totB"), col("n_b")).as("mean_b_milli"),
      idiv(col("_ttA"), col("n_a") - col("trim_k_a") * 2).as("trimmed_a_milli"),
      idiv(col("_ttB"), col("n_b") - col("trim_k_b") * 2).as("trimmed_b_milli"),
      idiv(col("_ttA") + col("trim_k_a") * (col("_loA") + col("_hiA")),
        col("n_a")).as("winsor_a_milli"),
      idiv(col("_ttB") + col("trim_k_b") * (col("_loB") + col("_hiB")),
        col("n_b")).as("winsor_b_milli"),
      (idiv(col("_ttB"), col("n_b") - col("trim_k_b") * 2) -
        idiv(col("_ttA"), col("n_a") - col("trim_k_a") * 2))
        .as("trimmed_diff_milli"))
  }

  /** Unordered SET-COMPLETION funnel: per session, how many of the
    * `steps` types occurred (any order, any multiplicity) and whether all
    * did — the "activation checklist" read (ordered paths are
    * [[sessionFunnelK]]'s job). One aggregation on (context, session)
    * after [[assignSessions]]; the distinct-step state is bounded by
    * |steps|.
    *
    * Output: context, session_idx, n_events, n_done, completed. */
  def sessionSetCompletion(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSec: Long,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "sessionSetCompletion needs at least one step")
    assignSessions(events, ctxCol, tsCol, idCol, gapSec)
      .groupBy(col(ctxCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(when(col(typeCol).isin(steps: _*), col(typeCol)))
          .as("n_done"))
      .withColumn("completed", col("n_done") === steps.size)
  }

  /** Within-session event-type co-occurrence (market-basket lift): for
    * every unordered type pair {a, b}, the number of sessions containing
    * BOTH, its support, and the lift
    * `n_ab · n_sessions · 1e6 div (n_a · n_b)` (ppm, truncated) — the
    * "what do users do together in one sitting" report.
    *
    * Scale shape: ONE corpus pass — each session's distinct-type set
    * (bounded like the retention collect_set) explodes map-side into its
    * a<b pairs PLUS one (t, t) self row per type PLUS one ("", "")
    * sentinel, so a single aggregation yields the pair counts, the
    * per-type session counts, AND the total session count together. That
    * matrix (≤ types² + types + 1 rows) is localCheckpoint'd — a filter
    * on grouping columns would otherwise push BELOW the aggregate and
    * split the plan back into three corpus scans — and the lift joins run
    * on the matrix only (broadcast-sized by construction).
    *
    * Output: a, b, n_ab, n_a, n_b, n_sessions, support_ppm, lift_ppm. */
  def sessionCooccurrence(events: DataFrame, ctxCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSec: Long): DataFrame = {
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val se = assignSessions(events, ctxCol, tsCol, idCol, gapSec)
    val probes = se
      .groupBy(col(ctxCol), col("session_idx"))
      .agg(array_sort(collect_set(col(typeCol))).as("_ts"))
      .select(explode(concat(
        expr("""flatten(transform(_ts, (a, i) -> concat(
                  transform(slice(_ts, i + 2, size(_ts)), b -> named_struct('a', a, 'b', b)),
                  array(named_struct('a', a, 'b', a)))))"""),
        array(struct(lit("").as("a"), lit("").as("b"))))).as("_p"))
    val matrix = probes
      .groupBy(col("_p.a").as("a"), col("_p.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // matrix-sized; cuts lineage so the three reads
                         // below cost zero extra corpus scans
    val total = matrix.filter(col("a") === "").select(col("n").as("n_sessions"))
    val singles = matrix.filter(col("a") === col("b") && col("a") =!= "")
      .select(col("a").as("_t"), col("n").as("_nt"))
    matrix.filter(col("a") < col("b"))
      .withColumnRenamed("n", "n_ab")
      .join(broadcast(singles.select(col("_t").as("a"), col("_nt").as("n_a"))), Seq("a"))
      .join(broadcast(singles.select(col("_t").as("b"), col("_nt").as("n_b"))), Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_sessions"),
        idiv(col("n_ab") * 1000000L, col("n_sessions")).as("support_ppm"),
        idiv(col("n_ab") * col("n_sessions") * 1000000L,
          col("n_a") * col("n_b")).as("lift_ppm"))
  }

  /** Cumulative audience reach: per day with first-time contexts, how many
    * contexts are NEW that day and how many distinct contexts have been
    * seen so far — the "unique users over time" curve. New-per-day comes
    * from each context's first active day (one context-keyed aggregation);
    * the running total is a window over the DAY-grain table (≤ days rows),
    * so no per-day corpus rescans and no distinct-over-growing-prefix.
    * Days where no context is new do not appear (the curve is constant
    * there).
    *
    * Output: day_start, n_new, cum_reach. */
  def reachCurve(events: DataFrame, ctxCol: String, tsCol: String): DataFrame = {
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val day = idiv(col(tsCol).cast("long"), lit(86400L))
    val firstDays = events
      .select(col(ctxCol).as("_ctx"), day.as("_day"))
      .groupBy("_ctx")
      .agg(min(col("_day")).as("_first"))
      .groupBy(col("_first").as("_day"))
      .agg(count(lit(1)).as("n_new"))
    val cumW = Window.orderBy(col("_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // single-partition window over the day-grain table only
    firstDays
      .withColumn("cum_reach", sum(col("n_new")).over(cumW))
      .select((col("_day") * 86400L).as("day_start"), col("n_new"), col("cum_reach"))
  }
}
