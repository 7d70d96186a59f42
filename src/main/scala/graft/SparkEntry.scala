package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ast.{Command, CompareCmd, QueryCmd, ReplayCmd}
import graft.engine.{CompareCompiler, QueryCompiler}
import graft.parser.CommandParser
import graft.sources.TestDataSource

/** Driver contract — one entry per implemented operator (SURVEY.md §2/§3).
  *
  * Every `q_*` entry runs a command-language string through the full stack:
  * CommandParser → AST → QueryCompiler → DataFrame plan, over the testdata
  * bound as event streams by [[TestDataSource]]. The matching `oracleSql`
  * reproduces the same semantics in ANSI SQL for DuckDB.
  *
  * Column-name parity rules (driver hashes after sorting columns by name):
  * every computed column is aliased identically on both sides; timestamps are
  * epoch-second BIGINTs on both sides (`CAST(floor(epoch(ts)) AS BIGINT)` in
  * DuckDB ≡ Spark's truncating timestamp→long cast — the reference normalizes
  * all times to epoch seconds, sneldb `src/shared/time.rs`).
  */
object SparkEntry {

  /** Run a command-language string against the testdata event binding. */
  def run(cmd: String)(spark: SparkSession, dir: String): DataFrame = {
    val src = new TestDataSource(spark, dir)
    CommandParser.parse(cmd) match {
      case q: QueryCmd   => QueryCompiler.compile(q, src)
      case r: ReplayCmd  => QueryCompiler.compile(r.toQuery, src)
      case c: CompareCmd => CompareCompiler.compile(c, src)
      case other         => throw new IllegalArgumentException(s"not a query command: $other")
    }
  }

  private def q(cmd: String): (SparkSession, String) => DataFrame =
    (spark, dir) => run(cmd)(spark, dir)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    run("QUERY purchase COUNT, TOTAL value, AVG value PER DAY")(spark, "/root/testdata/sf0.001")

  // DuckDB-side view of an events-derived event type (epoch-second core cols).
  private def eView(t: String): String =
    s"""SELECT CAST(user_id AS VARCHAR) AS context_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp", event_id, value, props FROM events WHERE event_type = '$t'"""

  private val liView =
    """SELECT CAST(l_orderkey AS VARCHAR) AS context_id, 'lineitem' AS event_type, CAST(floor(epoch(l_shipdate)) AS BIGINT) AS "timestamp", l_orderkey * 10 + l_linenumber AS event_id, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, CAST(floor(epoch(l_shipdate)) AS BIGINT) AS l_shipdate FROM lineitem"""

  private val ordView =
    """SELECT CAST(o_custkey AS VARCHAR) AS context_id, 'orders' AS event_type, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS "timestamp", o_orderkey AS event_id, o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders"""

  // Sequence-side view: link key + sort key + payload.
  private def sView(t: String): String =
    s"""SELECT CAST(user_id AS VARCHAR) AS link, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, value, props FROM events WHERE event_type = '$t'"""

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    engineQueries ++ PipelineQueries.queries ++ StoreQueries.queries ++
      StreamQueries.queries ++ AnalyticsQueries.queries ++ SketchQueries.queries

  private def engineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- selection / filtering (SURVEY §3.2: P1-P6) ----
    "q_select_where_gt" -> q("QUERY purchase WHERE value > 100"),
    "q_select_and_or"   -> q("QUERY purchase WHERE (value > 150 OR value < 10) AND context_id != 42"),
    "q_select_not"      -> q("QUERY purchase WHERE NOT value <= 100"),
    "q_select_in"       -> q("QUERY error WHERE context_id IN (1, 2, 3)"),
    "q_select_since"    -> q("QUERY click SINCE 2024-01-15T00:00:00Z"),
    "q_return_proj"     -> q("QUERY purchase WHERE value >= 190 RETURN [value]"),
    "q_limit_offset"    -> q("QUERY purchase LIMIT 50 OFFSET 10"),
    "q_order_by_desc"   -> q("QUERY purchase ORDER BY value DESC LIMIT 20"),
    // ---- aggregations (SURVEY §3.4: A1-A8) ----
    "q_agg_count_by"      -> q("QUERY lineitem COUNT BY l_returnflag"),
    "q_agg_multi"         -> q("QUERY lineitem COUNT, TOTAL l_quantity, AVG l_quantity, MIN l_extendedprice, MAX l_extendedprice BY l_returnflag, l_linestatus"),
    "q_agg_count_unique"  -> q("QUERY orders COUNT UNIQUE context_id BY o_orderpriority"),
    "q_agg_count_field"   -> q("QUERY orders COUNT o_totalprice BY o_orderstatus"),
    "q_agg_per_day"       -> q("QUERY purchase COUNT, AVG value PER DAY"),
    "q_agg_per_month_by"  -> q("QUERY lineitem TOTAL l_quantity PER MONTH BY l_returnflag"),
    "q_agg_topk_groups"   -> q("QUERY lineitem COUNT BY l_partkey ORDER BY count DESC LIMIT 10"),
    "q_agg_where_since"   -> q("QUERY purchase COUNT, AVG value SINCE 2024-01-15T00:00:00Z WHERE value > 50"),
    // ---- replay (SURVEY §2: REPLAY) ----
    "q_replay_ctx"        -> q("REPLAY FOR 7 LIMIT 1000"),
    "q_replay_type_since" -> q("REPLAY purchase FOR 7 SINCE 2024-01-10T00:00:00Z"),
    // ---- sequence / funnel (SURVEY §3.3: J1) ----
    "q_seq_followed" -> q("QUERY signup FOLLOWED BY purchase LINKED BY context_id"),
    "q_seq_preceded" -> q("QUERY error PRECEDED BY purchase LINKED BY context_id"),
    "q_seq_where"    -> q("QUERY signup FOLLOWED BY purchase LINKED BY context_id WHERE purchase.value > 100"),
    "q_seq_chain3"   -> q("QUERY signup FOLLOWED BY purchase FOLLOWED BY error LINKED BY context_id LIMIT 100"),
    // ---- PlotQL + compare (SURVEY §2.4: PLOT, VS) ----
    "q_plot_top_breakdown" -> q("PLOT COUNT OF purchase BREAKDOWN BY context_id OVER DAY TOP 10"),
    "q_compare_vs"         -> q("PLOT TOTAL(value) OF purchase FILTER value > 50 VS TOTAL(value) OF click"),
    "q_compare_3way"       -> q("PLOT COUNT OF purchase VS COUNT OF click VS COUNT OF view BREAKDOWN BY props"),
    // ---- additional time / pagination semantics ----
    "q_agg_per_week"        -> q("QUERY lineitem COUNT PER WEEK"),
    "q_agg_per_year_by"     -> q("QUERY orders COUNT, TOTAL o_totalprice PER YEAR BY o_orderstatus"),
    "q_since_using_payload" -> q("QUERY lineitem SINCE 1995-01-01 USING l_shipdate COUNT BY l_linestatus"),
    "q_seq_using_time"      -> q("QUERY signup FOLLOWED BY purchase LINKED BY context_id USING TIME value LIMIT 200"),
    "q_agg_offset"          -> q("QUERY lineitem COUNT BY l_suppkey ORDER BY count DESC LIMIT 10 OFFSET 5"),
    "q_agg_unique_props"    -> q("QUERY purchase COUNT UNIQUE props BY context_id ORDER BY count_unique_props DESC LIMIT 30"),
    // ---- dynamic-compare ladder (reference ScalarValue::compare,
    // types/mod.rs:245-270): a numeric literal against a STRING column
    // compares NUMERICALLY per row when the stored string parses as a
    // number ("10" > 8 even though "10" < "8" lexicographically) ----
    "q_where_numstr_gt" -> q("QUERY purchase WHERE context_id > 8"),
    // ---- [time] config: zone + week start (reference time_bucketing.rs) ----
    "q_agg_per_week_sun" -> ((s, d) => {
      s.conf.set("spark.graft.time.weekStart", "sunday")
      try run("QUERY lineitem COUNT PER WEEK")(s, d)
      finally s.conf.unset("spark.graft.time.weekStart")
    }),
    "q_agg_per_day_tz" -> ((s, d) => {
      s.conf.set("spark.graft.time.zone", "America/New_York")
      try run("QUERY lineitem COUNT PER DAY")(s, d)
      finally s.conf.unset("spark.graft.time.zone")
    })
  )

  def oracleSql: Map[String, String] =
    engineOracles ++ PipelineQueries.oracleSql ++ StoreQueries.oracleSql ++
      StreamQueries.oracleSql ++ AnalyticsQueries.oracleSql ++ SketchQueries.oracleSql

  private def engineOracles: Map[String, String] = Map(
    "q_select_where_gt" ->
      s"""WITH e AS (${eView("purchase")}) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE value > 100""",
    "q_select_and_or" ->
      s"""WITH e AS (${eView("purchase")}) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE (value > 150 OR value < 10) AND context_id <> '42'""",
    "q_select_not" ->
      s"""WITH e AS (${eView("purchase")}) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE NOT (value <= 100)""",
    "q_select_in" ->
      s"""WITH e AS (${eView("error")}) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE context_id IN ('1','2','3')""",
    "q_select_since" ->
      s"""WITH e AS (${eView("click")}) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE "timestamp" >= 1705276800""",
    "q_return_proj" ->
      s"""WITH e AS (${eView("purchase")}) SELECT context_id, event_type, "timestamp", value FROM e WHERE value >= 190""",
    "q_limit_offset" ->
      s"""WITH e AS (${eView("purchase")}) SELECT context_id, event_type, "timestamp", value, props FROM e ORDER BY "timestamp", event_id LIMIT 50 OFFSET 10""",
    "q_order_by_desc" ->
      s"""WITH e AS (${eView("purchase")}) SELECT context_id, event_type, "timestamp", value, props FROM e ORDER BY value DESC, "timestamp", event_id LIMIT 20""",
    "q_agg_count_by" ->
      s"""WITH e AS ($liView) SELECT l_returnflag, CAST(count(*) AS BIGINT) AS "count" FROM e GROUP BY 1""",
    "q_agg_multi" ->
      s"""WITH e AS ($liView) SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS "count", CAST(sum(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS total_l_quantity, avg(CAST(trunc(l_quantity) AS BIGINT)) AS avg_l_quantity, min(l_extendedprice) AS min_l_extendedprice, max(l_extendedprice) AS max_l_extendedprice FROM e GROUP BY 1, 2""",
    "q_agg_count_unique" ->
      s"""WITH e AS ($ordView) SELECT o_orderpriority, CAST(count(DISTINCT context_id) AS BIGINT) AS count_unique_context_id FROM e GROUP BY 1""",
    "q_agg_count_field" ->
      s"""WITH e AS ($ordView) SELECT o_orderstatus, CAST(count(o_totalprice) AS BIGINT) AS count_o_totalprice FROM e GROUP BY 1""",
    "q_agg_per_day" ->
      s"""WITH e AS (${eView("purchase")}) SELECT ("timestamp" // 86400) * 86400 AS bucket, CAST(count(*) AS BIGINT) AS "count", avg(CAST(trunc(value) AS BIGINT)) AS avg_value FROM e GROUP BY 1""",
    "q_agg_per_month_by" ->
      s"""WITH e AS ($liView) SELECT CAST(floor(epoch(date_trunc('month', make_timestamp("timestamp" * 1000000)))) AS BIGINT) AS bucket, l_returnflag, CAST(sum(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS total_l_quantity FROM e GROUP BY 1, 2""",
    "q_agg_topk_groups" ->
      s"""WITH e AS ($liView) SELECT l_partkey, CAST(count(*) AS BIGINT) AS "count" FROM e GROUP BY 1 ORDER BY "count" DESC, l_partkey LIMIT 10""",
    "q_agg_where_since" ->
      s"""WITH e AS (${eView("purchase")}) SELECT CAST(count(*) AS BIGINT) AS "count", avg(CAST(trunc(value) AS BIGINT)) AS avg_value FROM e WHERE "timestamp" >= 1705276800 AND value > 50""",
    "q_replay_ctx" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS context_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp", event_id, value, props FROM events) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE context_id = '7' ORDER BY "timestamp", event_id LIMIT 1000""",
    "q_replay_type_since" ->
      s"""WITH e AS (${eView("purchase")}) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE context_id = '7' AND "timestamp" >= 1704844800""",
    "q_seq_followed" ->
      s"""WITH s AS (${sView("signup")}), p AS (${sView("purchase")})
         |SELECT s.link AS link_value, s.t AS signup_timestamp, s.value AS signup_value, s.props AS signup_props,
         |       p.t AS purchase_timestamp, p.value AS purchase_value, p.props AS purchase_props
         |FROM s JOIN p ON s.link = p.link AND p.t >= s.t
         |QUALIFY row_number() OVER (PARTITION BY s.link, s.eid ORDER BY p.t, p.eid) = 1""".stripMargin,
    "q_seq_preceded" ->
      s"""WITH a AS (${sView("error")}), b AS (${sView("purchase")})
         |SELECT a.link AS link_value, a.t AS error_timestamp, a.value AS error_value, a.props AS error_props,
         |       b.t AS purchase_timestamp, b.value AS purchase_value, b.props AS purchase_props
         |FROM a JOIN b ON a.link = b.link AND b.t < a.t
         |QUALIFY row_number() OVER (PARTITION BY a.link, a.eid ORDER BY b.t DESC, b.eid DESC) = 1""".stripMargin,
    "q_seq_where" ->
      s"""WITH s AS (${sView("signup")}), p AS (SELECT * FROM (${sView("purchase")}) WHERE value > 100)
         |SELECT s.link AS link_value, s.t AS signup_timestamp, s.value AS signup_value, s.props AS signup_props,
         |       p.t AS purchase_timestamp, p.value AS purchase_value, p.props AS purchase_props
         |FROM s JOIN p ON s.link = p.link AND p.t >= s.t
         |QUALIFY row_number() OVER (PARTITION BY s.link, s.eid ORDER BY p.t, p.eid) = 1""".stripMargin,
    "q_seq_chain3" ->
      s"""WITH s AS (${sView("signup")}), p AS (${sView("purchase")}), x AS (${sView("error")}),
         |sp AS (
         |  SELECT s.link, s.t AS st, s.eid AS seid, s.value AS sv, s.props AS spr,
         |         p.t AS pt, p.eid AS peid, p.value AS pv, p.props AS ppr
         |  FROM s JOIN p ON s.link = p.link AND p.t >= s.t
         |  QUALIFY row_number() OVER (PARTITION BY s.link, s.eid ORDER BY p.t, p.eid) = 1),
         |spx AS (
         |  SELECT sp.*, x.t AS xt, x.value AS xv, x.props AS xpr
         |  FROM sp JOIN x ON sp.link = x.link AND x.t >= sp.pt
         |  QUALIFY row_number() OVER (PARTITION BY sp.link, sp.seid, sp.peid ORDER BY x.t, x.eid) = 1)
         |SELECT link AS link_value, st AS signup_timestamp, sv AS signup_value, spr AS signup_props,
         |       pt AS purchase_timestamp, pv AS purchase_value, ppr AS purchase_props,
         |       xt AS error_timestamp, xv AS error_value, xpr AS error_props
         |FROM spx
         |ORDER BY st, link, sv, spr, pt, pv, ppr, xt, xv, xpr LIMIT 100""".stripMargin,
    "q_plot_top_breakdown" ->
      s"""WITH e AS (${eView("purchase")})
         |SELECT ("timestamp" // 86400) * 86400 AS bucket, context_id, CAST(count(*) AS BIGINT) AS "count"
         |FROM e GROUP BY 1, 2 ORDER BY "count" DESC, bucket, context_id LIMIT 10""".stripMargin,
    "q_compare_vs" ->
      s"""WITH p AS (${eView("purchase")}), c AS (${eView("click")})
         |SELECT CAST(sum(CAST(trunc(value) AS BIGINT)) AS BIGINT) AS total_value, 'purchase' AS side FROM p WHERE value > 50
         |UNION ALL
         |SELECT CAST(sum(CAST(trunc(value) AS BIGINT)) AS BIGINT) AS total_value, 'click' AS side FROM c""".stripMargin,
    "q_compare_3way" ->
      s"""WITH p AS (${eView("purchase")}), c AS (${eView("click")}), v AS (${eView("view")})
         |SELECT props, CAST(count(*) AS BIGINT) AS "count", 'purchase' AS side FROM p GROUP BY props
         |UNION ALL
         |SELECT props, CAST(count(*) AS BIGINT) AS "count", 'click' AS side FROM c GROUP BY props
         |UNION ALL
         |SELECT props, CAST(count(*) AS BIGINT) AS "count", 'view' AS side FROM v GROUP BY props""".stripMargin,
    "q_agg_per_week" ->
      s"""WITH e AS ($liView) SELECT CAST(floor(epoch(date_trunc('week', make_timestamp("timestamp" * 1000000)))) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS "count" FROM e GROUP BY 1""",
    // Sunday-start weeks: Monday-truncate the day after, then step back a day
    "q_agg_per_week_sun" ->
      s"""WITH e AS ($liView) SELECT CAST(floor(epoch(date_trunc('week', make_timestamp("timestamp" * 1000000) + INTERVAL 1 DAY) - INTERVAL 1 DAY)) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS "count" FROM e GROUP BY 1""",
    // NY-local day buckets: UTC instant → NY wall time → midnight → back to UTC
    "q_agg_per_day_tz" ->
      s"""WITH e AS ($liView) SELECT CAST(floor(epoch(timezone('America/New_York', date_trunc('day', timezone('America/New_York', make_timestamp("timestamp" * 1000000)::TIMESTAMPTZ))))) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS "count" FROM e GROUP BY 1""",
    "q_agg_per_year_by" ->
      s"""WITH e AS ($ordView) SELECT CAST(floor(epoch(date_trunc('year', make_timestamp("timestamp" * 1000000)))) AS BIGINT) AS bucket, o_orderstatus, CAST(count(*) AS BIGINT) AS "count", CAST(sum(CAST(trunc(o_totalprice) AS BIGINT)) AS BIGINT) AS total_o_totalprice FROM e GROUP BY 1, 2""",
    "q_since_using_payload" ->
      s"""WITH e AS ($liView) SELECT l_linestatus, CAST(count(*) AS BIGINT) AS "count" FROM e WHERE l_shipdate >= 788918400 GROUP BY 1""",
    "q_seq_using_time" ->
      s"""WITH s AS (SELECT CAST(user_id AS VARCHAR) AS link, CAST(trunc(value) AS BIGINT) AS t, event_id AS eid, value, props FROM events WHERE event_type = 'signup'),
         |p AS (SELECT CAST(user_id AS VARCHAR) AS link, CAST(trunc(value) AS BIGINT) AS t, event_id AS eid, value, props FROM events WHERE event_type = 'purchase')
         |SELECT s.link AS link_value, s.t AS signup_timestamp, s.value AS signup_value, s.props AS signup_props,
         |       p.t AS purchase_timestamp, p.value AS purchase_value, p.props AS purchase_props
         |FROM s JOIN p ON s.link = p.link AND p.t >= s.t
         |QUALIFY row_number() OVER (PARTITION BY s.link, s.eid ORDER BY p.t, p.eid) = 1
         |ORDER BY signup_timestamp, link_value, signup_value, signup_props, purchase_timestamp, purchase_value, purchase_props LIMIT 200""".stripMargin,
    "q_agg_offset" ->
      s"""WITH e AS ($liView) SELECT l_suppkey, CAST(count(*) AS BIGINT) AS "count" FROM e GROUP BY 1 ORDER BY "count" DESC, l_suppkey LIMIT 10 OFFSET 5""",
    "q_agg_unique_props" ->
      s"""WITH e AS (${eView("purchase")}) SELECT context_id, CAST(count(DISTINCT props) AS BIGINT) AS count_unique_props FROM e GROUP BY 1 ORDER BY count_unique_props DESC, context_id LIMIT 30""",
    // numeric rung of the dynamic-compare ladder: every context_id parses,
    // so the oracle compares through DOUBLE exactly as the engine does
    "q_where_numstr_gt" ->
      s"""WITH e AS (${eView("purchase")}) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE CAST(context_id AS DOUBLE) > 8"""
  )
}
