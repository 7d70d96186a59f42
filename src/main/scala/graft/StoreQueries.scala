package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ast.QueryCmd
import graft.engine.QueryCompiler
import graft.parser.CommandParser
import graft.sources.TestDataSource
import graft.store.{EventStore, ExecResult}

/** Correctness-gate queries that exercise the [[graft.store.EventStore]]
  * write path end-to-end: testdata events are ingested into a fresh store
  * (DEFINE → bulk ingest → FLUSH → QUERY / REMEMBER → SHOW) and the final
  * result must hash-match the oracle computed directly over the original
  * parquet — proving the store round-trips bytes, ids, and time semantics.
  */
object StoreQueries {

  private val splitTs = 1705276800L // 2024-01-15T00:00:00Z — inside the data range

  private def freshStore(spark: SparkSession): EventStore =
    new EventStore(spark, Files.createTempDirectory("graft_gate_store_").toString)

  /** STORE → FLUSH → QUERY roundtrip over the purchase stream. */
  def storeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val store = freshStore(spark)
    store.execute("""DEFINE purchase FIELDS { value: "float", props: "string" }""")
    val purchases = new TestDataSource(spark, dir).frame("purchase")
      .select(col("context_id"), col("timestamp"), col("value"), col("props"))
    store.ingestFrame("purchase", purchases, "context_id", Some("timestamp"))
      .left.foreach(e => throw new IllegalStateException(e))
    store.execute("FLUSH")
    QueryCompiler.compile(
      CommandParser.parse("QUERY purchase WHERE value > 120").asInstanceOf[QueryCmd], store)
  }

  /** REMEMBER on the first half of the stream, ingest the second half, SHOW —
    * the result must equal the query over the full stream (incremental delta
    * with watermark, no duplicates, no gaps). */
  def rememberShow(spark: SparkSession, dir: String): DataFrame = {
    val store = freshStore(spark)
    store.execute("""DEFINE purchase FIELDS { value: "float", props: "string" }""")
    val purchases = new TestDataSource(spark, dir).frame("purchase")
      .select(col("context_id"), col("timestamp"), col("value"), col("props"))
    store.ingestFrame("purchase", purchases.filter(col("timestamp") < splitTs),
      "context_id", Some("timestamp")).left.foreach(e => throw new IllegalStateException(e))
    store.execute("REMEMBER QUERY purchase WHERE value > 150 AS big") match {
      case ExecResult.Error(e, _) => throw new IllegalStateException(e)
      case _                   => ()
    }
    store.ingestFrame("purchase", purchases.filter(col("timestamp") >= splitTs),
      "context_id", Some("timestamp")).left.foreach(e => throw new IllegalStateException(e))
    store.execute("SHOW big") match {
      case ExecResult.Frame(df) => df
      case other                => throw new IllegalStateException(other.toString)
    }
  }

  /** Aggregate materialization maintained by partial-state merge (the
    * reference's AggState design): REMEMBER an aggregate over the first
    * slice, ingest two more slices with a SHOW in between (two merge
    * cycles), and the final SHOW must equal the aggregate over the full
    * stream — proving the merged state is exact, including COUNT UNIQUE. */
  def rememberShowAgg(spark: SparkSession, dir: String): DataFrame = {
    val store = freshStore(spark)
    store.execute("""DEFINE purchase FIELDS { value: "float", props: "string" }""")
    val purchases = new TestDataSource(spark, dir).frame("purchase")
      .select(col("context_id"), col("timestamp"), col("value"), col("props"))
    val midTs = splitTs + 5 * 86400
    def slice(df: DataFrame) = store.ingestFrame("purchase", df, "context_id", Some("timestamp"))
      .left.foreach(e => throw new IllegalStateException(e))
    slice(purchases.filter(col("timestamp") < splitTs))
    store.execute(
      "REMEMBER QUERY purchase COUNT, TOTAL value, AVG value, MIN value, MAX value, COUNT UNIQUE context_id BY props AS agg_props") match {
      case ExecResult.Error(e, _) => throw new IllegalStateException(e)
      case _                      => ()
    }
    slice(purchases.filter(col("timestamp") >= splitTs && col("timestamp") < midTs))
    store.execute("SHOW agg_props") // first delta merge
    slice(purchases.filter(col("timestamp") >= midTs))
    store.execute("SHOW agg_props") match { // second delta merge
      case ExecResult.Frame(df) => df
      case other                => throw new IllegalStateException(other.toString)
    }
  }

  /** Sequence materialization maintained per-affected-group: REMEMBER a
    * FOLLOWED BY funnel over the first slice, ingest two more slices with a
    * SHOW in between (two incremental bucket rewrites — the second slice
    * adds purchases that RE-MATCH existing signup heads, the case where
    * append-only maintenance would keep a stale pair), and the final SHOW
    * must equal the sequence query over the full stream. */
  def rememberShowSeq(spark: SparkSession, dir: String): DataFrame = {
    val store = freshStore(spark)
    store.execute("""DEFINE signup FIELDS { value: "float", props: "string" }""")
    store.execute("""DEFINE purchase FIELDS { value: "float", props: "string" }""")
    val src = new TestDataSource(spark, dir)
    def slice(t: String, lo: Long, hi: Long): Unit =
      store.ingestFrame(t,
        src.frame(t).select(col("context_id"), col("timestamp"), col("value"), col("props"))
          .filter(col("timestamp") >= lo && col("timestamp") < hi),
        "context_id", Some("timestamp"))
        .left.foreach(e => throw new IllegalStateException(e))
    val midTs = splitTs + 5 * 86400
    slice("signup", Long.MinValue, splitTs); slice("purchase", Long.MinValue, splitTs)
    store.execute("REMEMBER QUERY signup FOLLOWED BY purchase LINKED BY context_id AS funnel") match {
      case ExecResult.Error(e, _) => throw new IllegalStateException(e)
      case _                      => ()
    }
    slice("signup", splitTs, midTs); slice("purchase", splitTs, midTs)
    store.execute("SHOW funnel") // first incremental bucket rewrite
    slice("signup", midTs, Long.MaxValue); slice("purchase", midTs, Long.MaxValue)
    store.execute("SHOW funnel") match { // second incremental bucket rewrite
      case ExecResult.Frame(df) => df
      case other                => throw new IllegalStateException(other.toString)
    }
  }

  /** The 100 TB nightly shape of sequence SHOW: the time-sliced
    * [[rememberShowSeq]] fixture touches every link key per delta (a full
    * re-match by construction, PLANS.md r15), so this gate splits by USER
    * instead — REMEMBER over all but a small deterministic user slice
    * (crc32 mod 40 ≈ 2.5% of users), then ingest just that slice and SHOW.
    * The affected-key set is under the literal-pushdown cap, so the
    * refresh takes the delta-proportional scan path (`PushedFilters: In`)
    * end-to-end, and the final state must still equal the sequence query
    * over the full stream. */
  def rememberShowSeqDelta(spark: SparkSession, dir: String): DataFrame = {
    val store = freshStore(spark)
    store.execute("""DEFINE signup FIELDS { value: "float", props: "string" }""")
    store.execute("""DEFINE purchase FIELDS { value: "float", props: "string" }""")
    val src = new TestDataSource(spark, dir)
    val held = pmod(crc32(col("context_id")), lit(40)) === 0
    def slice(t: String, pred: org.apache.spark.sql.Column): Unit =
      store.ingestFrame(t,
        src.frame(t).select(col("context_id"), col("timestamp"), col("value"), col("props"))
          .filter(pred),
        "context_id", Some("timestamp"))
        .left.foreach(e => throw new IllegalStateException(e))
    slice("signup", !held); slice("purchase", !held)
    store.execute("REMEMBER QUERY signup FOLLOWED BY purchase LINKED BY context_id AS funnel_d") match {
      case ExecResult.Error(e, _) => throw new IllegalStateException(e)
      case _                      => ()
    }
    slice("signup", held); slice("purchase", held)
    store.execute("SHOW funnel_d") match { // delta-sized incremental refresh
      case ExecResult.Frame(df) => df
      case other                => throw new IllegalStateException(other.toString)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_store_roundtrip"   -> ((s, d) => storeRoundtrip(s, d)),
    "q_remember_show"     -> ((s, d) => rememberShow(s, d)),
    "q_remember_show_agg" -> ((s, d) => rememberShowAgg(s, d)),
    "q_remember_show_seq" -> ((s, d) => rememberShowSeq(s, d)),
    "q_remember_show_seq_delta" -> ((s, d) => rememberShowSeqDelta(s, d))
  )

  private val purchaseView =
    """SELECT CAST(user_id AS VARCHAR) AS context_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp", value, props FROM events WHERE event_type = 'purchase'"""

  def oracleSql: Map[String, String] = Map(
    "q_store_roundtrip" ->
      s"""WITH e AS ($purchaseView) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE value > 120""",
    "q_remember_show" ->
      s"""WITH e AS ($purchaseView) SELECT context_id, event_type, "timestamp", value, props FROM e WHERE value > 150""",
    "q_remember_show_agg" ->
      s"""WITH e AS ($purchaseView) SELECT props, CAST(count(*) AS BIGINT) AS "count", CAST(sum(CAST(trunc(value) AS BIGINT)) AS BIGINT) AS total_value, avg(CAST(trunc(value) AS BIGINT)) AS avg_value, min(value) AS min_value, max(value) AS max_value, CAST(count(DISTINCT context_id) AS BIGINT) AS count_unique_context_id FROM e GROUP BY 1""",
    // same shape as q_seq_followed: the materialized funnel must equal the
    // sequence query over the FULL stream (eid tie-breaks never fire — the
    // fixture has no duplicate (user, second) pairs per type). The
    // user-sliced delta gate converges to the SAME full-stream state, so
    // both gates share ONE oracle binding — editing one cannot silently
    // diverge the other.
    "q_remember_show_seq" -> seqFunnelOracle,
    "q_remember_show_seq_delta" -> seqFunnelOracle
  )

  private val seqFunnelOracle =
    """WITH s AS (SELECT CAST(user_id AS VARCHAR) AS link, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, value, props FROM events WHERE event_type = 'signup'),
      |p AS (SELECT CAST(user_id AS VARCHAR) AS link, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id AS eid, value, props FROM events WHERE event_type = 'purchase')
      |SELECT s.link AS link_value, s.t AS signup_timestamp, s.value AS signup_value, s.props AS signup_props,
      |       p.t AS purchase_timestamp, p.value AS purchase_value, p.props AS purchase_props
      |FROM s JOIN p ON s.link = p.link AND p.t >= s.t
      |QUALIFY row_number() OVER (PARTITION BY s.link, s.eid ORDER BY p.t, p.eid) = 1""".stripMargin
}
