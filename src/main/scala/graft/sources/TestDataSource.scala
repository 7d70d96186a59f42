package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.EventSource
import graft.schema.EventSchema

/** Binds the driver-generated testdata (TESTDATA.md) to the engine's event
  * model so every reference operator can run over it.
  *
  * The `events` table is the natural analog of the reference's data model:
  * each distinct `events.event_type` value (click/error/purchase/signup/view)
  * becomes an engine event type whose payload is `{value: float, props:
  * string}`, keyed by `user_id` as the context and with `ts` truncated to
  * epoch seconds (the reference normalizes all times to epoch seconds —
  * sneldb `src/shared/time.rs`).
  *
  * TPC-H-ish tables are bound as additional event types (orders keyed by
  * customer, lineitem keyed by order) for aggregation/ordering coverage.
  *
  * All projections/filters here are pure Catalyst expressions on top of the
  * Parquet scan, so pushdown and column pruning reach the files; at real
  * scale this adapter is replaced by [[graft.store.EventStore]]'s partitioned
  * layout.
  */
final class TestDataSource(spark: SparkSession, dir: String) extends EventSource {

  graft.functions.Md5Long.register(spark) // used inside pipeline SQL lambdas
  graft.functions.DotLong.register(spark) // native dot product in SQL fragments

  private val eventTypeNames = Seq("click", "error", "purchase", "signup", "view")

  // The events table stores `ts` as a parquet INT64 timestamp whose unit has
  // varied across driver testdata generations (NANOS — which Spark 4 refuses
  // to read as a timestamp — then MICROS). Read it as a raw long with an
  // explicit schema and normalize to epoch seconds with the reference's own
  // digit-count unit inference (`normalize_integer_epoch`, sneldb
  // `src/shared/time.rs:83-101`, mirrored in [[graft.time.TimeParser]]):
  // ≤11 digits seconds, ≤14 millis, ≤16 micros, else nanos. Integer `div`
  // keeps full precision at 1e18 magnitudes (a double round-trip would not),
  // and the CASE is a codegen'd scalar so the parquet scan still prunes and
  // pushes down around it.
  private val tsEpochSec = expr(
    "CASE WHEN abs(ts) < 100000000000 THEN ts" +            // ≤11 digits: s
    " WHEN abs(ts) < 100000000000000 THEN ts div 1000" +    // ≤14 digits: ms
    " WHEN abs(ts) < 10000000000000000 THEN ts div 1000000" + // ≤16: us
    " ELSE ts div 1000000000 END")                          // ns

  private val eventsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  private def eventsRaw: DataFrame =
    spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")

  override def eventTypes: Seq[String] = eventTypeNames

  override def frame(eventType: String): DataFrame = eventType match {
    case t if eventTypeNames.contains(t) =>
      eventsRaw
        .filter(col("event_type") === t)
        .select(
          col("user_id").cast("string").as(EventSchema.ContextId),
          col("event_type"),
          tsEpochSec.as(EventSchema.Timestamp),
          col("event_id"),
          col("value"),
          col("props"))
    case "lineitem" =>
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(
          col("l_orderkey").cast("string").as(EventSchema.ContextId),
          lit("lineitem").as(EventSchema.EventType),
          col("l_shipdate").cast("timestamp").cast("long").as(EventSchema.Timestamp),
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as(EventSchema.EventId),
          col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_returnflag"), col("l_linestatus"),
          // payload datetime field (epoch seconds) — exercises SINCE … USING
          col("l_shipdate").cast("timestamp").cast("long").as("l_shipdate"))
    case "orders" =>
      spark.read.parquet(s"$dir/orders.parquet")
        .select(
          col("o_custkey").cast("string").as(EventSchema.ContextId),
          lit("orders").as(EventSchema.EventType),
          col("o_orderdate").cast("timestamp").cast("long").as(EventSchema.Timestamp),
          col("o_orderkey").cast("long").as(EventSchema.EventId),
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderpriority"))
    case other =>
      throw new IllegalArgumentException(s"unknown event type: $other")
  }

  /** Raw table access for the data-pipeline operators (documents/embeddings). */
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** ALL events (every type) with the engine's core columns — the input for
    * cross-type analytics (sessionization, retention) that scope wider than
    * one event type. Same normalization as [[frame]]. */
  def allEvents: DataFrame =
    eventsRaw.select(
      col("user_id").cast("string").as(EventSchema.ContextId),
      col("event_type"),
      tsEpochSec.as(EventSchema.Timestamp),
      col("event_id"),
      col("value"),
      col("props"))

  /** STREAMING (file-source) view of the events table with the same core
    * columns as [[frame]] — for batch-replaying the streaming operators
    * ([[graft.streaming.StreamingReplay]]) over the same data the batch
    * path is oracle-checked on. Unfiltered by event type; the streaming
    * operators scope their own steps. */
  // The file stream source requires its path to be a DIRECTORY, but the
  // testdata tables are single parquet files — stage a symlink to the file
  // inside a temp directory and stream that (no data copy).
  private def streamDir(table: String): String = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_stream_$table")
    // absolutize: the symlink lives in the temp dir, so a RELATIVE `dir`
    // would resolve against the temp dir and dangle — the file stream
    // source then lists zero files and the replay silently returns an
    // empty frame (bit a relative tmp/sf1 sweep in r19; the batch reads
    // resolve against the process cwd and were unaffected)
    java.nio.file.Files.createSymbolicLink(
      tmp.resolve(s"$table.parquet"),
      java.nio.file.Paths.get(s"$dir/$table.parquet").toAbsolutePath)
    tmp.toString
  }

  // maxFilesPerTrigger is pinned far above any testdata layout so an
  // AvailableNow replay always sees ONE micro-batch — the Update-mode gates
  // (changepoint/autocorr/coverage) emit one verdict row per key per batch,
  // so a layout-driven batch split would duplicate rows against the oracle.
  private val singleBatch = "1000000"

  def eventsStream: DataFrame =
    spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", singleBatch).parquet(streamDir("events"))
      .select(
        col("user_id").cast("string").as(EventSchema.ContextId),
        col("event_type"),
        tsEpochSec.as(EventSchema.Timestamp),
        col("event_id"),
        col("value"),
        col("props"))

  /** STREAMING view of the documents table ([[table]] is the batch analog). */
  def documentsStream: DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", singleBatch).parquet(streamDir("documents"))
  }

  /** STREAMING view of the embeddings table. */
  def embeddingsStream: DataFrame = {
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", singleBatch).parquet(streamDir("embeddings"))
  }
}
