package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ast._
import graft.schema.EventSchema
import graft.time.TimeBucketing

/** Compiles [[QueryCmd]] ASTs to DataFrame plans.
  *
  * This is the Spark analog of the reference's whole read path
  * (sneldb `handlers/query/orchestrator.rs` → per-shard `read/query_plan.rs` →
  * flows → coordinator merge): planning is declarative, Catalyst does pruning/
  * pushdown (SURVEY.md §5), shard fan-out + partial/final aggregation are
  * Spark stages, and the coordinator merge is the final exchange. No custom
  * rules are needed — every reference operator maps to built-in Catalyst
  * operators except exact sequence matching (see [[SequenceCompiler]]).
  */
object QueryCompiler {

  val BucketCol = "bucket" // reference `sink/aggregate/finalization.rs:42`

  def compile(q: QueryCmd, src: EventSource): DataFrame = {
    if (q.isSequence) return SequenceCompiler.compile(q, src)

    val base = scoped(q, src)
    val filtered = applyBaseFilters(base, q)

    if (q.isAggregate) compileAggregate(filtered, q)
    else compileSelection(filtered, q)
  }

  /** Resolve the event-type scope; `*` = union of all types
    * (reference `read/event_scope.rs:6-31`). Missing columns become nulls.
    * An unknown event type — or `*` over an empty catalog — is an EMPTY
    * result, not an error (reference scenarios `query_empty_event_type`,
    * `replay_nonexistent_context`). */
  def scoped(q: QueryCmd, src: EventSource): DataFrame =
    if (q.eventType == "*") {
      val frames = src.eventTypes.map(src.frame)
      if (frames.isEmpty) emptyCoreFrame()
      else frames.reduce(_.unionByName(_, allowMissingColumns = true))
    } else if (src.eventTypes.contains(q.eventType)) src.frame(q.eventType)
    else try src.frame(q.eventType) catch {
      // ad-hoc sources may serve types beyond eventTypes (table bindings);
      // only a genuinely unknown type collapses to the empty result
      case _: IllegalArgumentException | _: MatchError => emptyCoreFrame()
    }

  private[engine] def emptyCoreFrame(): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField(EventSchema.ContextId, StringType),
        StructField(EventSchema.EventType, StringType),
        StructField(EventSchema.Timestamp, LongType),
        StructField(EventSchema.EventId, LongType))))
  }

  private[engine] def applyBaseFilters(df: DataFrame, q: QueryCmd): DataFrame = {
    var out = df
    q.contextId.foreach(c => out = out.filter(col(EventSchema.ContextId) === c))
    q.since.foreach { ts =>
      // SINCE applies to the core timestamp, or to a payload time field via
      // USING <field> (reference query_plan.rs; both stored as epoch seconds).
      // A field absent from this frame's schema orders at 0 (reference
      // get_i64_at(..).unwrap_or(0)) instead of throwing UNRESOLVED_COLUMN
      // out of the query (r15 review finding).
      val field = q.timeField.getOrElse(EventSchema.Timestamp)
      val c = if (out.columns.contains(field)) col(field).cast("long") else lit(0L)
      out = out.filter(c >= ts)
    }
    q.where.foreach(e => out = out.filter(ExprCompiler.compile(e, out.schema)))
    out
  }

  // ---------------- selection ----------------

  private def compileSelection(df: DataFrame, q: QueryCmd): DataFrame = {
    // RETURN projection: core fields always present, unknown fields ignored,
    // empty/omitted list = all payload fields (reference query.md semantics).
    val payloadCols = df.columns.filterNot(EventSchema.AllCoreFields.contains)
    val wanted = q.returnFields match {
      case None | Some(Seq()) => payloadCols.toSeq
      // a requested field shadowed by a core name maps to its internal
      // column (rendered back under the declared name by Responses); the
      // internal p$ spelling itself is not addressable
      case Some(fs)           => fs.flatMap(EventSchema.resolveReturn).filter(payloadCols.contains)
    }
    val projected = df.select(
      (EventSchema.CoreFields.map(col) ++ wanted.map(col) ++ Seq(col(EventSchema.EventId))): _*)

    // Deterministic total order: user ORDER BY first, then (timestamp,
    // event_id) tiebreak so LIMIT/OFFSET pagination is stable across runs —
    // the reference's k-way shard merge is only deterministic per shard
    // layout; we strengthen to full determinism.
    val ordered = q.orderBy match {
      case Some(OrderSpec(f, desc)) =>
        val c = if (desc) col(f).desc else col(f).asc
        projected.orderBy(c, col(EventSchema.Timestamp), col(EventSchema.EventId))
      case None if q.limit.isDefined || q.offset.isDefined =>
        // replay/pagination order (reference REPLAY: append order per context)
        projected.orderBy(col(EventSchema.Timestamp), col(EventSchema.EventId))
      case None => projected
    }

    val paged = (q.offset, q.limit) match {
      case (Some(o), Some(l)) => ordered.offset(o).limit(l)
      case (Some(o), None)    => ordered.offset(o)
      case (None, Some(l))    => ordered.limit(l)
      case (None, None)       => ordered
    }
    // event_id is internal — not serialized in responses (reference event.rs:11-19)
    paged.drop(EventSchema.EventId)
  }

  // ---------------- aggregation ----------------

  /** Bucket column for `PER <granularity>` queries (shared with the
    * incremental aggregate materializer). */
  private[graft] def bucketColumn(q: QueryCmd): Option[Column] = q.timeBucket.map { g =>
    val timeCol = col(q.bucketTimeField.orElse(q.timeField).getOrElse(EventSchema.Timestamp))
    // calendar-aware by default; spark.graft.time.naiveBuckets=true switches
    // to the reference's fixed-width mode (hour 3600 … year 31536000 —
    // `[time] calendar=false` in the reference config, SURVEY §2.3 A8).
    // spark.graft.time.{zone,weekStart} mirror the reference's `[time]`
    // timezone + week_start config (time_bucketing.rs:6-107).
    val conf = org.apache.spark.sql.SparkSession.active.conf
    val naive = conf.getOption("spark.graft.time.naiveBuckets").contains("true")
    val zone = conf.getOption("spark.graft.time.zone").getOrElse("UTC")
    val weekStart = conf.getOption("spark.graft.time.weekStart")
      .map(TimeBucketing.parseWeekStart).getOrElse(0)
    TimeBucketing.bucket(timeCol, g, calendar = !naive, zone, weekStart).as(BucketCol)
  }

  private[graft] def groupNames(q: QueryCmd): Seq[String] =
    q.timeBucket.map(_ => BucketCol).toSeq ++ q.groupBy

  /** ORDER BY / LIMIT / OFFSET over finalized groups — applied after the
    * final merge (reference `query_plan.rs:211-227`); default order = group
    * columns for deterministic output. Shared with the materializer. */
  private[graft] def orderAndPageGroups(grouped: DataFrame, q: QueryCmd,
      names: Seq[String]): DataFrame = {
    val ordered = q.orderBy match {
      case Some(OrderSpec(f, desc)) =>
        val c = if (desc) col(f).desc else col(f).asc
        grouped.orderBy(c +: names.filterNot(_ == f).map(col): _*)
      case None if names.nonEmpty => grouped.orderBy(names.map(col): _*)
      case None => grouped
    }
    (q.offset, q.limit) match {
      case (Some(o), Some(l)) => ordered.offset(o).limit(l)
      case (Some(o), None)    => ordered.offset(o)
      case (None, Some(l))    => ordered.limit(l)
      case (None, None)       => ordered
    }
  }

  private def compileAggregate(df: DataFrame, q: QueryCmd): DataFrame = {
    val bucketExpr = bucketColumn(q)
    val groupCols: Seq[Column] = bucketExpr.toSeq ++ q.groupBy.map(col)
    val aggCols = q.aggs.map(aggColumn(df.schema, _))

    val grouped =
      if (groupCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.groupBy(groupCols: _*).agg(aggCols.head, aggCols.tail: _*)

    orderAndPageGroups(grouped, q, groupNames(q))
  }

  /** One AggSpec → typed Catalyst aggregate with reference-parity naming and
    * semantics (sneldb `read/aggregate/ops.rs`; SURVEY.md §2.3):
    *  - COUNT: all rows; COUNT f: non-null; COUNT UNIQUE f: exact distinct of
    *    stringified values (not approximate — parity with the HashSet impl);
    *  - TOTAL f / AVG f: integer (i64) semantics — values truncated to long
    *    (the reference's `get_i64_at` only sums integers); this also makes
    *    sums exact and order-independent at any scale;
    *  - MIN/MAX: typed min/max (schema types make the reference's
    *    numeric-else-string dual track unnecessary).
    * Spark's partial→final aggregation replicates the reference's AggState
    * shard merge (`ops.rs` partials) for free.
    */
  private[graft] def aggColumn(schema: StructType, spec: AggSpec): Column = spec match {
    case AggSpec.Count          => count(lit(1)).as(spec.outputName)
    case AggSpec.CountField(f)  => count(col(f)).as(spec.outputName)
    case AggSpec.CountUnique(f) =>
      // exact by default (reference parity: exact HashSet, ops.rs:312). At
      // 100 TB an exact distinct can dominate the shuffle; flip
      // spark.graft.countUnique.approx=true for HLL (documented divergence,
      // SURVEY.md §5c).
      val approx = org.apache.spark.sql.SparkSession.active.conf
        .getOption("spark.graft.countUnique.approx").contains("true")
      if (approx) approx_count_distinct(col(f).cast("string")).as(spec.outputName)
      else countDistinct(col(f).cast("string")).as(spec.outputName)
    case AggSpec.Total(f)       => coalesce(sum(toI64(schema, f)), lit(0L)).as(spec.outputName)
    case AggSpec.Avg(f)         => avg(toI64(schema, f)).as(spec.outputName)
    case AggSpec.Min(f)         => min(col(f)).as(spec.outputName)
    case AggSpec.Max(f)         => max(col(f)).as(spec.outputName)
  }

  /** Reference TOTAL/AVG input conversion: i64 or parseable-to-i64 only
    * (`ops.rs:359-444` via `get_i64_at`). Doubles truncate toward zero
    * (Spark double→long cast semantics; mirrored by `trunc()` in oracles). */
  private def toI64(schema: StructType, f: String): Column = {
    schema.fields.find(_.name == f).map(_.dataType) match {
      case Some(LongType) | Some(IntegerType) => col(f).cast("long")
      case _ => col(f).cast("long")
    }
  }
}
