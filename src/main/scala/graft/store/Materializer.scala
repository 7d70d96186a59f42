package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ast._
import graft.engine.QueryCompiler
import graft.schema.EventSchema

/** REMEMBER / SHOW — incrementally-maintained materialized query results
  * (reference `src/engine/materialize/`, `docs/src/design/materialization.md`;
  * SURVEY.md §2.5).
  *
  * REMEMBER runs the query once, persists the result as a Parquet table
  * under `root/_materializations/<name>/data` together with the query text
  * and a high-water mark `(timestamp, event_id)` over the SOURCE events.
  * SHOW streams the stored table plus an incremental delta — the stored
  * query re-run with a `(ts, event_id) > hwm` predicate — appends the delta
  * to the store and advances the watermark. This is exactly the reference's
  * watermark/delta design with Parquet standing in for the LZ4 frame store
  * and the catalog entry; in streaming deployments the same thing falls out
  * of Structured Streaming checkpoints ([[Ingest]]).
  *
  * Aggregation queries are materialized by full recompute on SHOW (appending
  * raw deltas would double-count groups); selection queries use the true
  * incremental path.
  */
final class Materializer(store: EventStore) {
  private val spark: SparkSession = store.spark
  private def matDir(name: String) = Paths.get(store.root, "_materializations", name)

  /** The stored query of a materialization, if it exists (used by the auth
    * gate to scope SHOW to the query's event types). */
  def storedQuery(name: String): Option[QueryCmd] = {
    val metaFile = matDir(name).resolve("meta.json")
    if (!Files.exists(metaFile)) None
    else {
      val node = EventStore.readTree(new String(Files.readAllBytes(metaFile), "UTF-8"))
      Some(graft.parser.CommandParser.parse(node.get("query").asText()).asInstanceOf[QueryCmd])
    }
  }

  def remember(cmd: RememberCmd): ExecResult = {
    val dir = matDir(cmd.name)
    if (Files.exists(dir)) return ExecResult.Error(s"materialization '${cmd.name}' already exists")
    Files.createDirectories(dir)

    val result = QueryCompiler.compile(cmd.query, store)
    result.write.mode("overwrite").parquet(dir.resolve("data").toString)
    val hwm = currentHighWater(cmd.query)
    val meta = s"""{"query": ${EventStore.jsonString(renderQuery(cmd.query))}, "hwm_ts": ${hwm._1}, "hwm_id": ${hwm._2}}"""
    Files.write(dir.resolve("meta.json"), meta.getBytes("UTF-8"))
    ExecResult.Ok(s"remembered '${cmd.name}'")
  }

  def show(name: String): ExecResult = {
    val dir = matDir(name)
    if (!Files.exists(dir.resolve("meta.json")))
      return ExecResult.Error(s"unknown materialization: $name")
    val meta = new String(Files.readAllBytes(dir.resolve("meta.json")), "UTF-8")
    val node = EventStore.readTree(meta)
    val queryText = node.get("query").asText()
    val hwmTs = node.get("hwm_ts").asLong()
    val hwmId = node.get("hwm_id").asLong()
    val query = graft.parser.CommandParser.parse(queryText).asInstanceOf[QueryCmd]

    if (query.isAggregate || query.isSequence) {
      // full recompute for non-append-able shapes; refresh the snapshot
      val result = QueryCompiler.compile(query, store)
      result.write.mode("overwrite").parquet(dir.resolve("data").toString)
      return ExecResult.Frame(spark.read.parquet(dir.resolve("data").toString))
    }

    // incremental delta: stored query with (ts, event_id) > watermark —
    // compiled as a filter BEFORE projection so event_id is still available
    val snapshot = spark.read.parquet(dir.resolve("data").toString)
    val deltaSrc = new DeltaSource(store, hwmTs, hwmId)
    val delta = QueryCompiler.compile(query, deltaSrc)
    val deltaRows = delta.count()
    if (deltaRows > 0) {
      delta.write.mode("append").parquet(dir.resolve("data").toString)
      val hwm = currentHighWater(query)
      val newMeta = s"""{"query": ${EventStore.jsonString(queryText)}, "hwm_ts": ${hwm._1}, "hwm_id": ${hwm._2}}"""
      Files.write(dir.resolve("meta.json"), newMeta.getBytes("UTF-8"))
    }
    ExecResult.Frame(spark.read.parquet(dir.resolve("data").toString))
  }

  /** High-water mark over the query's source scope: max (timestamp,
    * event_id) currently visible (reference `materialize/high_water.rs`). */
  private def currentHighWater(q: QueryCmd): (Long, Long) = {
    val scope = QueryCompiler.scoped(q, store)
    val r = scope.agg(max(col(EventSchema.Timestamp)), max(col(EventSchema.EventId))).head()
    (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
     if (r.isNullAt(1)) Long.MinValue else r.getLong(1))
  }

  /** Render a QueryCmd back to command text (stored in the catalog entry). */
  private def renderQuery(q: QueryCmd): String = {
    val sb = new StringBuilder(s"QUERY ${q.eventType}")
    q.sequence.foreach(_.links.foreach { case (l, t) =>
      sb.append(l match {
        case SequenceLink.FollowedBy => s" FOLLOWED BY $t"
        case SequenceLink.PrecededBy => s" PRECEDED BY $t"
      })
    })
    q.contextId.foreach(c => sb.append(s" FOR $c"))
    q.since.foreach(s => sb.append(s" SINCE $s"))
    q.returnFields.foreach(fs => sb.append(fs.mkString(" RETURN [", ", ", "]")))
    q.linkField.foreach(f => sb.append(s" LINKED BY $f"))
    q.where.foreach(w => sb.append(" WHERE " + renderExpr(w)))
    q.sequenceTimeField.foreach(f => sb.append(s" USING TIME $f"))
    q.timeField.foreach(f => sb.append(s" USING $f"))
    if (q.aggs.nonEmpty) sb.append(q.aggs.map(renderAgg).mkString(" ", ", ", ""))
    q.timeBucket.foreach(g => sb.append(s" PER ${g.toString.toUpperCase}"))
    if (q.groupBy.nonEmpty) sb.append(q.groupBy.mkString(" BY ", ", ", ""))
    q.limit.foreach(n => sb.append(s" LIMIT $n"))
    q.offset.foreach(n => sb.append(s" OFFSET $n"))
    q.orderBy.foreach(o => sb.append(s" ORDER BY ${o.field} ${if (o.descending) "DESC" else "ASC"}"))
    sb.toString
  }

  private def renderAgg(a: AggSpec): String = a match {
    case AggSpec.Count           => "COUNT"
    case AggSpec.CountField(f)   => s"COUNT $f"
    case AggSpec.CountUnique(f)  => s"COUNT UNIQUE $f"
    case AggSpec.Total(f)        => s"TOTAL $f"
    case AggSpec.Avg(f)          => s"AVG $f"
    case AggSpec.Min(f)          => s"MIN $f"
    case AggSpec.Max(f)          => s"MAX $f"
  }

  private def renderExpr(e: Expr): String = e match {
    case Expr.Cmp(f, op, v) =>
      val o = op match {
        case CompareOp.Eq => "="; case CompareOp.Neq => "!="
        case CompareOp.Gt => ">"; case CompareOp.Gte => ">="
        case CompareOp.Lt => "<"; case CompareOp.Lte => "<="
      }
      s"${f.render} $o ${renderLit(v)}"
    case Expr.In(f, vs)  => s"${f.render} IN (${vs.map(renderLit).mkString(", ")})"
    case Expr.Not(inner) => s"NOT (${renderExpr(inner)})"
    case Expr.And(l, r)  => s"(${renderExpr(l)} AND ${renderExpr(r)})"
    case Expr.Or(l, r)   => s"(${renderExpr(l)} OR ${renderExpr(r)})"
  }

  private def renderLit(l: Lit): String = l match {
    case Lit.Str(s)  => "\"" + s.replace("\"", "\\\"") + "\""
    case Lit.I64(n)  => n.toString
    case Lit.F64(d)  => d.toString
    case Lit.Bool(b) => b.toString
    case Lit.Null    => "null"
  }
}

/** EventSource view exposing only events past the watermark — the delta
  * query of SHOW (reference `handlers/show/delta/{refresher,watermark}.rs`). */
private final class DeltaSource(store: EventStore, hwmTs: Long, hwmId: Long)
    extends graft.engine.EventSource {
  override def eventTypes: Seq[String] = store.eventTypes
  override def frame(t: String): DataFrame = {
    val f = store.frame(t)
    f.filter(col(EventSchema.Timestamp) > hwmTs ||
      (col(EventSchema.Timestamp) === hwmTs && col(EventSchema.EventId) > hwmId))
  }
  override def schemaOf(t: String) = store.schemaOf(t)
}
