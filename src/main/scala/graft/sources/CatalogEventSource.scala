package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.EventSource
import graft.schema.EventSchema

/** Binds the session catalog's TEMP VIEWS as event types, so ANY DataFrame
  * becomes queryable through the command language:
  *
  * {{{
  * df.createOrReplaceTempView("purchase")
  * spark.sql("GRAFT QUERY purchase WHERE value > 100 COUNT BY props")
  * }}}
  *
  * Core-column adaptation per view:
  *  - `context_id` is required (cast to string) — the command language's
  *    identity key has no default;
  *  - `timestamp` is required (cast to long epoch seconds);
  *  - `event_type` defaults to the view name when absent;
  *  - `event_id` defaults to a plan-stable synthetic id when absent (row
  *    order inside a deterministic scan — fine for tie-breaks; provide a
  *    real id column for reproducible pagination across layouts).
  *
  * Everything stays a Catalyst projection over the view's own plan, so
  * pushdown/pruning reach whatever source backs the view.
  */
final class CatalogEventSource(spark: SparkSession) extends EventSource {

  override def eventTypes: Seq[String] =
    spark.catalog.listTables().collect()
      .filter(t => t.isTemporary).map(_.name).toSeq.sorted

  override def frame(t: String): DataFrame = {
    val df =
      try spark.table(t)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"unknown event type: $t", e) }
    val cols = df.columns.toSet
    require(cols.contains(EventSchema.ContextId),
      s"view '$t' needs a ${EventSchema.ContextId} column to serve as an event type")
    require(cols.contains(EventSchema.Timestamp),
      s"view '$t' needs a ${EventSchema.Timestamp} column to serve as an event type")
    var out = df
      .withColumn(EventSchema.ContextId, col(EventSchema.ContextId).cast("string"))
      .withColumn(EventSchema.Timestamp, col(EventSchema.Timestamp).cast("long"))
    if (!cols.contains(EventSchema.EventType))
      out = out.withColumn(EventSchema.EventType, lit(t))
    if (!cols.contains(EventSchema.EventId))
      out = out.withColumn(EventSchema.EventId, monotonically_increasing_id())
    out
  }
}
