package graft.engine

import org.apache.spark.sql.DataFrame
import graft.schema.EventSchema

/** Binding from event types to DataFrames.
  *
  * Every frame must expose the core columns `context_id` (string),
  * `event_type` (string), `timestamp` (long, epoch seconds), `event_id`
  * (long, per-type monotonic) plus the payload columns of the type's schema.
  * Implementations: [[graft.store.EventStore]] (Parquet-backed engine store)
  * and ad-hoc bindings over external tables (see `graft.SparkEntry`).
  */
trait EventSource {
  def frame(eventType: String): DataFrame
  def eventTypes: Seq[String]
  def schemaOf(eventType: String): Option[EventSchema] = None
}
