package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingestion — the engine's durable write path
  * (SURVEY.md §4.2 Spark shape): source → validate/normalize → append.
  *
  * The reference's WAL + recovery (sneldb `engine/core/wal/`) maps to the
  * stream checkpoint: on restart, the source replays from the last committed
  * offsets, so every event reaches exactly one committed micro-batch — the
  * same durability point the WAL fsync provides. The MemTable's
  * fresh-write-visibility maps to short triggers plus [[EventStore]]'s
  * committed-union-memtable read view.
  *
  * At scale the stream source is Kafka/files; each micro-batch is a normal
  * distributed write (no driver loops), partitioned by event type directory.
  */
object Ingest {

  /** Start ingesting a streaming DataFrame of raw events into the store.
    *
    * @param stream     streaming DF carrying `contextCol`, optional `tsCol`,
    *                   and the payload columns of `eventType`'s schema
    * @param checkpoint checkpoint dir (the WAL analog — must survive restarts)
    */
  def start(store: EventStore, eventType: String, stream: DataFrame,
      contextCol: String, tsCol: Option[String],
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.ingestFrame(eventType, batch, contextCol, tsCol) match {
          case Left(err) => throw new IllegalArgumentException(s"ingest failed: $err")
          case Right(_)  => ()
        }
      }
      .start()
  }
}
