package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingestion — the engine's durable write path
  * (SURVEY.md §4.2 Spark shape): source → validate/normalize → append.
  *
  * The reference's WAL + recovery (sneldb `engine/core/wal/`) maps to the
  * stream checkpoint PLUS an idempotent sink: on restart the source replays
  * from the last committed offsets, and each micro-batch writes under a
  * deterministic `(checkpoint, batchId)` key with replace-not-append
  * semantics ([[EventStore.ingestFrame]]'s `idempotencyKey`), so a batch
  * retried after a crash between the Parquet append and the checkpoint
  * commit skips or overwrites its own prior attempt — EXACTLY-ONCE, the
  * replay-without-duplication guarantee of reference
  * `engine/core/wal/wal_recovery.rs`. The MemTable's fresh-write-visibility
  * maps to short triggers plus [[EventStore]]'s committed-union-memtable
  * read view.
  *
  * At scale the stream source is Kafka/files; each micro-batch is a normal
  * distributed write (no driver loops), partitioned by event type directory.
  */
object Ingest {

  /** Stable short fingerprint of the checkpoint location — together with the
    * micro-batch id it names the batch's committed segment files. */
  private[store] def checkpointKey(checkpoint: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString

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
    val ckpt = checkpointKey(checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.ingestFrame(eventType, batch, contextCol, tsCol,
            idempotencyKey = Some(s"$ckpt-$batchId")) match {
          case Left(err) => throw new IllegalArgumentException(s"ingest failed: $err")
          case Right(_)  => ()
        }
      }
      .start()
  }
}
