package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Bounded batch-replay of a streaming plan — `Trigger.AvailableNow` over
  * the file source(s) feeding the plan, into an in-memory sink, returning
  * the final result as a batch frame.
  *
  * This is how the streaming operators get HARD correctness rows: the same
  * testdata the batch operators are oracle-checked on is replayed through
  * the streaming plan (real `StreamExecution`, real state store, real
  * watermark machinery), and the replay result is hash-compared against a
  * DuckDB oracle exactly like every batch query.
  *
  * No rate-limit options are set, so the file source delivers ALL input as
  * ONE micro-batch: within-batch ordering semantics (the funnel's
  * (ts, event_id) scan order, dedup's first-arrival survivor) are then
  * deterministic and expressible in the oracle. The memory sink bounds this
  * harness to gate-scale data — production streams write to real sinks.
  */
object StreamingReplay {
  private val counter = new AtomicInteger()

  def run(out: DataFrame, mode: String = "append"): DataFrame = {
    val spark = out.sparkSession
    val name = s"graft_replay_${counter.incrementAndGet()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt_")
    val q = out.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
