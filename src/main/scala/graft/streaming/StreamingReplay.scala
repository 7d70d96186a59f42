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

  /** `statePartitions` sizes the replay's state stores: every stateful
    * operator pays a fixed per-partition-per-batch cost (store open,
    * snapshot, commit), so a gate-scale replay on 32 session shuffle
    * partitions spends most of its wall time on empty-store bookkeeping.
    * The count is pinned at the query's FIRST start via the session conf
    * (Spark freezes it in the checkpoint thereafter) and the prior value
    * is restored before returning. Results are partition-count-invariant:
    * all per-key semantics live inside group handlers. Production streams
    * size this to load; 8 bounds the harness.
    *
    * Concurrency: the session-conf override below is visible to ANYTHING
    * planned on the same session while the replay runs, and two overlapping
    * replays would restore each other's values. Replays therefore serialize
    * on a global lock (correct restore even from concurrent test suites),
    * and the remaining exposure — a concurrent BATCH query on the same
    * session planning with the replay's partition count — is an accepted
    * harness property: the verify/bench drivers are single-threaded, and
    * partition count never changes results, only parallelism. Production
    * streams run on their own session and conf. */
  def run(out: DataFrame, mode: String = "append",
      statePartitions: Int = 8): DataFrame = lock.synchronized {
    val spark = out.sparkSession
    val name = s"graft_replay_${counter.incrementAndGet()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt_")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // The replay's checkpoint is a PROCESS-LOCAL temp dir, so the manager
    // is pinned to [[LocalNioCheckpointFileManager]] here (and restored
    // after): without libhadoop, BOTH stock managers fork a subprocess per
    // checkpoint file (FileContext renames shell `readlink`; FileSystem
    // creates/mkdirs shell `chmod`), and forking a multi-GB JVM stalls
    // 10 µs–100+ ms with host memory pressure — the measured source of the
    // 2-3x wall spread on every checkpoint-writing gate (see the manager's
    // scaladoc). Production streams on HDFS/S3 configure their own durable
    // checkpoint location and KEEP the default manager; this override is
    // scoped to the replay and restored in the finally below.
    val fmKey = "spark.sql.streaming.checkpointFileManagerClass"
    val prevFm = spark.conf.getOption(fmKey)
    // restored only AFTER termination: the first micro-batch is planned
    // asynchronously after start(), and that planning reads the session conf
    try {
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
      spark.conf.set(fmKey, classOf[LocalNioCheckpointFileManager].getName)
      val q = out.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      prevFm match {
        case Some(v) => spark.conf.set(fmKey, v)
        case None    => spark.conf.unset(fmKey)
      }
    }
    // bind the result frame (Dataset creation analyzes eagerly, capturing
    // the memory sink's plan), then release the per-replay scaffolding a
    // suite of hundreds of replays would otherwise accumulate (r15 review
    // finding): the catalog entry no longer pins the sink rows for the
    // session's lifetime — they stay reachable through the returned frame
    // only — and the checkpoint dir is needed only while the query runs.
    val result = spark.table(name)
    spark.catalog.dropTempView(name)
    deleteRecursively(ckpt)
    result
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  private val lock = new Object
}
