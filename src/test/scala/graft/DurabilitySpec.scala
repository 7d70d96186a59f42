package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{EventStore, ExecResult}

/** Crash/replay durability: exactly-once micro-batch ingest (VERDICT r2 #1),
  * the WAL flush crash-window (VERDICT r2 #2), id monotonicity across the
  * sync and bulk write paths (ADVICE r2 high), and schema-evolution-safe WAL
  * recovery (ADVICE r2 low). Reference semantics:
  * `engine/core/wal/wal_recovery.rs` (replay without duplication) and the
  * `wal_*` scenario family. */
class DurabilitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def frame(r: ExecResult) = r match {
    case ExecResult.Frame(df) => df
    case other                => fail(s"expected frame, got $other")
  }

  test("idempotent ingestFrame: a replayed (checkpoint,batchId) never duplicates") {
    val dir = Files.createTempDirectory("graft_dur_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE x FIELDS { v: "int" }""")
    val df = Seq(("c1", 1L), ("c2", 2L), ("c3", 3L)).toDF("ctx", "v")
    assert(s.ingestFrame("x", df, "ctx", idempotencyKey = Some("abc-0")).isRight)
    assert(s.frame("x").count() == 3)
    // exact replay of the same micro-batch (marker present) → skipped
    assert(s.ingestFrame("x", df, "ctx", idempotencyKey = Some("abc-0")) == Right(-1L))
    assert(s.frame("x").count() == 3)
    val ids = s.frame("x").collect().map(_.getAs[Long]("event_id"))
    assert(ids.distinct.length == 3)
    // a different batch id appends normally
    assert(s.ingestFrame("x", Seq(("c4", 4L)).toDF("ctx", "v"), "ctx",
      idempotencyKey = Some("abc-1")).isRight)
    assert(s.frame("x").count() == 4)
  }

  test("crash before commit marker: retry replaces the partial attempt, no duplicates") {
    val dir = Files.createTempDirectory("graft_dur_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE x FIELDS { v: "int" }""")
    val df = Seq(("c1", 1L), ("c2", 2L)).toDF("ctx", "v")
    assert(s.ingestFrame("x", df, "ctx", idempotencyKey = Some("k-7")).isRight)
    // simulate a crash after the part files landed but before the marker:
    // delete the marker, leaving the data files in place
    val marker = Paths.get(dir, "data", "x", "_ingest_k-7.committed")
    assert(Files.exists(marker))
    Files.delete(marker)
    // the retried micro-batch must overwrite its own partial output
    assert(s.ingestFrame("x", df, "ctx", idempotencyKey = Some("k-7")).isRight)
    assert(s.frame("x").count() == 2)
    assert(s.frame("x").collect().map(_.getAs[Long]("event_id")).distinct.length == 2)
    assert(Files.exists(marker))
  }

  test("WAL flush crash-window: replay skips rows already in committed segments") {
    val dir = Files.createTempDirectory("graft_dur_").toString
    val wal = Paths.get(dir, "_wal", "events.jsonl")
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE a FIELDS { v: "int" }""")
    s.execute("""DEFINE b FIELDS { v: "int" }""")
    s.execute("""STORE a FOR c1 PAYLOAD {"v": 1}""")
    s.execute("""STORE a FOR c2 PAYLOAD {"v": 2}""")
    s.execute("""STORE b FOR c1 PAYLOAD {"v": 3}""")
    val preFlushWal = Files.readAllBytes(wal)
    s.execute("FLUSH") // segments committed, WAL truncated
    s.execute("""STORE a FOR c3 PAYLOAD {"v": 4}""") // fresh, unflushed
    val postFlushWal = Files.readAllBytes(wal)
    // simulate the crash window: the whole pre-flush WAL is still on disk
    // alongside the fresh entry (as if the truncate never happened)
    Files.write(wal, preFlushWal ++ postFlushWal)
    val s2 = new EventStore(spark, dir)
    // committed rows must NOT be re-inserted; the unflushed row must survive
    assert(frame(s2.execute("QUERY a")).count() == 3)
    assert(frame(s2.execute("QUERY b")).count() == 1)
    s2.execute("FLUSH")
    assert(frame(s2.execute("QUERY a")).count() == 3)
    val ids = s2.frame("a").collect().map(_.getAs[Long]("event_id"))
    assert(ids.distinct.length == 3)
  }

  test("sync STORE after bulk ingest allocates ids above the ingested block") {
    val dir = Files.createTempDirectory("graft_dur_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE x FIELDS { v: "int" }""")
    // sync store first pins the sync block low
    s.execute("""STORE x FOR c0 PAYLOAD {"v": 0}""")
    assert(s.ingestFrame("x", Seq(("c1", 1L)).toDF("ctx", "v"), "ctx").isRight)
    val maxAfterIngest = s.frame("x").agg(org.apache.spark.sql.functions.max("event_id"))
      .head().getLong(0)
    // the regression (ADVICE r2 high): this id landed BELOW maxAfterIngest
    s.execute("""STORE x FOR c2 PAYLOAD {"v": 2}""")
    val syncId = s.frame("x").filter($"context_id" === "c2").head().getAs[Long]("event_id")
    assert(syncId > maxAfterIngest)
  }

  test("materialization delta sees a sync STORE that follows a bulk ingest") {
    val dir = Files.createTempDirectory("graft_dur_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE m FIELDS { v: "int" }""")
    s.execute("""STORE m FOR a PAYLOAD {"v": 10}""")
    s.execute("FLUSH")
    s.execute("REMEMBER QUERY m WHERE v > 5 AS big")
    assert(frame(s.execute("SHOW big")).count() == 1)
    assert(s.ingestFrame("m", Seq(("b", 20L)).toDF("ctx", "v"), "ctx").isRight)
    s.execute("""STORE m FOR c PAYLOAD {"v": 30}""") // sync after bulk
    s.execute("FLUSH")
    val shown = frame(s.execute("SHOW big")).collect()
    assert(shown.map(_.getAs[Long]("v")).sorted.toSeq == Seq(10L, 20L, 30L))
  }

  test("WAL recovery maps values by field name across a schema reorder") {
    val dir = Files.createTempDirectory("graft_dur_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE t FIELDS { a: "int", b: "string" }""")
    s.execute("""STORE t FOR c1 PAYLOAD {"a": 7, "b": "x"}""") // in WAL, unflushed
    // evolve the schema: same fields, reordered — recovery must not zip
    // positionally
    s.execute("""DEFINE t AS 2 FIELDS { b: "string", a: "int" }""")
    val s2 = new EventStore(spark, dir)
    val row = frame(s2.execute("QUERY t")).head()
    assert(row.getAs[Long]("a") == 7L)
    assert(row.getAs[String]("b") == "x")
  }

  test("STORE-before-ingest crash: bulk id blocks must not mask the unflushed WAL entry") {
    // ADVICE r3 high #2: a sync STORE (WAL'd, unflushed) followed by a bulk
    // ingestFrame of the SAME type gives the ingest a higher id block; a
    // per-type committed-max-id dedupe would classify the STORE's WAL entry
    // as already committed and drop it on replay — losing an fsync-acked
    // event. Replay must use exact id membership instead.
    val dir = Files.createTempDirectory("graft_dur_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE x FIELDS { v: "int" }""")
    s.execute("""STORE x FOR sync PAYLOAD {"v": 1}""") // WAL'd, unflushed
    assert(s.ingestFrame("x", Seq(("b1", 10L), ("b2", 11L)).toDF("ctx", "v"), "ctx").isRight)
    // crash before flush: recover from the same root
    val s2 = new EventStore(spark, dir)
    assert(frame(s2.execute("QUERY x")).count() == 3)
    assert(s2.frame("x").filter($"context_id" === "sync").count() == 1)
    s2.execute("FLUSH") // and the recovered entry commits exactly once
    assert(frame(s2.execute("QUERY x")).count() == 3)
    assert(s2.frame("x").collect().map(_.getAs[Long]("event_id")).distinct.length == 3)
  }

  test("STOREs racing a flush: no duplicates, no lost acks, WAL covers the survivors") {
    // ADVICE r3 high #1: flush() used to iterate + clear the memtable without
    // the append lock — a racing STORE could be dropped by clear() while the
    // WAL truncate deleted its entry (acked event lost), and two threads
    // crossing the threshold could flush the same rows twice (duplicates).
    val dir = Files.createTempDirectory("graft_dur_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE t FIELDS { v: "int" }""")
    val writers = (1 to 8).map { tn =>
      new Thread(() => {
        var i = 0
        while (i < 50) {
          s.execute(s"""STORE t FOR w$tn PAYLOAD {"v": $i}""")
          i += 1
        }
      })
    }
    @volatile var storing = true
    val flusher = new Thread(() => while (storing) { s.flush(); Thread.sleep(1) })
    writers.foreach(_.start()); flusher.start()
    writers.foreach(_.join()); storing = false; flusher.join()
    // live view: every acked store visible exactly once
    assert(frame(s.execute("QUERY t")).count() == 400)
    assert(s.frame("t").collect().map(_.getAs[Long]("event_id")).distinct.length == 400)
    // crash now (no final flush): committed segments + pruned WAL must still
    // cover all 400 acked events, each exactly once
    val s2 = new EventStore(spark, dir)
    assert(frame(s2.execute("QUERY t")).count() == 400)
    assert(s2.frame("t").collect().map(_.getAs[Long]("event_id")).distinct.length == 400)
  }

  test("concurrent STOREs keep WAL lines whole and recoverable") {
    val dir = Files.createTempDirectory("graft_dur_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE t FIELDS { v: "int" }""")
    val threads = (1 to 4).map { tn =>
      new Thread(() => {
        var i = 0
        while (i < 50) {
          s.execute(s"""STORE t FOR c$tn PAYLOAD {"v": $i}""")
          i += 1
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val s2 = new EventStore(spark, dir) // replay all 200 from WAL
    assert(frame(s2.execute("QUERY t")).count() == 200)
    assert(s2.frame("t").collect()
      .map(_.getAs[Long]("event_id")).distinct.length == 200)
  }

  test("rewrite-swap crash windows recover on startup (compact/purge discipline)") {
    // the swap is `write tmp; move dir→old; move tmp→dir; delete old` —
    // simulate a crash at each point and restart the store
    val dir = Files.createTempDirectory("graft_swap_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE t FIELDS { v: "int" }""")
    (1 to 5).foreach(i => s.execute(s"""STORE t FOR c$i PAYLOAD {"v": $i}"""))
    s.execute("FLUSH")
    val data = Paths.get(dir, "data")

    // crash BETWEEN the moves: only <t>.old exists — the restart must
    // restore it (and its rows must feed the id high-water scan)
    Files.move(data.resolve("t"), data.resolve("t.old"))
    val s2 = new EventStore(spark, dir)
    assert(s2.frame("t").count() == 5, "swap-crash data not restored")
    assert(!Files.exists(data.resolve("t.old")))
    s2.execute("""STORE t FOR c9 PAYLOAD {"v": 9}""")
    s2.execute("FLUSH")
    assert(s2.frame("t").collect().map(_.getAs[Long]("event_id")).distinct.length == 6,
      "high-water scan missed the restored rows (id collision)")

    // crash AFTER the swap but before cleanup: both dirs exist — the
    // restart keeps the new dir and finishes the delete
    val junk = data.resolve("t.old")
    Files.createDirectories(junk)
    Files.write(junk.resolve("stale.parquet"), Array[Byte](1, 2, 3))
    val s3 = new EventStore(spark, dir)
    assert(s3.frame("t").count() == 6)
    assert(!Files.exists(junk), "committed swap's .old not cleaned")

    // stale rewrite scratch with the original intact is deleted
    val tmp = data.resolve("t.compact.tmp")
    Files.createDirectories(tmp)
    Files.write(tmp.resolve("part.parquet"), Array[Byte](1))
    val s4 = new EventStore(spark, dir)
    assert(s4.frame("t").count() == 6)
    assert(!Files.exists(tmp), "stale compact scratch not cleaned")
  }

  test("torn WAL tail (crash mid-append) is dropped; the store still opens") {
    val dir = Files.createTempDirectory("graft_torn_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE t FIELDS { v: "int" }""")
    s.execute("""STORE t FOR c1 PAYLOAD {"v": 1}""")
    s.execute("""STORE t FOR c2 PAYLOAD {"v": 2}""")
    // simulate the crash artifact: a partial (unacknowledged) final line
    val wal = Paths.get(dir, "_wal", "events.jsonl")
    Files.write(wal, """{"t":"t","c":"c3","ts":1,"id":99,"f":["v"],"v":[""".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val s2 = new EventStore(spark, dir) // used to throw out of the constructor
    assert(frame(s2.execute("QUERY t")).count() == 2,
      "acknowledged WAL entries must survive a torn tail")
    // ADVICE r15: the fragment is truncated ON DISK at recovery — the append
    // channel reopens with APPEND, so a surviving fragment would merge with
    // the next acknowledged line (unopenable store, or a silently-dropped
    // acknowledged write, on the restart after that)
    assert(!new String(Files.readAllBytes(wal), "UTF-8").contains("\"id\":99"),
      "torn fragment still on disk after recovery")
    s2.execute("""STORE t FOR c3 PAYLOAD {"v": 3}""")
    val s2b = new EventStore(spark, dir) // the restart that used to hit the merged line
    assert(frame(s2b.execute("QUERY t")).count() == 3,
      "acknowledged post-recovery write lost to a merged WAL line")
    s2b.execute("FLUSH") // pruneWal shares the tolerance
    assert(frame(s2b.execute("QUERY t")).count() == 3)
    // a WAL whose ONLY line is torn repairs to no WAL at all (the old code
    // returned early from replay and left the fragment for the next append)
    val dir3 = Files.createTempDirectory("graft_torn3_").toString
    val sOnly = new EventStore(spark, dir3)
    sOnly.execute("""DEFINE t FIELDS { v: "int" }""")
    val wal3 = Paths.get(dir3, "_wal", "events.jsonl")
    Files.createDirectories(wal3.getParent)
    Files.write(wal3, """{"t":"t","c":"cX","ts":1,"id":7,"f":["v""".getBytes("UTF-8"))
    val sOnly2 = new EventStore(spark, dir3)
    assert(!Files.exists(wal3), "torn-only WAL not truncated away")
    sOnly2.execute("""STORE t FOR c1 PAYLOAD {"v": 1}""")
    assert(frame(new EventStore(spark, dir3).execute("QUERY t")).count() == 1)
    // a torn NON-last line is real corruption and still fails loudly
    val dir2 = Files.createTempDirectory("graft_torn2_").toString
    val s3 = new EventStore(spark, dir2)
    s3.execute("""DEFINE t FIELDS { v: "int" }""")
    s3.execute("""STORE t FOR c1 PAYLOAD {"v": 1}""")
    val wal2 = Paths.get(dir2, "_wal", "events.jsonl")
    val body = new String(Files.readAllBytes(wal2), "UTF-8")
    Files.write(wal2, ("{broken\n" + body).getBytes("UTF-8"))
    intercept[IllegalStateException] { new EventStore(spark, dir2) }
  }

  test("id block counter overflow reclaims trailing unused block space") {
    val dir = Files.createTempDirectory("graft_idwrap_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE t FIELDS { v: "int" }""")
    s.execute("""STORE t FOR c1 PAYLOAD {"v": 1}""")
    s.execute("FLUSH")
    val before = s.frame("t").collect().map(_.getAs[Long]("event_id")).max
    // simulate ~8k lifetime micro-batches: the next allocation would shift
    // into the sign bit (negative ids below every recorded HWM)
    s.forceBatchSeqForTest(1L << 13)
    s.execute("""STORE t FOR c2 PAYLOAD {"v": 2}""")
    s.execute("FLUSH")
    val ids = s.frame("t").collect().map(_.getAs[Long]("event_id"))
    assert(ids.forall(_ > 0L), s"overflowed into negative ids: ${ids.toSeq}")
    assert(ids.max > before, "reclaimed block must stay above every visible id")
    // and a bulk ingest after the reclaim keeps monotonicity too
    import spark.implicits._
    assert(s.ingestFrame("t", Seq(("c3", 3L)).toDF("ctx", "v"), "ctx").isRight)
    val ids2 = s.frame("t").collect().map(_.getAs[Long]("event_id"))
    assert(ids2.forall(_ > 0L) && ids2.distinct.length == 3)
  }
}
