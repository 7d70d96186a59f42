package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{EventStore, ExecResult, Ingest}

/** Executor-visible latches for the HWM/bulk-ingest race test (one JVM in
  * local mode, so a plain object is shared between driver and tasks). */
object HwmRaceGate {
  @volatile var entered: java.util.concurrent.CountDownLatch = _
  @volatile var release: java.util.concurrent.CountDownLatch = _
  def reset(): Unit = {
    entered = new java.util.concurrent.CountDownLatch(1)
    release = new java.util.concurrent.CountDownLatch(1)
  }
}

class StoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def newStore(clockStart: Long = 1000L): EventStore = {
    val dir = Files.createTempDirectory("graft_store_").toString
    var t = clockStart
    new EventStore(spark, dir, clock = () => { t += 1; t })
  }

  private def ok(r: ExecResult): String = r match {
    case ExecResult.Ok(m)    => m
    case ExecResult.Error(e, _) => fail(s"unexpected error: $e")
    case ExecResult.Frame(_) => fail("unexpected frame")
  }
  private def frame(r: ExecResult) = r match {
    case ExecResult.Frame(df) => df
    case ExecResult.Error(e, _)  => fail(s"unexpected error: $e")
    case ExecResult.Ok(m)     => fail(s"unexpected ok: $m")
  }
  /** The bucket count a sequence materialization recorded at REMEMBER
    * (adaptive since r19 — derived from source bytes, so tests must read
    * it back rather than assume the 64 cap). */
  private def seqBucketsOf(s: EventStore, name: String): Int = {
    val meta = java.nio.file.Paths.get(s.root, "_materializations", name, "meta.json")
    val node = EventStore.readTree(
      new String(java.nio.file.Files.readAllBytes(meta), "UTF-8"))
    if (node.has("seq_buckets")) node.get("seq_buckets").asInt() else 64
  }

  private def err(r: ExecResult): String = r match {
    case ExecResult.Error(e, _) => e
    case other               => fail(s"expected error, got $other")
  }

  test("full command surface: DEFINE, STORE, FLUSH, QUERY, PING, BATCH") {
    val s = newStore()
    assert(ok(s.execute("""DEFINE order FIELDS { amount: "int", status: ["new", "paid"] }""")).contains("Schema defined for 'order'"))
    assert(ok(s.execute("""STORE order FOR u1 PAYLOAD {"amount": 5, "status": "new"}""")).contains("Event accepted"))
    assert(ok(s.execute("""STORE order FOR u1 PAYLOAD {"amount": 9, "status": "paid"}""")).contains("Event accepted"))
    assert(ok(s.execute("""STORE order FOR u2 PAYLOAD {"amount": 7, "status": "new"}""")).contains("Event accepted"))
    // memtable visible before flush
    assert(frame(s.execute("QUERY order WHERE amount > 6")).count() == 2)
    assert(ok(s.execute("FLUSH")) == "Flush command completed")
    assert(frame(s.execute("QUERY order WHERE amount > 6")).count() == 2)
    // mixed memtable + segment reads
    assert(ok(s.execute("""STORE order FOR u3 PAYLOAD {"amount": 11, "status": "new"}""")).contains("Event accepted"))
    assert(frame(s.execute("QUERY order WHERE amount > 6")).count() == 3)
    assert(ok(s.execute("PING")) == "PONG")
    assert(ok(s.execute("""BATCH [ STORE order FOR u4 PAYLOAD {"amount": 1, "status": "new"}; STORE order FOR u4 PAYLOAD {"amount": 2, "status": "paid"}; FLUSH ]""")).contains("batch ok (3"))
    assert(frame(s.execute("QUERY order FOR u4")).count() == 2)
  }

  test("STORE validation: unknown type, missing/extra/type/enum errors") {
    val s = newStore()
    s.execute("""DEFINE sub FIELDS { plan: ["pro", "basic"], n: "int", note: "string | null" }""")
    assert(err(s.execute("""STORE nope FOR u PAYLOAD {"x": 1}""")).contains("No schema defined"))
    assert(err(s.execute("""STORE sub FOR u PAYLOAD {"plan": "pro"}""")).contains("Missing field"))
    assert(err(s.execute("""STORE sub FOR u PAYLOAD {"plan": "pro", "n": 1, "zz": 2}""")).contains("not defined in schema: zz"))
    assert(err(s.execute("""STORE sub FOR u PAYLOAD {"plan": "gold", "n": 1}""")).contains("does not match expected type"))
    assert(err(s.execute("""STORE sub FOR u PAYLOAD {"plan": "pro", "n": "x"}""")).contains("does not match expected type"))
    // optional field may be absent or null
    assert(ok(s.execute("""STORE sub FOR u PAYLOAD {"plan": "pro", "n": 1}""")).contains("Event accepted"))
    assert(ok(s.execute("""STORE sub FOR u PAYLOAD {"plan": "pro", "n": 2, "note": null}""")).contains("Event accepted"))
  }

  test("DEFINE evolution: idempotent, error without version bump, ok with bump") {
    val s = newStore()
    s.execute("""DEFINE t FIELDS { a: "int" }""")
    assert(ok(s.execute("""DEFINE t FIELDS { a: "int" }""")).contains("Schema defined for 't'")) // idempotent
    assert(err(s.execute("""DEFINE t FIELDS { a: "string" }""")).contains("already defined"))
    assert(ok(s.execute("""DEFINE t AS 2 FIELDS { a: "string" }""")).contains("Schema defined for 't'"))
  }

  test("datetime normalization on STORE + REPLAY append order") {
    val s = newStore()
    s.execute("""DEFINE evt FIELDS { at: "datetime", v: "int" }""")
    s.execute("""STORE evt FOR c1 PAYLOAD {"at": "2024-01-15T00:00:00Z", "v": 1}""")
    s.execute("""STORE evt FOR c1 PAYLOAD {"at": 1705276800123, "v": 2}""")
    s.execute("FLUSH")
    s.execute("""STORE evt FOR c1 PAYLOAD {"at": "2024-01-16", "v": 3}""")
    val rows = frame(s.execute("REPLAY FOR c1")).collect()
    assert(rows.map(_.getAs[Long]("v")).toSeq == Seq(1L, 2L, 3L)) // append order
    assert(rows.map(_.getAs[Long]("at")).toSeq == Seq(1705276800L, 1705276800L, 1705363200L))
  }

  test("aggregation + sequence over the store") {
    val s = newStore()
    s.execute("""DEFINE click FIELDS { page: "string" }""")
    s.execute("""DEFINE buy FIELDS { amount: "int" }""")
    for (i <- 1 to 5) s.execute(s"""STORE click FOR u1 PAYLOAD {"page": "p$i"}""")
    s.execute("""STORE buy FOR u1 PAYLOAD {"amount": 10}""")
    s.execute("FLUSH")
    val agg = frame(s.execute("QUERY click COUNT")).collect()
    assert(agg.head.getAs[Long]("count") == 5L)
    val seq = frame(s.execute("QUERY click FOLLOWED BY buy LINKED BY context_id")).collect()
    assert(seq.length == 5) // every click precedes-or-equals the buy
  }

  test("REMEMBER + SHOW with incremental delta and watermark") {
    val s = newStore()
    s.execute("""DEFINE m FIELDS { v: "int" }""")
    s.execute("""STORE m FOR a PAYLOAD {"v": 1}""")
    s.execute("""STORE m FOR a PAYLOAD {"v": 20}""")
    s.execute("FLUSH")
    assert(ok(s.execute("REMEMBER QUERY m WHERE v > 5 AS big")).contains("remembered"))
    assert(frame(s.execute("SHOW big")).count() == 1)
    // new events arrive; SHOW must pick up only the delta (no duplicates)
    s.execute("""STORE m FOR b PAYLOAD {"v": 30}""")
    s.execute("""STORE m FOR b PAYLOAD {"v": 2}""")
    s.execute("FLUSH")
    val shown = frame(s.execute("SHOW big")).collect()
    assert(shown.map(_.getAs[Long]("v")).sorted.toSeq == Seq(20L, 30L))
    // repeated SHOW with no new data: unchanged
    assert(frame(s.execute("SHOW big")).count() == 2)
    assert(err(s.execute("SHOW nope")).contains("not found"))
    assert(err(s.execute("REMEMBER QUERY m AS big")).contains("already exists"))
  }

  test("SHOW delta apply is idempotent across a crash before the meta advance") {
    import java.nio.file.{Files => F, Paths => P}
    val s = newStore()
    s.execute("""DEFINE m FIELDS { v: "int" }""")
    s.execute("""STORE m FOR a PAYLOAD {"v": 10}""")
    s.execute("""STORE m FOR a PAYLOAD {"v": 20}""")
    s.execute("FLUSH")
    assert(ok(s.execute("REMEMBER QUERY m WHERE v > 5 AS sel")).contains("remembered"))
    assert(ok(s.execute("REMEMBER QUERY m COUNT, TOTAL v AS agg")).contains("remembered"))
    assert(frame(s.execute("SHOW sel")).count() == 2)
    def aggRow() = frame(s.execute("SHOW agg")).collect().head
    assert((aggRow().getAs[Long]("count"), aggRow().getAs[Long]("total_v")) == ((2L, 30L)))
    // capture the pre-delta catalog state, apply a delta, then REVERT the
    // meta files — simulating a crash after the delta landed but before
    // the hwm advance (the window that used to duplicate/double-count)
    def metaPath(n: String) = P.get(s.root, "_materializations", n, "meta.json")
    val selMeta = F.readAllBytes(metaPath("sel"))
    val aggMeta = F.readAllBytes(metaPath("agg"))
    s.execute("""STORE m FOR b PAYLOAD {"v": 100}""")
    s.execute("FLUSH")
    assert(frame(s.execute("SHOW sel")).count() == 3)
    assert((aggRow().getAs[Long]("count"), aggRow().getAs[Long]("total_v")) == ((3L, 130L)))
    F.write(metaPath("sel"), selMeta) // crash simulation: meta never advanced
    F.write(metaPath("agg"), aggMeta)
    val selRows = frame(s.execute("SHOW sel")).collect().map(_.getAs[Long]("v")).sorted.toSeq
    assert(selRows == Seq(10L, 20L, 100L),
      s"re-applied selection delta duplicated rows: $selRows")
    assert((aggRow().getAs[Long]("count"), aggRow().getAs[Long]("total_v")) == ((3L, 130L)),
      "re-applied aggregate delta double-counted")
    // and the heal persists: another SHOW stays stable
    assert(frame(s.execute("SHOW sel")).count() == 3)
  }

  test("aggregate SHOW heals a swapWrite crash window (state stranded in .old)") {
    import java.nio.file.{Files => F, Paths => P}
    val s = newStore()
    s.execute("""DEFINE m FIELDS { v: "int" }""")
    s.execute("""STORE m FOR a PAYLOAD {"v": 7}""")
    s.execute("FLUSH")
    assert(ok(s.execute("REMEMBER QUERY m COUNT, COUNT UNIQUE context_id AS ag2")).contains("remembered"))
    assert(frame(s.execute("SHOW ag2")).collect().head.getAs[Long]("count") == 1L)
    // simulate the crash between swapWrite's two moves: state/ gone, rows
    // aside in state.old/ — the next SHOW must restore, not throw
    val matDir = P.get(s.root, "_materializations", "ag2")
    F.move(matDir.resolve("state"), matDir.resolve("state.old"))
    assert(frame(s.execute("SHOW ag2")).collect().head.getAs[Long]("count") == 1L,
      "aggregate SHOW did not heal the stranded state dir")
    assert(!F.exists(matDir.resolve("state.old")))
  }

  test("failed REMEMBER leaves the name usable") {
    val s = newStore()
    s.execute("""DEFINE m FIELDS { v: "int" }""")
    // simulate the artifact of a crashed/failed REMEMBER: a directory with
    // no (readable) meta.json — it used to block the name forever while
    // SHOW reported it not found
    val leftover = java.nio.file.Paths.get(s.root, "_materializations", "blocked")
    java.nio.file.Files.createDirectories(leftover)
    java.nio.file.Files.write(leftover.resolve("meta.json"),
      "{truncated".getBytes("UTF-8")) // torn legacy meta: also unreadable
    assert(err(s.execute("SHOW blocked")).contains("not found"))
    s.execute("""STORE m FOR a PAYLOAD {"v": 1}""")
    s.execute("FLUSH")
    assert(ok(s.execute("REMEMBER QUERY m AS blocked")).contains("remembered"),
      "name blocked by a failed REMEMBER's leftover directory")
    assert(frame(s.execute("SHOW blocked")).count() == 1)
  }

  test("sequence REMEMBER + SHOW: late B re-matches its head, untouched buckets keep their files") {
    import spark.implicits._
    val s = newStore()
    s.execute("""DEFINE a FIELDS { v: "int" }""")
    s.execute("""DEFINE b FIELDS { v: "int" }""")
    def ing(t: String, rows: Seq[(String, Long, Int)]): Unit =
      s.ingestFrame(t, rows.toDF("ctx", "ts", "v"), "ctx", Some("ts"))
        .left.foreach(e => fail(e))
    ing("a", Seq(("u1", 100L, 1), ("u2", 100L, 2)))
    ing("b", Seq(("u1", 300L, 10), ("u2", 150L, 20)))
    assert(ok(s.execute("REMEMBER QUERY a FOLLOWED BY b LINKED BY context_id AS fn")).contains("remembered"))
    def pairs(): Map[String, (Long, Long, Long)] =
      frame(s.execute("SHOW fn")).collect().map(r => r.getAs[String]("link_value") ->
        ((r.getAs[Long]("a_timestamp"), r.getAs[Long]("b_timestamp"), r.getAs[Long]("b_v")))).toMap
    assert(pairs() == Map("u1" -> ((100L, 300L, 10L)), "u2" -> ((100L, 150L, 20L))))
    // a LATE b lands between u1's head and its current match: the stored
    // pair must be REPLACED, not appended beside — the case where
    // append-only maintenance is wrong
    ing("b", Seq(("u1", 200L, 11)))
    val dataDir = java.nio.file.Paths.get(s.root, "_materializations", "fn", "data")
    val before = java.nio.file.Files.walk(dataDir).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p)).toMap
    assert(pairs() == Map("u1" -> ((100L, 200L, 11L)), "u2" -> ((100L, 150L, 20L))))
    val u1Bkt = spark.range(1).select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(org.apache.spark.sql.functions.lit("u1")),
        org.apache.spark.sql.functions.lit(seqBucketsOf(s, "fn")))).head().getInt(0)
    // only u1's bucket directory was rewritten; every other stored file is
    // byte-identical (same path, same mtime) — the incremental guarantee
    val after = java.nio.file.Files.walk(dataDir).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p)).toMap
    val untouchedBefore = before.filterNot(_._1.contains(s"_bkt=$u1Bkt"))
    val untouchedAfter = after.filterNot(_._1.contains(s"_bkt=$u1Bkt"))
    assert(untouchedBefore == untouchedAfter && untouchedBefore.nonEmpty)
    // repeated SHOW with no new data: unchanged
    assert(pairs() == Map("u1" -> ((100L, 200L, 11L)), "u2" -> ((100L, 150L, 20L))))
  }

  test("sequence SHOW: semi-join fallback (pushdown cap 0) matches the literal-pushdown path") {
    import spark.implicits._
    val s = newStore()
    s.execute("""DEFINE a FIELDS { v: "int" }""")
    s.execute("""DEFINE b FIELDS { v: "int" }""")
    def ing(t: String, rows: Seq[(String, Long, Int)]): Unit =
      s.ingestFrame(t, rows.toDF("ctx", "ts", "v"), "ctx", Some("ts"))
        .left.foreach(e => fail(e))
    ing("a", Seq(("u1", 100L, 1), ("u2", 100L, 2)))
    ing("b", Seq(("u1", 300L, 10), ("u2", 150L, 20)))
    assert(ok(s.execute("REMEMBER QUERY a FOLLOWED BY b LINKED BY context_id AS fj")).contains("remembered"))
    def pairs(): Map[String, (Long, Long)] =
      frame(s.execute("SHOW fj")).collect().map(r => r.getAs[String]("link_value") ->
        ((r.getAs[Long]("b_timestamp"), r.getAs[Long]("b_v")))).toMap
    assert(pairs() == Map("u1" -> ((300L, 10L)), "u2" -> ((150L, 20L))))
    // disable the literal pushdown: the delta refresh must take the
    // broadcast semi-join path and produce the identical replacement
    spark.conf.set("spark.graft.show.affectedKeyCap", "0")
    try {
      ing("b", Seq(("u1", 200L, 11)))
      assert(pairs() == Map("u1" -> ((200L, 11L)), "u2" -> ((150L, 20L))))
    } finally spark.conf.unset("spark.graft.show.affectedKeyCap")
    // and back on the default pushdown path for the next delta
    ing("b", Seq(("u2", 120L, 21)))
    assert(pairs() == Map("u1" -> ((200L, 11L)), "u2" -> ((120L, 21L))))
  }

  test("sequence SHOW recovers a bucket a crash left aside mid-swap") {
    import spark.implicits._
    val s = newStore()
    s.execute("""DEFINE a FIELDS { v: "int" }""")
    s.execute("""DEFINE b FIELDS { v: "int" }""")
    def ing(t: String, rows: Seq[(String, Long, Int)]): Unit =
      s.ingestFrame(t, rows.toDF("ctx", "ts", "v"), "ctx", Some("ts"))
        .left.foreach(e => fail(e))
    ing("a", Seq(("u1", 100L, 1), ("u2", 100L, 2)))
    ing("b", Seq(("u1", 300L, 10), ("u2", 150L, 20)))
    assert(ok(s.execute("REMEMBER QUERY a FOLLOWED BY b LINKED BY context_id AS fr")).contains("remembered"))
    def pairs(): Map[String, Long] =
      frame(s.execute("SHOW fr")).collect()
        .map(r => r.getAs[String]("link_value") -> r.getAs[Long]("b_v")).toMap
    assert(pairs() == Map("u1" -> 10L, "u2" -> 20L))
    // simulate the replaceBuckets crash window: u2's live bucket was moved
    // aside into data.old but its replacement never landed, and a stale
    // data.tmp is still on disk
    val dataDir = java.nio.file.Paths.get(s.root, "_materializations", "fr", "data")
    val u2Bkt = spark.range(1).select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(org.apache.spark.sql.functions.lit("u2")),
        org.apache.spark.sql.functions.lit(seqBucketsOf(s, "fr")))).head().getInt(0)
    val old = dataDir.resolveSibling("data.old")
    java.nio.file.Files.createDirectories(old)
    java.nio.file.Files.move(dataDir.resolve(s"_bkt=$u2Bkt"), old.resolve(s"_bkt=$u2Bkt"))
    val tmp = dataDir.resolveSibling("data.tmp")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("junk"), Array[Byte](1, 2, 3))
    // next SHOW heals: the aside bucket is restored, leftovers are dropped,
    // and no row was lost
    assert(pairs() == Map("u1" -> 10L, "u2" -> 20L))
    assert(!java.nio.file.Files.exists(old) && !java.nio.file.Files.exists(tmp))
    // a crash between swapWrite's two moves (data missing, .old complete)
    // also heals: restore wholesale
    java.nio.file.Files.move(dataDir, old)
    assert(pairs() == Map("u1" -> 10L, "u2" -> 20L))
    assert(java.nio.file.Files.isDirectory(dataDir) && !java.nio.file.Files.exists(old))
  }

  test("sequence REMEMBER + SHOW with a payload LINKED BY field refreshes per link group") {
    import spark.implicits._
    val s = newStore()
    s.execute("""DEFINE a FIELDS { k: "string", v: "int" }""")
    s.execute("""DEFINE b FIELDS { k: "string", v: "int" }""")
    def ing(t: String, rows: Seq[(String, Long, String, Int)]): Unit =
      s.ingestFrame(t, rows.toDF("ctx", "ts", "k", "v"), "ctx", Some("ts"))
        .left.foreach(e => fail(e))
    // link key k spans DIFFERENT contexts — the payload-field link path
    ing("a", Seq(("u1", 100L, "g1", 1), ("u2", 100L, "g2", 2)))
    ing("b", Seq(("u3", 300L, "g1", 10), ("u4", 150L, "g2", 20)))
    assert(ok(s.execute("REMEMBER QUERY a FOLLOWED BY b LINKED BY k AS fnk")).contains("remembered"))
    def pairs(): Map[String, (Long, Long)] =
      frame(s.execute("SHOW fnk")).collect().map(r => r.getAs[String]("link_value") ->
        ((r.getAs[Long]("b_timestamp"), r.getAs[Long]("b_v")))).toMap
    assert(pairs() == Map("g1" -> ((300L, 10L)), "g2" -> ((150L, 20L))))
    // late B inside g1's gap, from yet another context: only g1 re-matches
    ing("b", Seq(("u5", 200L, "g1", 11)))
    assert(pairs() == Map("g1" -> ((200L, 11L)), "g2" -> ((150L, 20L))))
  }

  test("bulk ingestFrame and persistence across reopen") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_store_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE x FIELDS { k: "string", v: "int" }""")
    val df = Seq(("c1", "a", 1L, 100L), ("c2", "b", 2L, 200L)).toDF("ctx", "k", "v", "at")
    assert(s.ingestFrame("x", df, "ctx", Some("at")).isRight)
    assert(s.frame("x").count() == 2)
    // reopen: schema catalog + data survive, ids keep increasing
    val s2 = new EventStore(spark, dir)
    assert(s2.eventTypes == Seq("x"))
    assert(s2.frame("x").count() == 2)
    s2.execute("""STORE x FOR c3 PAYLOAD {"k": "c", "v": 3}""")
    s2.execute("FLUSH")
    val ids = s2.frame("x").collect().map(_.getAs[Long]("event_id"))
    assert(ids.distinct.length == 3)
  }

  test("streaming ingest: checkpointed micro-batches land in the store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_store_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE se FIELDS { v: "int" }""")
    val mem = MemoryStream[(String, Long)]
    val stream = mem.toDF.toDF("ctx", "v")
    val cp = Files.createTempDirectory("graft_cp_").toString
    val q = Ingest.start(s, "se", stream, "ctx", None, cp,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    mem.addData(("u1", 1L), ("u2", 2L))
    q.awaitTermination(60000)
    assert(s.frame("se").count() == 2)
  }

  test("live streaming ingest: fresh writes visible mid-stream under ProcessingTime triggers") {
    // the reference's memtable-read property (SURVEY §8.3 fresh-write
    // visibility): rows ingested by a RUNNING stream are queryable between
    // micro-batches, not only after the stream terminates — every other
    // streaming gate replays via AvailableNow, so this is the one live path
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_store_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE lv FIELDS { v: "int" }""")
    val mem = MemoryStream[(String, Long)]
    val stream = mem.toDF.toDF("ctx", "v")
    val cp = Files.createTempDirectory("graft_cp_").toString
    val q = Ingest.start(s, "lv", stream, "ctx", None, cp,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    try {
      def visible(n: Long): Boolean = {
        val deadline = System.currentTimeMillis + 60000
        while (System.currentTimeMillis < deadline) {
          if (s.frame("lv").count() == n) return true
          Thread.sleep(100)
        }
        false
      }
      mem.addData(("u1", 1L))
      assert(visible(1), "first write not visible while the stream is live")
      assert(q.isActive, "stream must still be running at first visibility")
      mem.addData(("u2", 2L), ("u3", 3L))
      assert(visible(3), "subsequent writes not visible mid-stream")
      // visible rows are fully queryable, not just countable
      assert(frame(s.execute("QUERY lv WHERE v >= 2")).count() == 2)
      assert(q.isActive)
    } finally { q.stop(); q.awaitTermination(30000) }
  }

  test("purgeContext erases one context across types, survives reopen, flushes pending rows") {
    val dir = Files.createTempDirectory("graft_store_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE a FIELDS { v: "int" }""")
    s.execute("""DEFINE b FIELDS { v: "int" }""")
    s.execute("""STORE a FOR u1 PAYLOAD {"v": 1}""")
    s.execute("""STORE a FOR u2 PAYLOAD {"v": 2}""")
    s.execute("""STORE b FOR u1 PAYLOAD {"v": 3}""")
    s.execute("FLUSH")
    // a pending (unflushed) row of the purged context must also go
    s.execute("""STORE a FOR u1 PAYLOAD {"v": 4}""")
    assert(s.purgeContext("u1") == 3L)
    assert(frame(s.execute("QUERY a")).collect().map(_.getAs[String]("context_id")).toSeq == Seq("u2"))
    assert(frame(s.execute("QUERY b")).count() == 0)
    // idempotent: nothing left to remove
    assert(s.purgeContext("u1") == 0L)
    // reopen: the purge is durable, untouched contexts remain
    val s2 = new EventStore(spark, dir)
    assert(frame(s2.execute("QUERY a FOR u2")).count() == 1)
    assert(frame(s2.execute("QUERY a FOR u1")).count() == 0)
    // the store still ingests normally after the rewrite
    s2.execute("""STORE a FOR u1 PAYLOAD {"v": 5}""")
    s2.execute("FLUSH")
    assert(frame(s2.execute("QUERY a FOR u1")).count() == 1)
  }

  test("HWM capture during an in-flight bulk ingest stays below the ingest's id block") {
    import org.apache.spark.sql.functions.{col, udf}
    val s = newStore()
    s.execute("""DEFINE t FIELDS { v: "int" }""")
    s.execute("""STORE t FOR c0 PAYLOAD {"v": 0}""")
    s.execute("FLUSH")
    val before = s.safeHwmEventId().get

    // a bulk ingest whose segment write BLOCKS mid-flight (UDF gated on a
    // latch), so its id block is allocated but uncommitted while we race
    HwmRaceGate.reset()
    // static module access inside the lambda — capturing the object ref
    // would make the closure unserializable
    val block = udf { (v: Int) =>
      HwmRaceGate.entered.countDown()
      HwmRaceGate.release.await(30, java.util.concurrent.TimeUnit.SECONDS)
      v
    }
    import spark.implicits._
    val df = Seq(("c1", 10L, 1), ("c1", 11L, 2), ("c2", 12L, 3))
      .toDF("ctx", "ts", "v").coalesce(1)
      .withColumn("v", block(col("v")))
    val fut = scala.concurrent.Future(s.ingestFrame("t", df, "ctx", Some("ts")))(
      scala.concurrent.ExecutionContext.global)
    assert(HwmRaceGate.entered.await(30, java.util.concurrent.TimeUnit.SECONDS))

    // a sync STORE lands NOW — visible immediately, id in a LATER block
    s.execute("""STORE t FOR c9 PAYLOAD {"v": 9}""")
    val rawMax = s.maxVisibleEventId().get
    val hwm = s.safeHwmEventId().get
    assert(rawMax > hwm, "raw visible max must run ahead of the capped mark")
    assert(hwm >= before)

    HwmRaceGate.release.countDown()
    val base = scala.concurrent.Await
      .result(fut, scala.concurrent.duration.Duration(60, "s"))
      .toOption.get
    // every row committed after the capture — the in-flight bulk rows AND
    // the racing sync row — sits ABOVE the mark, so a delta from `hwm`
    // catches all of them; nothing is permanently excluded
    assert(hwm < base)
    val ids = s.frame("t").select(col("event_id")).collect().map(_.getLong(0))
    assert(ids.length == 5)
    assert(ids.count(_ <= hwm) == 1) // only the pre-capture row
    assert(s.safeHwmEventId().get == ids.max) // cap lifts once committed
  }

  test("purgeBefore drops only rows older than the cutoff, durable across reopen") {
    val s = newStore() // injectable clock: stores stamp ts 1001, 1002, ...
    s.execute("""DEFINE a FIELDS { v: "int" }""")
    s.execute("""DEFINE b FIELDS { v: "int" }""")
    s.execute("""STORE a FOR u1 PAYLOAD {"v": 1}""") // ts 1001
    s.execute("""STORE b FOR u1 PAYLOAD {"v": 2}""") // ts 1002
    s.execute("""STORE a FOR u2 PAYLOAD {"v": 3}""") // ts 1003
    s.execute("FLUSH")
    s.execute("""STORE a FOR u3 PAYLOAD {"v": 4}""") // ts 1004, pending
    assert(s.purgeBefore(1003L) == 2L) // drops ts 1001 + 1002 (incl. pending flush)
    assert(frame(s.execute("QUERY a")).collect()
      .map(_.getAs[String]("context_id")).toSet == Set("u2", "u3"))
    assert(frame(s.execute("QUERY b")).count() == 0)
    assert(s.purgeBefore(1003L) == 0L) // idempotent
    val s2 = new EventStore(spark, s.root)
    assert(frame(s2.execute("QUERY a")).count() == 2)
  }
}
