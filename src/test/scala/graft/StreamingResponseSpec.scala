package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ast.{AggSpec, TimeGranularity}
import graft.store.{EventStore, ExecResult, Responses}
import graft.streaming.StreamingAggregates

class StreamingResponseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("streaming windowed aggregation: hourly counts and totals per group") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val stream = mem.toDF.toDF("context_id", "timestamp", "v")
    val agg = StreamingAggregates.windowed(stream, TimeGranularity.Hour,
      Seq(AggSpec.Count, AggSpec.Total("v")), groupBy = Seq("context_id"),
      watermarkDelay = None)
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("hourly").start()
    val h0 = 1705276800L // 2024-01-15T00:00:00Z
    mem.addData(("u1", h0 + 60, 5L), ("u1", h0 + 120, 7L), ("u2", h0 + 30, 1L),
      ("u1", h0 + 3700, 100L)) // second hour
    q.processAllAvailable()
    val rows = spark.table("hourly").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[String]("context_id"),
        r.getAs[Long]("count"), r.getAs[Long]("total_v"))).toSet
    q.stop()
    assert(rows == Set(
      (h0, "u1", 2L, 12L), (h0, "u2", 1L, 1L), (h0 + 3600, "u1", 1L, 100L)))
  }

  test("streaming windowed aggregation with watermark emits closed windows (append)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val stream = mem.toDF.toDF("context_id", "timestamp", "v")
    val agg = StreamingAggregates.windowed(stream, TimeGranularity.Hour,
      Seq(AggSpec.Count), watermarkDelay = Some("5 minutes"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("appendwm").start()
    val h0 = 1705276800L
    mem.addData(("u1", h0 + 10, 1L))
    q.processAllAvailable()
    mem.addData(("u1", h0 + 7500, 1L)) // advances watermark past hour 1
    q.processAllAvailable()
    mem.addData(("u1", h0 + 9000, 1L)) // one more batch so the closed window flushes
    q.processAllAvailable()
    val buckets = spark.table("appendwm").collect().map(_.getAs[Long]("bucket")).toSet
    q.stop()
    assert(buckets.contains(h0)) // first hour emitted after watermark passed
  }

  test("streaming PER WEEK buckets start Monday like the batch calendar default") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val stream = mem.toDF.toDF("context_id", "timestamp", "v")
    val agg = StreamingAggregates.windowed(stream, TimeGranularity.Week,
      Seq(AggSpec.Count), watermarkDelay = None)
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("weekly").start()
    // 2024-01-17 is a WEDNESDAY; its calendar week starts Mon 2024-01-15.
    // A bare window(col, "7 days") is epoch-aligned (1970-01-01 = Thursday)
    // and would bucket it at Thu 2024-01-11 — three days off the batch
    // default (date_trunc('week'))
    val wed = 1705449600L // 2024-01-17T00:00:00Z
    val mon = 1705276800L // 2024-01-15T00:00:00Z
    mem.addData(("u1", wed, 1L))
    q.processAllAvailable()
    val buckets = spark.table("weekly").collect().map(_.getAs[Long]("bucket")).toSet
    q.stop()
    assert(buckets == Set(mon), s"week bucket must start Monday ($mon), got $buckets")
    // a non-UTC zone in calendar mode is rejected up front (window() cannot
    // express DST-correct local boundaries)
    spark.conf.set("spark.graft.time.zone", "America/New_York")
    try intercept[IllegalArgumentException] {
      StreamingAggregates.windowed(stream, TimeGranularity.Week, Seq(AggSpec.Count))
    } finally spark.conf.unset("spark.graft.time.zone")
  }

  test("month granularity rejected on the streaming path") {
    assertThrows[IllegalArgumentException](StreamingAggregates.windowWidth(TimeGranularity.Month))
  }

  test("JSON response frames: schema, batches, end count") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null.asInstanceOf[String], 3.5))
      .toDF("id", "s", "x")
    val frames = Responses.jsonFrames(df.orderBy("id"), batchSize = 2).toSeq
    assert(frames.head == """{"type":"schema","columns":["id","s","x"]}""")
    assert(frames.last == """{"type":"end","row_count":3}""")
    assert(frames.length == 4) // schema + 2 batches + end
    assert(frames(1).contains("""[1,"a",1.5]"""))
    assert(frames(2).contains("""[3,null,3.5]"""))
  }

  test("Arrow IPC frames round-trip and agree with the JSON renderer") {
    import spark.implicits._
    import org.apache.arrow.vector._
    import scala.jdk.CollectionConverters._
    val df = Seq((1L, "a", 1.5, true), (2L, "b", 2.5, false),
      (3L, null.asInstanceOf[String], 3.5, true)).toDF("id", "s", "x", "f").orderBy("id")
    val bytes = Responses.arrowFrame(df, batchSize = 2)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    assert(reader.getVectorSchemaRoot.getSchema.getFields.asScala.map(_.getName) ==
      Seq("id", "s", "x", "f"))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[String], Double, Boolean)]
    while (reader.loadNextBatch()) {
      val root = reader.getVectorSchemaRoot
      val id = root.getVector("id").asInstanceOf[BigIntVector]
      val s = root.getVector("s").asInstanceOf[VarCharVector]
      val x = root.getVector("x").asInstanceOf[Float8Vector]
      val f = root.getVector("f").asInstanceOf[BitVector]
      (0 until root.getRowCount).foreach { i =>
        rows += ((id.get(i),
          if (s.isNull(i)) None else Some(new String(s.get(i), "UTF-8")),
          x.get(i), f.get(i) == 1))
      }
    }
    reader.close(); alloc.close()
    // same rows the JSON renderer produces, in the same order
    assert(rows.toSeq == Seq(
      (1L, Some("a"), 1.5, true), (2L, Some("b"), 2.5, false), (3L, None, 3.5, true)))
    val jsonRows = Responses.jsonFrames(df, batchSize = 2).toSeq
      .filter(_.contains("\"batch\"")).mkString
    assert(jsonRows.contains("""[1,"a",1.5,true]""") && jsonRows.contains("""[3,null,3.5,true]"""))
  }

  test("snapshot export/import roundtrip and compaction") {
    val dir1 = Files.createTempDirectory("graft_snap1_").toString
    val s1 = new EventStore(spark, dir1)
    s1.execute("""DEFINE t FIELDS { v: "int" }""")
    // several small segments (flush per store)
    (1 to 6).foreach { i =>
      s1.execute(s"""STORE t FOR c${i % 2} PAYLOAD {"v": $i}""")
      s1.execute("FLUSH")
    }
    val snap = Files.createTempDirectory("graft_snapout_").toString
    s1.exportSnapshot(snap)

    // manifest records the type with its schema hash, rows and ts range
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(snap, "manifest.json")), "UTF-8")
    assert(manifest.contains("\"graft-snapshot\"") && manifest.contains("\"rows\": 6"))

    val dir2 = Files.createTempDirectory("graft_snap2_").toString
    val s2 = new EventStore(spark, dir2)
    assert(s2.importSnapshot(snap) == Right(1))
    assert(s2.frame("t").count() == 6)
    assert(s2.frame("t").agg(sum(col("v"))).head.getLong(0) == 21L)

    // a store holding a CONFLICTING definition of 't' refuses the import
    // wholesale (all-or-nothing; nothing lands)
    val dir3 = Files.createTempDirectory("graft_snap3_").toString
    val s3 = new EventStore(spark, dir3)
    s3.execute("""DEFINE t FIELDS { v: "string" }""")
    val refused = s3.importSnapshot(snap)
    assert(refused.isLeft && refused.left.exists(_.contains("schema mismatch")))
    assert(s3.frame("t").count() == 0)

    // a tampered schema file no longer matches the manifest hash: rejected
    val snap2 = Files.createTempDirectory("graft_snapout2_").toString
    s1.exportSnapshot(snap2)
    val sf = java.nio.file.Paths.get(snap2, "_schemas", "t.json")
    Files.write(sf, new String(Files.readAllBytes(sf), "UTF-8")
      .replace("\"int\"", "\"float\"").getBytes("UTF-8"))
    val dir4 = Files.createTempDirectory("graft_snap4_").toString
    val s4 = new EventStore(spark, dir4)
    val tampered = s4.importSnapshot(snap2)
    assert(tampered.isLeft && tampered.left.exists(_.contains("hash mismatch")))

    // malformed manifests are a clean Left, never an NPE: missing 'types'
    // array, and a type entry without schema_md5
    val snap3 = Files.createTempDirectory("graft_snapout3_").toString
    s1.exportSnapshot(snap3)
    val mf = java.nio.file.Paths.get(snap3, "manifest.json")
    val origManifest = new String(Files.readAllBytes(mf), "UTF-8")
    Files.write(mf, """{"format": "graft-snapshot"}""".getBytes("UTF-8"))
    val noTypes = new EventStore(spark,
      Files.createTempDirectory("graft_snap5_").toString).importSnapshot(snap3)
    assert(noTypes.isLeft && noTypes.left.exists(_.contains("missing 'types'")))
    Files.write(mf, """{"types": [{"name": "t"}]}""".getBytes("UTF-8"))
    val noMd5 = new EventStore(spark,
      Files.createTempDirectory("graft_snap6_").toString).importSnapshot(snap3)
    assert(noMd5.isLeft && noMd5.left.exists(_.contains("missing name/schema_md5")))
    Files.write(mf, origManifest.getBytes("UTF-8"))

    // a corrupt data file rejects the WHOLE import before anything lands
    val dataFile = {
      import scala.jdk.CollectionConverters._
      Files.list(java.nio.file.Paths.get(snap3, "t")).iterator().asScala
        .find(_.toString.endsWith(".json")).get
    }
    Files.write(dataFile, "{not json at all".getBytes("UTF-8"))
    val s7 = new EventStore(spark, Files.createTempDirectory("graft_snap7_").toString)
    val corrupt = s7.importSnapshot(snap3)
    // rejected by the data-hash cross-check (r15) before the FAILFAST read
    assert(corrupt.isLeft && corrupt.left.exists(e =>
      e.contains("data hash mismatch") || e.contains("unreadable snapshot data")))
    assert(s7.eventTypes.isEmpty) // no schema registered, no data imported

    // WELL-FORMED JSON whose values mismatch the schema types must also
    // reject the import (the FAILFAST pass parses the FULL schema — a
    // count()-only check would prune to empty and let this land as nulls)
    Files.write(dataFile,
      """{"context_id":"c0","event_type":"t","timestamp":1,"event_id":1,"v":"not-an-int"}"""
        .getBytes("UTF-8"))
    val s8 = new EventStore(spark, Files.createTempDirectory("graft_snap8_").toString)
    val mistyped = s8.importSnapshot(snap3)
    assert(mistyped.isLeft && mistyped.left.exists(e =>
      e.contains("data hash mismatch") || e.contains("unreadable snapshot data")))
    assert(s8.eventTypes.isEmpty)

    // compaction reduces file count, preserves data
    s1.compact(targetFiles = 1)
    assert(s1.frame("t").count() == 6)
    assert(s1.frame("t").agg(sum(col("v"))).head.getLong(0) == 21L)
    val files = Files.list(java.nio.file.Paths.get(dir1, "data", "t"))
      .iterator()
    val parquets = new scala.collection.mutable.ArrayBuffer[String]
    files.forEachRemaining(p => if (p.toString.endsWith(".parquet")) parquets += p.toString)
    assert(parquets.size == 1)
  }

  test("importSnapshot is crash-safe: re-run after a partial import never duplicates") {
    import java.nio.file.Paths
    val src = new EventStore(spark, Files.createTempDirectory("graft_crash_src_").toString)
    src.execute("""DEFINE a FIELDS { v: "int" }""")
    src.execute("""DEFINE b FIELDS { w: "int" }""")
    (1 to 4).foreach { i =>
      src.execute(s"""STORE a FOR c$i PAYLOAD {"v": $i}""")
      src.execute(s"""STORE b FOR c$i PAYLOAD {"w": ${i * 10}}""")
    }
    src.execute("FLUSH")
    val snap = Files.createTempDirectory("graft_crash_snap_").toString
    src.exportSnapshot(snap)

    // full import, then RE-IMPORT of the same snapshot: idempotent — no
    // row lands twice (this is the property crash recovery relies on)
    val dir = Files.createTempDirectory("graft_crash_dst_").toString
    val st = new EventStore(spark, dir)
    assert(st.importSnapshot(snap) == Right(2))
    assert(st.frame("a").count() == 4 && st.frame("b").count() == 4)
    assert(st.importSnapshot(snap) == Right(2))
    assert(st.frame("a").count() == 4, "re-import duplicated type a")
    assert(st.frame("b").count() == 4, "re-import duplicated type b")

    // simulate a crash AFTER type a committed but BEFORE type b: wipe b's
    // segments and its commit marker (types import in sorted order, so a
    // real crash leaves exactly a prefix). The re-run must skip a (marker
    // present) and restore b — total rows exact, never doubled.
    import scala.jdk.CollectionConverters._
    val bDir = Paths.get(dir, "data", "b")
    Files.list(bDir).iterator().asScala.toSeq.foreach(Files.delete)
    Files.delete(bDir)
    assert(st.importSnapshot(snap) == Right(2))
    assert(st.frame("a").count() == 4, "recovery re-run duplicated the committed type")
    assert(st.frame("b").count() == 4, "recovery re-run did not restore the lost type")
    assert(st.frame("b").agg(sum(col("w"))).head.getLong(0) == 100L)

    // and a partially-written type (parts present, NO marker — crash mid
    // segment write) is replaced, not appended beside
    val aParts = Files.list(Paths.get(dir, "data", "a")).iterator().asScala.toSeq
    val aMarker = aParts.find(_.getFileName.toString.startsWith("_ingest_snap_")).get
    Files.delete(aMarker)
    assert(st.importSnapshot(snap) == Right(2))
    assert(st.frame("a").count() == 4, "marker-less retry appended instead of replacing")

    // a DIFFERENT snapshot of the same types still appends (distinct key)
    src.execute("""STORE a FOR c9 PAYLOAD {"v": 9}""")
    src.execute("FLUSH")
    val snap2 = Files.createTempDirectory("graft_crash_snap2_").toString
    src.exportSnapshot(snap2)
    assert(st.importSnapshot(snap2) == Right(2))
    assert(st.frame("a").count() == 9, "second snapshot must append (4 + 5 rows)")
  }

  test("manifested snapshot: a data file edited after export is rejected, not skipped") {
    import java.nio.file.Paths
    import scala.jdk.CollectionConverters._
    val src = new EventStore(spark, Files.createTempDirectory("graft_dmd5_src_").toString)
    src.execute("""DEFINE t FIELDS { v: "int" }""")
    (1 to 4).foreach(i => src.execute(s"""STORE t FOR c$i PAYLOAD {"v": $i}"""))
    src.execute("FLUSH")
    val snap = Files.createTempDirectory("graft_dmd5_snap_").toString
    src.exportSnapshot(snap)
    assert(new String(Files.readAllBytes(Paths.get(snap, "manifest.json")), "UTF-8")
      .contains("data_md5"))
    // same-size in-place edit: rows/ts-range (and thus the manifest bytes)
    // unchanged — before the data_md5 cross-check this re-imported under
    // the SAME key and was silently skipped as already-committed
    val edited = Files.list(Paths.get(snap, "t")).iterator().asScala
      .filter(_.toString.endsWith(".json"))
      .find(p => new String(Files.readAllBytes(p), "UTF-8").contains("\"v\":4")).get
    val body = new String(Files.readAllBytes(edited), "UTF-8")
    Files.write(edited, body.replace("\"v\":4", "\"v\":9").getBytes("UTF-8"))
    val st = new EventStore(spark, Files.createTempDirectory("graft_dmd5_dst_").toString)
    val refused = st.importSnapshot(snap)
    assert(refused.isLeft && refused.left.exists(_.contains("data hash mismatch")),
      s"edited manifested snapshot must be rejected, got $refused")
    assert(st.eventTypes.isEmpty, "nothing may land from a rejected snapshot")
  }

  test("manifest-less snapshot: same-size in-place edit re-imports instead of skipping") {
    import java.nio.file.Paths
    import scala.jdk.CollectionConverters._
    val src = new EventStore(spark, Files.createTempDirectory("graft_mless_src_").toString)
    src.execute("""DEFINE t FIELDS { v: "int" }""")
    (1 to 6).foreach(i => src.execute(s"""STORE t FOR c${i % 2} PAYLOAD {"v": $i}"""))
    src.execute("FLUSH")
    val snap = Files.createTempDirectory("graft_mless_snap_").toString
    src.exportSnapshot(snap)
    // drop the manifest: the import falls back to the name+size+mtime key
    Files.delete(Paths.get(snap, "manifest.json"))

    val st = new EventStore(spark, Files.createTempDirectory("graft_mless_dst_").toString)
    assert(st.importSnapshot(snap) == Right(1))
    assert(st.frame("t").count() == 6)
    assert(st.frame("t").agg(sum(col("v"))).head.getLong(0) == 21L)
    // untouched re-import stays idempotent (same names, sizes, mtimes)
    assert(st.importSnapshot(snap) == Right(1))
    assert(st.frame("t").count() == 6, "untouched manifest-less re-import duplicated rows")

    // SAME-SIZE in-place edit: "v":6 → "v":9 keeps every file's byte length;
    // under the old name+size key this collided with the committed marker
    // and the edited snapshot was silently skipped (ADVICE r14)
    val edited = Files.list(Paths.get(snap, "t")).iterator().asScala
      .filter(_.toString.endsWith(".json"))
      .find(p => new String(Files.readAllBytes(p), "UTF-8").contains("\"v\":6")).get
    val body = new String(Files.readAllBytes(edited), "UTF-8")
    Files.write(edited, body.replace("\"v\":6", "\"v\":9").getBytes("UTF-8"))
    // drop the Hadoop local-FS checksum sidecar the export left behind —
    // an externally edited snapshot wouldn't carry a stale .crc
    val crc = edited.getParent.resolve(s".${edited.getFileName}.crc")
    if (Files.exists(crc)) Files.delete(crc)
    Files.setLastModifiedTime(edited,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(edited).toMillis + 5000L))
    assert(st.importSnapshot(snap) == Right(1))
    assert(st.frame("t").count() == 12, "edited manifest-less snapshot was skipped")
    // appended pass carries the edit: 21 + (21 - 6 + 9) = 45
    assert(st.frame("t").agg(sum(col("v"))).head.getLong(0) == 45L)
  }
}
