package graft.store

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ast._
import graft.engine.{EventSource, QueryCompiler}
import graft.parser.CommandParser
import graft.schema.{EventSchema, FieldType}

/** The engine's storage layer — the Spark rebuild of the reference's write
  * path (sneldb WAL → MemTable → segments, `docs/src/design/storage_engine.md`)
  * per SURVEY.md §8.1:
  *
  *  - layout: `root/_schemas/<type>.json` catalog; committed events under
  *    `root/data/<type>/` as Parquet (the segment analog — row-group stats,
  *    dictionary and bloom filters replace the reference's zones/XOR/SuRF
  *    indexes for free);
  *  - a small in-memory memtable keeps fresh writes visible to reads before
  *    FLUSH (reference MemTable semantics); `flushThreshold` triggers an
  *    automatic flush like the reference's `flush_threshold`;
  *  - durability: callers needing WAL semantics ingest through Structured
  *    Streaming (see [[Ingest]]) where checkpointing replaces the WAL —
  *    the synchronous STORE path here is the test/dev surface;
  *  - `event_id` is a monotonically increasing per-store sequence persisted
  *    across flushes (replay order = `(timestamp, event_id)`).
  *
  * At scale the layout partitions by event type (separate directories →
  * partition pruning) and Parquet's min/max stats give temporal zone
  * pruning; `context_id` bucketing for replay/sequence locality is applied
  * by [[flushSorted]] (sortWithinPartitions on write).
  */
final class EventStore(val spark: SparkSession, val root: String,
    flushThreshold: Int = 32768,
    clock: () => Long = () => System.currentTimeMillis() / 1000,
    walEnabled: Boolean = true) extends EventSource {

  graft.functions.Md5Long.register(spark) // pipeline SQL lambdas over store data
  graft.functions.DotLong.register(spark) // native dot product in SQL fragments

  private val schemasDir = Paths.get(root, "_schemas")
  private val dataDir = Paths.get(root, "data")
  Files.createDirectories(schemasDir)
  Files.createDirectories(dataDir)

  // concurrent: DEFINE mutates while concurrent STORE/flush/frame read, and
  // a LinkedHashMap rehash under a reader is a torn map (r15 review finding
  // — every other shared structure here is already locked). Iteration order
  // is immaterial: every ordered consumer sorts ([[eventTypes]], snapshot
  // manifests, schema hashes).
  private val schemas = scala.collection.concurrent.TrieMap.empty[String, EventSchema]
  private val memtable = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Row]]

  // event_id space: (batch << 50) | offset. Bulk ingests use Spark's
  // monotonically_increasing_id (partition << 33 | row — fits 50 bits up to
  // 131k partitions) as the offset; the synchronous STORE path uses a dense
  // counter. Uniqueness is per store; ordering within a context follows
  // append order, which is what REPLAY requires.
  //
  // SHOW's delta watermark filters on event_id alone, so ids must stay
  // monotonic across the sync and bulk paths: the sync block is re-allocated
  // whenever any ingestFrame has taken a later block (otherwise a sync STORE
  // after a bulk ingest would land BELOW an already-captured high-water mark
  // and be silently excluded from every materialization delta).
  private val batchSeq = new AtomicLong(1L)
  private val idLock = new Object
  // Bulk-ingest id blocks allocated but not yet committed. A bulk write is
  // long; a sync STORE (or second ingest) landing meanwhile takes a LATER
  // block and becomes visible first, so "max visible id" can exceed an
  // in-flight block — an HWM captured from it would permanently exclude the
  // in-flight rows from every SHOW delta. [[safeHwmEventId]] caps the mark
  // below the smallest in-flight block instead.
  private val inflightIngestBases = mutable.SortedSet.empty[Long]
  private var syncBlockBase = -1L
  private var syncOffset = 0L

  /** Block 8192 << 50 = 2⁶³ overflows the sign bit: negative event_ids sit
    * below every recorded HWM, silently excluding all new rows from every
    * SHOW delta forever (r15 review finding). One block is consumed per
    * non-empty streaming micro-batch, so 8191 lifetime blocks is HOURS of
    * steady 1-second triggers — reclaim is mandatory, not theoretical. */
  private val MaxIdBlocks = 1L << 13

  /** Allocate the next 2⁵⁰-id block (caller holds `idLock`). When the block
    * counter would overflow the 13-bit space, REBASE it to just past the
    * highest block that is visible, in-flight, or serving sync STOREs —
    * blocks are sparsely used (a micro-batch burns a whole block for a few
    * thousand ids), so trailing unused block space is reclaimed. Ids stay
    * monotonic above every issued id: the floor exceeds the max visible id
    * (parquet footers + memtable) and every block that could still commit
    * rows, so [[safeHwmEventId]]'s vis-first argument is preserved. */
  private def allocateBlockLocked(): Long = {
    if (batchSeq.get() >= MaxIdBlocks) {
      val visBlock = maxVisibleEventId().map(_ >>> 50).getOrElse(0L)
      val liveBlock = (inflightIngestBases.map(_ >>> 50) ++
        (if (syncBlockBase >= 0) Seq(syncBlockBase >>> 50) else Nil)).maxOption.getOrElse(0L)
      val floor = math.max(visBlock, liveBlock) + 1L
      require(floor < MaxIdBlocks,
        s"event_id block space exhausted (visible block $visBlock, live block $liveBlock)")
      batchSeq.set(floor)
    }
    batchSeq.getAndIncrement() << 50
  }

  /** Test hook: force the block counter to a given value (the overflow
    * reclaim is unreachable through the public API without ~8k ingests). */
  private[graft] def forceBatchSeqForTest(v: Long): Unit = batchSeq.set(v)

  private def nextStoreId(): Long = idLock.synchronized {
    if (syncBlockBase < 0 || (syncBlockBase >>> 50) != batchSeq.get() - 1) {
      syncBlockBase = allocateBlockLocked()
      syncOffset = 0L
    }
    val id = syncBlockBase + syncOffset
    syncOffset += 1
    id
  }

  // write-ahead log for the synchronous STORE path: uncommitted memtable
  // rows survive restarts (reference `wal/*` scenarios; the streaming path
  // gets the same guarantee from checkpoints — see [[Ingest]]).
  // Appends are serialized behind a lock on a shared channel and fsync'd, so
  // concurrent STOREs can't interleave partial lines and an acknowledged
  // event is on disk before the ack (reference WAL fsync semantics).
  private val walFile = Paths.get(root, "_wal", "events.jsonl")
  private val walLock = new Object
  private var walChannel: java.nio.channels.FileChannel = null

  /** Serializes [[flush]] so two threads crossing `flushThreshold` can't
    * both write the same memtable snapshot to segments (duplicate rows). */
  private val flushLock = new Object

  /** Guards data-dir REWRITE swaps ([[compact]]/[[purgeContext]]/
    * [[purgeBefore]]) against concurrent segment writers: a streaming
    * micro-batch committing into `data/<t>` during the swap either made
    * `Files.move(tmp, dir)` throw (Spark re-created the dir — the type left
    * holding ONLY the new segment, the corpus stranded in `<t>.old` for the
    * next restart's recoverSwaps to DELETE as a committed swap) or was
    * swept into `<t>.old` and destroyed (r15 review finding). Segment
    * writers share the read side (ingests stay concurrent with each
    * other); each per-type rewrite+swap holds the write side. */
  private val segmentLock = new java.util.concurrent.locks.ReentrantReadWriteLock()
  private def withSegmentRead[A](f: => A): A = {
    val l = segmentLock.readLock(); l.lock(); try f finally l.unlock()
  }
  private def withSegmentRewrite[A](f: => A): A = {
    val l = segmentLock.writeLock(); l.lock(); try f finally l.unlock()
  }

  recoverSwaps() // BEFORE loadCatalog: its id high-water scan must see restored data
  loadCatalog()
  if (walEnabled) replayWal()

  // ---------------- catalog ----------------

  private def schemaFile(t: String): Path = schemasDir.resolve(s"$t.json")

  /** Crash recovery for the rewrite-swap sites ([[compact]],
    * [[purgeContext]], [[purgeBefore]] — all do `write tmp; move dir→old;
    * move tmp→dir; delete old`). A crash between the two moves leaves the
    * type's ONLY copy under `<t>.old`, which readers never list — silent
    * data loss on restart without this. Each local move is an atomic
    * rename, so the directory states enumerate the crash points exactly:
    *
    *  - `<t>.old` present, `<t>` missing  → crashed between the moves:
    *    restore the original (`old` → `dir`). The rewrite is re-runnable.
    *  - `<t>.old` and `<t>` both present  → crashed before the cleanup
    *    delete: the swap committed; finish the delete.
    *  - stale `*.compact.tmp` / `*.purge.tmp` / `.ingest_*.tmp` scratch →
    *    crashed before (or during) its swap with the original intact, or
    *    mid idempotent-segment write (whose retry rewrites it): delete.
    *
    * Runs BEFORE [[loadCatalog]] so the id high-water scan sees the
    * restored rows. */
  private def recoverSwaps(): Unit = {
    if (!Files.isDirectory(dataDir)) return
    EventStore.listDir(dataDir)
      .filter(_.getFileName.toString.endsWith(".old"))
      .foreach { old =>
        val dir = dataDir.resolve(old.getFileName.toString.stripSuffix(".old"))
        if (!Files.isDirectory(dir)) Files.move(old, dir)
        else deleteRecursively(old)
      }
    EventStore.listDir(dataDir)
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".compact.tmp") || n.endsWith(".purge.tmp") ||
          (n.startsWith(".ingest_") && n.endsWith(".tmp"))
      }
      .foreach(deleteRecursively)
  }

  private def loadCatalog(): Unit = {
    if (!Files.isDirectory(schemasDir)) return
    EventStore.listDir(schemasDir).iterator
      .filter(_.toString.endsWith(".json"))
      .foreach { p =>
        val json = new String(Files.readAllBytes(p), "UTF-8")
        EventStore.schemaFromJson(json).foreach(s => schemas(s.eventType) = s)
      }
    // restore the batch high-water from committed data — ONE Spark job over
    // the union of per-type id columns, not one job per type
    val committedTypes = listCommittedTypes().filter(schemas.contains)
    if (committedTypes.nonEmpty) {
      val ids = committedTypes.map(t => committedFrame(t)
          .select(col(EventSchema.EventId).as("id")))
        .reduce(_ union _)
      val maxId = ids.agg(max(col("id"))).collect().headOption
        .filterNot(_.isNullAt(0)).map(_.getLong(0)).getOrElse(0L)
      batchSeq.set((maxId >>> 50) + 1)
    }
  }

  // ---------------- WAL ----------------

  private def appendWal(eventType: String, contextId: String, ts: Long, id: Long,
      values: Vector[Any], schema: EventSchema): Unit = {
    val mapper = EventStore.mapperInstance
    val n = mapper.createObjectNode()
    n.put("t", eventType); n.put("c", contextId); n.put("ts", ts); n.put("id", id)
    // field names travel with the entry so recovery maps values BY NAME — a
    // DEFINE that adds/reorders fields between the append and a restart can't
    // shift values into the wrong columns
    val names = n.putArray("f")
    schema.fields.foreach { case (fname, _) => names.add(fname) }
    val arr = n.putArray("v")
    values.foreach {
      case null        => arr.addNull()
      case s: String   => arr.add(s)
      case l: Long     => arr.add(l)
      case i: Int      => arr.add(i.toLong)
      case d: Double   => arr.add(d)
      case b: Boolean  => arr.add(b)
      case other       => arr.add(other.toString)
    }
    val bytes = (mapper.writeValueAsString(n) + "\n").getBytes("UTF-8")
    walLock.synchronized {
      if (walChannel == null || !walChannel.isOpen) {
        Files.createDirectories(walFile.getParent)
        walChannel = java.nio.channels.FileChannel.open(walFile,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.APPEND)
      }
      walChannel.write(java.nio.ByteBuffer.wrap(bytes))
      walChannel.force(false) // acknowledged ⇒ durable (reference WAL fsync)
    }
  }

  /** Atomically replace the WAL with exactly `kept` lines (tmp + move), or
    * delete it when empty. Closes the append channel so the next
    * [[appendWal]] reopens against the rewritten file — never against a
    * replaced inode. A crash mid-rewrite leaves either the old file or the
    * new one, both parseable. */
  private def rewriteWal(kept: Seq[String]): Unit = walLock.synchronized {
    if (walChannel != null && walChannel.isOpen) walChannel.close()
    walChannel = null
    if (kept.isEmpty) Files.deleteIfExists(walFile)
    else {
      val tmp = walFile.resolveSibling("events.jsonl.tmp")
      Files.write(tmp, kept.mkString("", "\n", "\n").getBytes("UTF-8"))
      Files.move(tmp, walFile, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** WAL lines parsed with TORN-TAIL tolerance: a crash mid-append leaves a
    * partial final line — that write was never fsync-acknowledged (the ack
    * follows `force`), so dropping it loses nothing, whereas parsing it
    * unguarded threw out of the constructor and made the store UNOPENABLE
    * until someone hand-edited the WAL (r15 review finding). Appends are
    * serialized, so only the LAST line can be torn; an unparseable earlier
    * line is real corruption and still fails loudly.
    *
    * A dropped tail is also truncated ON DISK immediately (ADVICE r15): the
    * append channel opens with APPEND, so leaving the fragment in place
    * would concatenate the next acknowledged line onto it — a merged line
    * that the following restart either fails to parse mid-file (store
    * unopenable) or, if last, drops silently, losing an fsync-acknowledged
    * write. */
  private def readWalLines(): Seq[(String, com.fasterxml.jackson.databind.JsonNode)] = {
    if (!Files.exists(walFile)) return Nil
    val lines = Files.readAllLines(walFile).asScala.filter(_.nonEmpty).toSeq
    var tornTail = false
    val parsed = lines.zipWithIndex.flatMap { case (line, i) =>
      try Some(line -> EventStore.readTree(line))
      catch {
        case e: Exception if i == lines.size - 1 =>
          org.slf4j.LoggerFactory.getLogger("graft.store.EventStore").warn(
            s"dropping torn WAL tail line (crash mid-append, never acknowledged): " +
              s"${e.getMessage}")
          tornTail = true
          None
        case e: Exception =>
          throw new IllegalStateException(
            s"corrupt WAL entry at line ${i + 1} of $walFile (not the torn-tail " +
              "crash artifact — refusing to skip acknowledged data)", e)
      }
    }
    if (tornTail) rewriteWal(parsed.map(_._1))
    parsed
  }

  /** Truncate the WAL prefix covered by a flush: drop every entry with
    * `id <= cutoff`, keep entries appended after the memtable swap (their ids
    * are strictly greater — [[store]] allocates the id and appends WAL + row
    * under one lock, so id order is append order). */
  private def pruneWal(cutoff: Long): Unit = walLock.synchronized {
    if (!Files.exists(walFile)) return
    val kept = readWalLines().collect {
      case (line, n) if n.get("id").asLong() > cutoff => line
    }
    rewriteWal(kept)
  }

  /** Rebuild the memtable from unflushed WAL entries (crash/restart
    * recovery). Entries whose rows already reached a committed segment —
    * the flush crash-window, where a crash lands after `writeSegment(t)` but
    * before the WAL prune — are skipped by an EXACT membership probe: one
    * Spark job asking which candidate event_ids exist in committed Parquet.
    * A per-type max-id heuristic is wrong here: a bulk [[ingestFrame]] block
    * inflates the committed max above an unflushed sync STORE's id, which
    * would silently drop the fsync-acknowledged entry (ADVICE r3). Ids are
    * restored verbatim; the batch sequence resumes past the recovered
    * high-water so no id block is reused. */
  private def replayWal(): Unit = {
    if (!Files.exists(walFile)) return
    val lines = readWalLines().map(_._2)
    if (lines.isEmpty) return
    val candidates = lines.groupBy(_.get("t").asText()).map { case (t, ns) =>
      t -> ns.map(_.get("id").asLong()).toSet
    }
    val committedIds: Set[Long] = {
      val probed = candidates.keys.toSeq.sorted
        .filter(t => schemas.contains(t) && Files.isDirectory(dataDir.resolve(t)))
      if (probed.isEmpty) Set.empty
      else probed.map { t =>
        committedFrame(t).select(col(EventSchema.EventId))
          .where(col(EventSchema.EventId).isInCollection(candidates(t)))
      }.reduce(_ union _).collect().map(_.getLong(0)).toSet
    }
    var maxId = 0L
    lines.foreach { n =>
      val t = n.get("t").asText()
      val id = n.get("id").asLong()
      if (!committedIds(id)) schemas.get(t).foreach { schema =>
        // map recorded values by field name against the CURRENT schema;
        // legacy entries without names fall back to positional zip
        val recorded: Map[String, com.fasterxml.jackson.databind.JsonNode] =
          if (n.has("f")) {
            val names = n.get("f").elements().asScala.map(_.asText()).toVector
            names.zip(n.get("v").elements().asScala.toVector).toMap
          } else {
            schema.fields.map(_._1).zip(n.get("v").elements().asScala.toVector).toMap
          }
        val vals = schema.fields.map { case (fname, ft) =>
          recorded.get(fname) match {
            case None => null
            case Some(v) if v.isNull => null
            case Some(v) =>
              FieldType.base(ft) match {
                case FieldType.StringT | _: FieldType.EnumT => v.asText()
                case FieldType.I64T | FieldType.U64T |
                     FieldType.TimestampT | FieldType.DateT => v.asLong()
                case FieldType.F64T  => v.asDouble()
                case FieldType.BoolT => v.asBoolean()
                case _               => v.asText()
              }
          }
        }
        maxId = math.max(maxId, id)
        val row = Row.fromSeq(Seq(n.get("c").asText(), t, n.get("ts").asLong(), id) ++ vals)
        memtable.getOrElseUpdate(t, mutable.ArrayBuffer.empty) += row
      }
    }
    if (maxId > 0) batchSeq.set(math.max(batchSeq.get(), (maxId >>> 50) + 1))
  }

  def define(cmd: DefineCmd): Either[String, EventSchema] = {
    val version = cmd.version.getOrElse(schemas.get(cmd.eventType).map(_.version + 1).getOrElse(1))
    EventSchema.fromSpecs(cmd.eventType, version, cmd.fields) match {
      case Left(err) => Left(err)
      case Right(s) =>
        schemas.get(cmd.eventType) match {
          case Some(existing) if existing.fields == s.fields => Right(existing) // idempotent
          case Some(existing) if cmd.version.forall(_ <= existing.version) =>
            Left(s"event type '${cmd.eventType}' already defined (v${existing.version}); bump with AS <version> to evolve")
          case _ =>
            schemas(cmd.eventType) = s
            Files.write(schemaFile(cmd.eventType), EventStore.schemaToJson(s).getBytes("UTF-8"))
            Right(s)
        }
    }
  }

  /** Store-visible wall clock (injectable in tests; retention ages against it). */
  def now: Long = clock()

  def schemaFor(t: String): Option[EventSchema] = schemas.get(t)
  override def schemaOf(t: String): Option[EventSchema] = schemas.get(t)

  // ---------------- write path ----------------

  /** Synchronous STORE: validate against the schema, normalize times, append
    * to the memtable; auto-flush at the threshold (reference
    * `handlers/store.rs:22`). */
  def store(cmd: StoreCmd): Either[String, Long] = {
    val schema = schemas.getOrElse(cmd.eventType,
      return Left(s"No schema defined for event type '${cmd.eventType}'"))
    EventStore.parseJsonObject(cmd.payloadJson) match {
      case Left(err) => Left(s"invalid payload JSON: $err")
      case Right(payload) =>
        schema.validate(payload) match {
          case Left(err) => Left(err)
          case Right(values) =>
            // id allocation, WAL append and memtable append form one atomic
            // unit under the memtable lock: id order = append order, and an
            // entry and its row always land in the same flush generation —
            // flush()'s snapshot swap takes the same lock, so its max id is
            // a true cutoff between flushed and not-yet-flushed entries.
            val ts = clock()
            val (id, shouldFlush) = memtable.synchronized {
              val id = nextStoreId()
              val row = Row.fromSeq(Seq(cmd.contextId, cmd.eventType, ts, id) ++ values)
              if (walEnabled) appendWal(cmd.eventType, cmd.contextId, ts, id, values, schema)
              memtable.getOrElseUpdate(cmd.eventType, mutable.ArrayBuffer.empty) += row
              (id, memtable.valuesIterator.map(_.size).sum >= flushThreshold)
            }
            if (shouldFlush) flush()
            Right(id)
        }
    }
  }

  /** Bulk validated append (the body of the streaming ingest path): rows must
    * carry the payload columns; core columns are synthesized. If `tsCol` is
    * given it supplies the event timestamp (normalized to epoch seconds),
    * otherwise ingest time is used. Writes straight to Parquet (one job, no
    * driver loop) — the 100 TB path.
    *
    * When `idempotencyKey` is given (the streaming path derives it from
    * `(checkpoint, batchId)`), the write is EXACTLY-ONCE under micro-batch
    * replay: part files land under deterministic per-key names with
    * replace-not-append semantics, and a `_ingest_<key>.committed` marker is
    * the atomic commit point — a batch retried after a crash either skips
    * (marker present) or overwrites its own partial output, never duplicates
    * it (the WAL-replay-without-duplication guarantee of reference
    * `engine/core/wal/wal_recovery.rs`, re-keyed to the checkpoint). */
  def ingestFrame(eventType: String, df: DataFrame, contextCol: String,
      tsCol: Option[String] = None, idempotencyKey: Option[String] = None): Either[String, Long] = {
    val schema = schemas.getOrElse(eventType, return Left(s"No schema defined for event type '$eventType'"))
    idempotencyKey.foreach { key =>
      if (Files.exists(dataDir.resolve(eventType).resolve(s"_ingest_$key.committed")))
        return Right(-1L) // already committed — replayed micro-batch
    }
    val payloadCols = schema.fields.map { case (n, t) =>
      val c = col(n)
      val typed = t match {
        case FieldType.TimestampT | FieldType.DateT |
             FieldType.OptionalT(FieldType.TimestampT) | FieldType.OptionalT(FieldType.DateT) =>
          c.cast("long")
        case other => c.cast(other.sparkType)
      }
      typed.as(EventSchema.columnName(n)) // shadowed fields → internal column
    }
    // allocate + register atomically: an allocated-but-unregistered block
    // would be invisible to safeHwmEventId's cap read in the gap
    val base = idLock.synchronized {
      val b = allocateBlockLocked() // this ingest's id block
      inflightIngestBases += b
      b
    }
    try {
      val ts = tsCol.map(c => col(c).cast("long")).getOrElse(lit(clock()))
      val out = df.select(
        (Seq(col(contextCol).cast("string").as(EventSchema.ContextId),
          lit(eventType).as(EventSchema.EventType),
          ts.as(EventSchema.Timestamp),
          (monotonically_increasing_id() + base).as(EventSchema.EventId)) ++ payloadCols): _*)
      idempotencyKey match {
        case None      => writeSegment(eventType, out)
        case Some(key) => writeSegmentIdempotent(eventType, out, key)
      }
    } finally idLock.synchronized { inflightIngestBases -= base }
    Right(base)
  }

  /** Write a segment under deterministic `ingest-<key>-<i>.parquet` names,
    * then drop the commit marker. Retries of the same key replace any
    * partial prior attempt instead of appending beside it. */
  private def writeSegmentIdempotent(t: String, df: DataFrame, key: String): Unit = withSegmentRead {
    val typeDir = dataDir.resolve(t)
    val tmp = dataDir.resolve(s".ingest_${t}_$key.tmp")
    df.sortWithinPartitions(EventSchema.ContextId, EventSchema.Timestamp, EventSchema.EventId)
      .write.mode("overwrite").parquet(tmp.toString)
    Files.createDirectories(typeDir)
    // clear stale parts from a crashed earlier attempt of THIS key (a retry
    // may produce a different part count — leftovers would be duplicates)
    EventStore.listDir(typeDir)
      .filter(_.getFileName.toString.startsWith(s"ingest-$key-"))
      .foreach(Files.delete)
    val parts = EventStore.listDir(tmp)
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.getFileName.toString)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(p, typeDir.resolve(s"ingest-$key-$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    deleteRecursively(tmp)
    Files.write(typeDir.resolve(s"_ingest_$key.committed"), // commit point
      "1".getBytes("UTF-8"))
  }

  /** FLUSH: memtable → committed Parquet segment (reference flusher).
    * Serialized behind [[flushLock]]; the memtable is STOLEN atomically
    * (snapshot + clear under the memtable lock) so a STORE racing with the
    * flush lands wholly in the next generation — its row can't be silently
    * dropped by a `clear()` nor its WAL entry deleted before its row is
    * durable. The WAL is pruned (not deleted) only after every segment write
    * commits, and only up to the snapshot's max id; a crash between a
    * segment write and the prune is covered by [[replayWal]]'s
    * committed-membership dedupe. */
  def flush(): Unit = flushLock.synchronized {
    val snapshot = memtable.synchronized {
      val snap = memtable.iterator.map { case (t, rows) => (t, rows.toVector) }.toVector
      memtable.clear()
      snap
    }
    var maxFlushed = Long.MinValue
    snapshot.foreach { case (t, rows) =>
      if (rows.nonEmpty) {
        val schema = schemas(t)
        val df = spark.createDataFrame(rows.asJava, schema.fullStruct)
        writeSegment(t, df)
        maxFlushed = math.max(maxFlushed, rows.iterator.map(_.getLong(3)).max)
      }
    }
    if (walEnabled) {
      if (maxFlushed != Long.MinValue) pruneWal(maxFlushed)
      else if (Files.exists(walFile))
        // empty memtable + surviving WAL entries = stale COMMITTED entries
        // from a crash between writeSegment and pruneWal (replayWal skips
        // them but leaves the file). purgeContext/purgeBefore rely on
        // "flush truncates the WAL first": left in place, those entries
        // resurrect purged rows on the next restart once the membership
        // probe no longer finds their ids in the rewritten segments (r15
        // review finding). Prune up to the max VISIBLE id — safe against
        // concurrent STOREs, which always allocate above every issued id.
        maxVisibleEventId().foreach(pruneWal)
    }
  }

  private def writeSegment(t: String, df: DataFrame): Unit = withSegmentRead {
    df.sortWithinPartitions(EventSchema.ContextId, EventSchema.Timestamp, EventSchema.EventId)
      .write.mode("append").parquet(dataDir.resolve(t).toString)
  }

  // ---------------- read path ----------------

  private def listCommittedTypes(): Seq[String] =
    if (Files.isDirectory(dataDir))
      EventStore.listDir(dataDir).iterator.filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filterNot(n => n.startsWith(".") || n.startsWith("_")).toSeq.sorted
    else Nil

  private def committedFrame(t: String): DataFrame = {
    val schema = schemas(t)
    val p = dataDir.resolve(t)
    if (Files.isDirectory(p)) spark.read.schema(schema.fullStruct).parquet(p.toString)
    else spark.createDataFrame(java.util.List.of[Row](), schema.fullStruct)
  }

  override def eventTypes: Seq[String] = schemas.keys.toSeq.sorted

  /** Max VISIBLE event_id across all types, from parquet footer column
    * statistics over the committed segments (driver metadata reads, no
    * Spark job) plus the memtable under its lock — the reference's
    * zone-stats read repurposed as the REMEMBER/SHOW high-water capture.
    * Returns None when the store holds no events; falls back to a Spark
    * scan if any segment lacks event_id stats (never written by this
    * engine, but an imported/foreign file could). Store-wide ids are
    * monotonic with visibility, so a scope-free max is a valid HWM for any
    * query: rows at or below it are all already visible. */
  def maxVisibleEventId(): Option[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    var best = Long.MinValue
    var any = false
    val types = listCommittedTypes().filter(schemas.contains)
    for (t <- types; p <- EventStore.listDir(dataDir.resolve(t))
         if p.getFileName.toString.endsWith(".parquet")) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        r.getFooter.getBlocks.forEach { b =>
          if (b.getRowCount > 0) {
            val c = b.getColumns.asScala
              .find(_.getPath.toDotString == EventSchema.EventId)
            val stats = c.map(_.getStatistics).orNull
            if (stats == null || stats.isEmpty || !stats.hasNonNullValue) {
              // stats missing: one Spark job over the union, the old path
              r.close()
              val ids = types.map(tt => committedFrame(tt)
                  .select(col(EventSchema.EventId).as("id"))).reduce(_ union _)
              val m = ids.agg(max(col("id"))).collect().headOption
                .filterNot(_.isNullAt(0)).map(_.getLong(0))
              val mem = memtableMaxId()
              return (m.toSeq ++ mem.toSeq).maxOption
            }
            best = math.max(best,
              stats.genericGetMax.asInstanceOf[java.lang.Long].longValue())
            any = true
          }
        }
      } finally scala.util.Try(r.close())
    }
    val mem = memtableMaxId()
    if (mem.isDefined) { best = math.max(best, mem.get); any = true }
    if (any) Some(best) else None
  }

  /** HWM capture for REMEMBER/SHOW: [[maxVisibleEventId]] capped strictly
    * below the smallest IN-FLIGHT bulk-ingest id block. Ids are allocated
    * before a bulk segment write commits, so "max visible" alone is not a
    * safe delta watermark: anything committed after the in-flight block was
    * allocated (a sync STORE, a faster second ingest) is visible with
    * HIGHER ids, and a mark taken from those would forever exclude the
    * in-flight rows (`id ≤ mark` but committed later) from every delta.
    * Capping just defers the already-visible higher rows to the next delta
    * — REMEMBER evaluates bounded to the captured mark, so nothing is
    * double-counted. The sync path needs no entry here: [[store]] allocates
    * the id and appends WAL + memtable row under one lock, so a sync row is
    * visible to [[memtableMaxId]] atomically with its allocation. */
  def safeHwmEventId(): Option[Long] = {
    // READ ORDER MATTERS: visibility first, in-flight cap second. Read the
    // other way, a block allocated between the two reads is invisible to
    // the cap, and a sync STORE landing in a LATER block before the vis
    // read pushes the mark above that uncommitted block — permanent
    // exclusion. Vis-first is safe: batchSeq is monotonic, so any block
    // allocated after the vis read has base > vis (never covered by the
    // mark), and any block allocated before it is either still registered
    // (capped here) or already committed (visible to the vis read).
    val vis = maxVisibleEventId()
    val cap = idLock.synchronized { inflightIngestBases.headOption }
    (vis, cap) match {
      case (Some(v), Some(b)) if b - 1L < v =>
        if (b <= 0L) None else Some(b - 1L)
      case _ => vis
    }
  }

  private def memtableMaxId(): Option[Long] = memtable.synchronized {
    val iters = for {
      (t, rows) <- memtable.iterator if rows.nonEmpty
      idx = schemas(t).fullStruct.fieldIndex(EventSchema.EventId)
      r <- rows.iterator
    } yield r.getLong(idx)
    iters.maxOption
  }

  /** Committed segments UNION fresh memtable rows — the reference's
    * memtable-visible-to-reads semantics (`core/memory/memtable.rs`). */
  override def frame(t: String): DataFrame = {
    val schema = schemas.getOrElse(t, throw new IllegalArgumentException(s"unknown event type: $t"))
    val committed = committedFrame(t)
    // immutable copy under the lock — a concurrent STORE may grow the buffer
    // while Spark iterates the localRelation
    memtable.synchronized(memtable.get(t).filter(_.nonEmpty).map(_.toVector)) match {
      case Some(rows) =>
        committed.unionByName(spark.createDataFrame(rows.asJava, schema.fullStruct))
      case None => committed
    }
  }

  // ---------------- maintenance ----------------

  /** Fingerprint of one schema's field spec — recorded in the snapshot
    * manifest and re-derived on import to reject tampered/corrupt schema
    * files (reference `snapshot_meta.rs` + `materialization.md`'s
    * schema-hash discipline). */
  private def schemaMd5(s: EventSchema): String = {
    val spec = s"${s.eventType}/${s.version}:" +
      s.fields.map { case (n, t) => s"$n=${t.render}" }.mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(spec.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Snapshot export — portable event dumps per type (reference `.snp`
    * event arrays + `.smt` meta, `core/snapshot/`; SURVEY.md S7). JSON
    * lines, one dir per event type, the schema catalog, and a
    * `manifest.json` recording per-type schema hash, row count and
    * timestamp range (ONE Spark job over the union of all types — no
    * per-type passes). */
  def exportSnapshot(outDir: String): Unit = {
    flush()
    Files.createDirectories(Paths.get(outDir, "_schemas"))
    schemas.values.foreach { s =>
      Files.write(Paths.get(outDir, "_schemas", s"${s.eventType}.json"),
        EventStore.schemaToJson(s).getBytes("UTF-8"))
    }
    val committed = listCommittedTypes().filter(schemas.contains).sorted
    committed.foreach { t =>
      committedFrame(t).write.mode("overwrite").json(Paths.get(outDir, t).toString)
    }
    val stats: Map[String, (Long, Long, Long)] =
      if (committed.isEmpty) Map.empty
      else committed.map(t => committedFrame(t).select(
          lit(t).as("t"), col(EventSchema.Timestamp).as("ts")))
        .reduce(_ union _)
        .groupBy("t").agg(count(lit(1)).as("n"), min(col("ts")).as("lo"), max(col("ts")).as("hi"))
        .collect() // bounded: one row per event TYPE
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val types = schemas.values.toSeq.sortBy(_.eventType).map { s =>
      val (n, lo, hi) = stats.getOrElse(s.eventType, (0L, 0L, 0L))
      // per-type DATA hash (name+size+sampled content of each file): the
      // manifested snapKey hashes manifest BYTES, so without this a data
      // file edited in place (rows and ts-range unchanged) produced an
      // identical manifest and the re-import was silently skipped as
      // already-committed (r15 review finding)
      val dataMd5 = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val tDir = Paths.get(outDir, s.eventType)
        if (Files.isDirectory(tDir))
          EventStore.listDir(tDir).sortBy(_.getFileName.toString)
            .filter(p => EventStore.isVisibleDataFile(p.getFileName.toString))
            .foreach { p =>
              md.update(s"${p.getFileName}:${Files.size(p)};".getBytes("UTF-8"))
              sampleFileInto(md, p)
            }
        md.digest().map("%02x".format(_)).mkString
      }
      s"""{"name": ${EventStore.jsonString(s.eventType)}, "version": ${s.version}, """ +
        s""""schema_md5": "${schemaMd5(s)}", "data_md5": "$dataMd5", """ +
        s""""rows": $n, "from_ts": $lo, "to_ts": $hi}"""
    }
    Files.write(Paths.get(outDir, "manifest.json"),
      (s"""{"format": "graft-snapshot", "format_version": 1, "created": ${clock()}, """ +
        s""""types": [${types.mkString(", ")}]}""").getBytes("UTF-8"))
  }

  /** Fold `p`'s first and last 64 KiB into `md` — the content sample both
    * snapshot identities use (full-file hashing would re-read whole
    * exports driver-side; the sample plus size+name/mtime catches every
    * realistic edit, and the manifested path documents the residual
    * middle-bytes window). */
  private def sampleFileInto(md: java.security.MessageDigest, p: Path): Unit = {
    val sample = 64 * 1024
    val size = Files.size(p)
    val ch = java.nio.channels.FileChannel.open(p, java.nio.file.StandardOpenOption.READ)
    try {
      def digest(off: Long, len: Int): Unit = {
        val buf = java.nio.ByteBuffer.allocate(len)
        var pos = off
        while (buf.hasRemaining) {
          val n = ch.read(buf, pos)
          if (n < 0) return
          pos += n
        }
        buf.flip(); md.update(buf)
      }
      digest(0L, math.min(size, sample.toLong).toInt)
      if (size > sample) digest(math.max(sample.toLong, size - sample),
        math.min(sample.toLong, size - sample).toInt)
    } finally ch.close()
  }

  /** Restore a snapshot into this store. Schema validation is
    * all-or-nothing: EVERY type's schema is validated before ANY data
    * lands. Rejected when a snapshot schema conflicts with an existing
    * definition (different field spec — the reference refuses cross-schema
    * appends), when the manifest's recorded schema hash does not match the
    * shipped schema file (corrupt/tampered snapshot), or when the manifest
    * itself is malformed. Every type's data files are additionally parsed
    * (FAILFAST) before the first segment write, so a corrupt data file
    * rejects the whole import instead of landing a partial one.
    *
    * CRASH-SAFE AND IDEMPOTENT per (snapshot, type): segments land through
    * the same exactly-once machinery as streaming ingest
    * ([[writeSegmentIdempotent]]), keyed by a content hash of the snapshot
    * (manifest bytes when present, else schemas + data file listing). A
    * process crash mid-loop leaves earlier types imported; RE-RUNNING the
    * import then skips them (commit marker present) and restores the rest
    * — never duplicating a row. Importing the same snapshot twice is a
    * no-op for the data (types report restored, nothing re-lands);
    * importing a DIFFERENT snapshot of the same type appends normally.
    * Returns the number of types restored. */
  def importSnapshot(inDir: String): Either[String, Int] = {
    val sdir = Paths.get(inDir, "_schemas")
    if (!Files.isDirectory(sdir)) return Left(s"not a snapshot dir (no _schemas): $inDir")
    val snapSchemas = EventStore.listDir(sdir).iterator
      .filter(_.toString.endsWith(".json")).map { p =>
        val json = new String(Files.readAllBytes(p), "UTF-8")
        EventStore.schemaFromJson(json).toRight(s"corrupt schema file: ${p.getFileName}")
      }.toSeq
    val firstCorrupt = snapSchemas.collectFirst { case Left(e) => e }
    if (firstCorrupt.isDefined) return Left(firstCorrupt.get)
    val parsed = snapSchemas.collect { case Right(s) => s }
    // manifest hash cross-check (legacy manifest-less snapshots skip it)
    val manifest = Paths.get(inDir, "manifest.json")
    if (Files.exists(manifest)) {
      val node = scala.util.Try(
          EventStore.readTree(new String(Files.readAllBytes(manifest), "UTF-8")))
        .getOrElse(return Left(s"corrupt manifest.json (not valid JSON): $inDir"))
      val typesNode = node.get("types")
      if (typesNode == null || !typesNode.isArray)
        return Left(s"malformed manifest.json (missing 'types' array): $inDir")
      val recorded = typesNode.elements().asScala.flatMap { t =>
        // a type entry without name/schema_md5 is malformed, not an NPE
        val name = Option(t.get("name")).map(_.asText())
        val md5 = Option(t.get("schema_md5")).map(_.asText())
        (name, md5) match {
          case (Some(n), Some(m)) => Iterator.single(n -> m)
          case _ => return Left(
            s"malformed manifest.json (type entry missing name/schema_md5): $inDir")
        }
      }.toMap
      val tampered = parsed.find(s => recorded.get(s.eventType).exists(_ != schemaMd5(s)))
      tampered.foreach { s =>
        return Left(s"snapshot schema hash mismatch for '${s.eventType}': " +
          "manifest does not match shipped schema file")
      }
      // DATA hash cross-check (manifests that record data_md5 — r15): a
      // data file edited after export leaves the manifest bytes (and thus
      // the idempotency key) unchanged, so without this check the edited
      // type was silently skipped as already-imported on a re-run. An
      // export's data and manifest are written together — a mismatch means
      // post-export modification or corruption, and like the schema check
      // it rejects the import rather than guessing.
      val recordedData = typesNode.elements().asScala.flatMap { t =>
        (Option(t.get("name")).map(_.asText()),
          Option(t.get("data_md5")).map(_.asText())) match {
          case (Some(n), Some(m)) => Iterator.single(n -> m)
          case _ => Iterator.empty // legacy manifest: no data hash recorded
        }
      }.toMap
      parsed.foreach { s =>
        recordedData.get(s.eventType).foreach { expect =>
          val tDir = Paths.get(inDir, s.eventType)
          val actual = {
            val md = java.security.MessageDigest.getInstance("MD5")
            if (Files.isDirectory(tDir))
              EventStore.listDir(tDir).sortBy(_.getFileName.toString)
                .filter(p => EventStore.isVisibleDataFile(p.getFileName.toString))
                .foreach { p =>
                  md.update(s"${p.getFileName}:${Files.size(p)};".getBytes("UTF-8"))
                  sampleFileInto(md, p)
                }
            md.digest().map("%02x".format(_)).mkString
          }
          if (actual != expect)
            return Left(s"snapshot data hash mismatch for '${s.eventType}': " +
              "data files do not match the manifest (modified after export?); " +
              "re-export the snapshot")
        }
      }
    }
    // conflicting existing definitions reject the WHOLE import
    val conflict = parsed.find(s => schemas.get(s.eventType).exists(_.fields != s.fields))
    conflict.foreach { s =>
      return Left(s"schema mismatch for '${s.eventType}': store has " +
        s"v${schemas(s.eventType).version} with different fields; import refused")
    }
    // FAILFAST readability pass over every type's data BEFORE any schema is
    // registered or any segment written: a corrupt data file rejects the
    // whole import (otherwise a mid-loop parse failure would leave earlier
    // types already imported)
    val withData = parsed.sortBy(_.eventType)
      .map(s => s -> Paths.get(inDir, s.eventType))
      .filter { case (_, src) => Files.isDirectory(src) }
    for ((s, src) <- withData) {
      val readable = scala.util.Try {
        // count() would prune the pushed schema to EMPTY, so the FAILFAST
        // parser would only check JSON well-formedness — a well-formed file
        // whose values mismatch the schema types (e.g. "abc" in a long
        // field) would slip through and land as PERMISSIVE nulls in the
        // segment write. Consuming every schema field forces full-schema
        // parsing, so type-mismatched data also rejects the import.
        val full = spark.read.option("mode", "FAILFAST").schema(s.fullStruct)
          .json(src.toString)
        full.select(s.fullStruct.fieldNames.map(col): _*).foreach(_ => ())
      }
      if (readable.isFailure)
        return Left(s"unreadable snapshot data for '${s.eventType}': " +
          s"${readable.failed.get.getMessage.linesIterator.next()}; import refused")
    }
    parsed.foreach { s =>
      schemas(s.eventType) = s
      Files.write(schemaFile(s.eventType), EventStore.schemaToJson(s).getBytes("UTF-8"))
    }
    // content-derived snapshot identity: same snapshot ⇒ same key ⇒ a
    // crash-interrupted import re-run skips completed types and a retried
    // type replaces its own partial parts (writeSegmentIdempotent); a
    // different snapshot of the same type gets a different key and appends.
    // Manifested snapshots (the export default) hash the manifest bytes,
    // which cover every data file's content hash. The manifest-LESS
    // fallback hashes name+size+mtime per data file: name+size alone
    // collided on a same-size in-place edit (e.g. fixed-width JSON values
    // changed), silently skipping the edited type as already-imported
    // (ADVICE r14); mtime narrows that window but mtime-PRESERVING tools
    // (tar -x, rsync -a, cp -p) re-materialize an edited snapshot with the
    // original stamps, so the key also folds in a CONTENT SAMPLE — the
    // first and last 64 KiB of each data file (r15 review finding). An
    // edit that changes only un-sampled middle bytes AND preserves size
    // and mtime is the residual window; exports always carry a manifest
    // (whose per-file content hashes close it completely). Crash-rerun
    // idempotency is preserved — re-importing the SAME directory sees the
    // same bytes — but a byte-identical COPY with fresh mtimes appends a
    // second pass of the rows, the documented cost of trusting an
    // unmanifested directory: losing an edited snapshot's rows is worse
    // than duplicating a copied one's.
    val snapKey = {
      val md = java.security.MessageDigest.getInstance("MD5")
      if (Files.exists(manifest)) md.update(Files.readAllBytes(manifest))
      else {
        parsed.sortBy(_.eventType)
          .foreach(s => md.update(EventStore.schemaToJson(s).getBytes("UTF-8")))
        withData.foreach { case (s, src) =>
          EventStore.listDir(src).sortBy(_.getFileName.toString).foreach { p =>
            val mtime = Files.getLastModifiedTime(p).toMillis
            md.update(
              s"${s.eventType}/${p.getFileName}:${Files.size(p)}:$mtime;".getBytes("UTF-8"))
            sampleFileInto(md, p)
          }
        }
      }
      md.digest().map("%02x".format(_)).mkString
    }
    withData.foreach { case (s, src) =>
      val marker = dataDir.resolve(s.eventType).resolve(s"_ingest_snap_$snapKey.committed")
      if (!Files.exists(marker))
        writeSegmentIdempotent(s.eventType,
          spark.read.schema(schemas(s.eventType).fullStruct).json(src.toString),
          s"snap_$snapKey")
    }
    Right(withData.size)
  }

  /** Segment compaction — the reference's background compaction worker
    * (`core/compaction/`, k-way segment merge; SURVEY.md §5) collapses to a
    * rewrite: many small Parquet files per event type → `targetFiles`
    * context-sorted files. Run periodically, like Delta OPTIMIZE. */
  def compact(targetFiles: Int = 4): Unit = {
    flush()
    listCommittedTypes().filter(schemas.contains).foreach { t => withSegmentRewrite {
      val dir = dataDir.resolve(t)
      val files = EventStore.listDir(dir).count(_.toString.endsWith(".parquet"))
      if (files > targetFiles) {
        val tmp = dataDir.resolve(s"$t.compact.tmp")
        committedFrame(t)
          .repartition(targetFiles, col(EventSchema.ContextId))
          .sortWithinPartitions(EventSchema.ContextId, EventSchema.Timestamp, EventSchema.EventId)
          .write.mode("overwrite").parquet(tmp.toString)
        // carry ingest commit markers into the rewritten dir — compaction
        // must not reopen the exactly-once window for replayable batches
        EventStore.listDir(dir)
          .filter(_.getFileName.toString.startsWith("_ingest_"))
          .foreach(m => Files.copy(m, tmp.resolve(m.getFileName.toString)))
        // atomic-ish swap on a local FS; on object stores this would be a
        // manifest swap (Delta-style)
        val old = dataDir.resolve(s"$t.old")
        Files.move(dir, old)
        Files.move(tmp, dir)
        deleteRecursively(old)
      }
    } }
  }

  /** Right-to-erasure purge: physically remove EVERY event of one context
    * across all event types — the GDPR/CCPA deletion a production event
    * store must answer, which log-structured engines (the reference
    * included) cannot do without a rewrite. Built on the same
    * flush-rewrite-swap discipline as [[compact]]: the WAL is truncated by
    * the flush first (so a crash replay cannot resurrect purged rows),
    * only event types that actually hold the context are rewritten (the
    * existence probe is a pushed-down predicate — with the
    * context-sorted segment layout it prunes on row-group stats), and
    * ingest commit markers are carried so the exactly-once window stays
    * closed.
    *
    * Scope: the event log. Derived artifacts (REMEMBER materializations,
    * snapshot exports) are separate retention surfaces — re-materialize
    * or re-export after a purge, as any warehouse erasure runbook does.
    *
    * Returns the number of events removed. */
  def purgeContext(contextId: String): Long = {
    flush()
    var removed = 0L
    listCommittedTypes().filter(schemas.contains).foreach { t => withSegmentRewrite {
      val dir = dataDir.resolve(t)
      val hits = committedFrame(t)
        .filter(col(EventSchema.ContextId) === contextId).count()
      if (hits > 0) {
        removed += hits
        val tmp = dataDir.resolve(s"$t.purge.tmp")
        committedFrame(t)
          .filter(col(EventSchema.ContextId) =!= contextId)
          .sortWithinPartitions(EventSchema.ContextId, EventSchema.Timestamp, EventSchema.EventId)
          .write.mode("overwrite").parquet(tmp.toString)
        EventStore.listDir(dir)
          .filter(_.getFileName.toString.startsWith("_ingest_"))
          .foreach(m => Files.copy(m, tmp.resolve(m.getFileName.toString)))
        val old = dataDir.resolve(s"$t.old")
        Files.move(dir, old)
        Files.move(tmp, dir)
        deleteRecursively(old)
      }
    } }
    removed
  }

  /** Retention enforcement: physically drop every event with
    * `timestamp < cutoffSec` across all event types — the age-based
    * sibling of [[purgeContext]] (same flush-rewrite-swap discipline,
    * same commit-marker carry). A log-structured engine ages data out by
    * dropping whole segments; with the context-sorted Parquet layout the
    * existence probe and the rewrite filter both push down to row-group
    * stats, so types with nothing old enough cost a metadata-only scan.
    *
    * Returns the number of events removed. */
  def purgeBefore(cutoffSec: Long): Long = {
    flush()
    var removed = 0L
    listCommittedTypes().filter(schemas.contains).foreach { t => withSegmentRewrite {
      val dir = dataDir.resolve(t)
      val hits = committedFrame(t)
        .filter(col(EventSchema.Timestamp) < cutoffSec).count()
      if (hits > 0) {
        removed += hits
        val tmp = dataDir.resolve(s"$t.purge.tmp")
        committedFrame(t)
          .filter(col(EventSchema.Timestamp) >= cutoffSec)
          .sortWithinPartitions(EventSchema.ContextId, EventSchema.Timestamp, EventSchema.EventId)
          .write.mode("overwrite").parquet(tmp.toString)
        EventStore.listDir(dir)
          .filter(_.getFileName.toString.startsWith("_ingest_"))
          .foreach(m => Files.copy(m, tmp.resolve(m.getFileName.toString)))
        val old = dataDir.resolve(s"$t.old")
        Files.move(dir, old)
        Files.move(tmp, dir)
        deleteRecursively(old)
      }
    } }
    removed
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      EventStore.listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  // ---------------- command dispatch ----------------

  /** Execute one command string — the engine's full API surface
    * (reference `command/dispatcher.rs:16`). */
  def execute(command: String): ExecResult = {
    val cmd = try CommandParser.parse(command) catch {
      case e: Exception => return ExecResult.Error(e.getMessage)
    }
    execute(cmd)
  }

  def execute(cmd: Command): ExecResult = cmd match {
    case d: DefineCmd =>
      define(d).fold(e => ExecResult.Error(e), s => ExecResult.Ok(s"Schema defined for '${s.eventType}'"))
    case s: StoreCmd =>
      store(s).fold(e => ExecResult.Error(e), _ => ExecResult.Ok("Event accepted for storage"))
    case FlushCmd => flush(); ExecResult.Ok("Flush command completed")
    case PingCmd  => ExecResult.Ok("PONG")
    case q: QueryCmd  => ExecResult.Frame(QueryCompiler.compile(q, this))
    case r: ReplayCmd => ExecResult.Frame(QueryCompiler.compile(r.toQuery, this))
    case BatchCmd(cmds) =>
      val results = cmds.map(execute)
      results.collectFirst { case e: ExecResult.Error => e }.getOrElse(
        ExecResult.Ok(s"batch ok (${results.size} commands)"))
    case rem: RememberCmd => new Materializer(this).remember(rem)
    case ShowCmd(name)    => new Materializer(this).show(name)
    case c: CompareCmd =>
      ExecResult.Frame(graft.engine.CompareCompiler.compile(c, this))
    case _: CreateUserCmd | _: GrantCmd | _: RevokePermCmd | _: RevokeKeyCmd |
         ListUsersCmd | _: ShowPermissionsCmd =>
      // user management needs an auth manager — reference dispatcher.rs:87-110
      ExecResult.Error("Authentication not configured", 500)
  }
}

sealed trait ExecResult
object ExecResult {
  /** Success; `message` may be multi-line (reference `Response::ok_lines`). */
  final case class Ok(message: String) extends ExecResult
  /** Failure with an HTTP-style status code (reference `StatusCode`):
    * 400 bad request, 401 auth, 403 forbidden, 404 not found. */
  final case class Error(message: String, code: Int = 400) extends ExecResult
  final case class Frame(df: DataFrame) extends ExecResult
}

object EventStore {
  import com.fasterxml.jackson.databind.ObjectMapper
  import com.fasterxml.jackson.databind.node.ObjectNode

  /** Directory listing that CLOSES the underlying stream — `Files.list`
    * holds a file handle until closed, which leaks in a long-running
    * engine. */
  private[store] def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Snapshot DATA-hash scope: visible data files only. Hadoop `.crc`
    * sidecars and `_SUCCESS` markers may or may not survive a copy
    * (`rsync` vs `cp` vs tar), and hashing them would make the same data
    * verify on one transport and fail on another. */
  private[store] def isVisibleDataFile(name: String): Boolean =
    !name.startsWith(".") && !name.startsWith("_")

  private val mapper = new ObjectMapper()
  private[store] def mapperInstance: ObjectMapper = mapper

  def jsonString(s: String): String = mapper.writeValueAsString(s)
  def readTree(json: String): com.fasterxml.jackson.databind.JsonNode = mapper.readTree(json)

  /** Parse a JSON object into a Scala Map (numbers → Long/Double). */
  def parseJsonObject(json: String): Either[String, Map[String, Any]] =
    try {
      val node = mapper.readTree(json)
      if (!node.isObject) Left("payload must be a JSON object")
      else Right(node.properties().asScala.map { e =>
        val v = e.getValue
        val value: Any =
          if (v.isNull) null
          else if (v.isBoolean) v.asBoolean()
          else if (v.isIntegralNumber) v.asLong()
          else if (v.isFloatingPointNumber) v.asDouble()
          else if (v.isTextual) v.asText()
          else return Left(s"field ${e.getKey}: nested objects/arrays not allowed (flat schemas only)")
        e.getKey -> value
      }.toMap)
    } catch { case ex: Exception => Left(ex.getMessage) }

  def schemaToJson(s: EventSchema): String = {
    val node = mapper.createObjectNode()
    node.put("event_type", s.eventType)
    node.put("version", s.version)
    val f = node.putObject("fields")
    s.fields.foreach { case (n, t) => f.put(n, t.render) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  def schemaFromJson(json: String): Option[EventSchema] =
    try {
      val node = mapper.readTree(json)
      val t = node.get("event_type").asText()
      val v = node.get("version").asInt()
      val fields = node.get("fields").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toSeq
      EventSchema.fromSpecs(t, v, fields).toOption
    } catch { case _: Exception => None }
}
