package graft.store

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ast._
import graft.engine.{AggStateCompiler, QueryCompiler}
import graft.schema.EventSchema

/** REMEMBER / SHOW — incrementally-maintained materialized query results
  * (reference `src/engine/materialize/`, `docs/src/design/materialization.md`;
  * SURVEY.md §2.5).
  *
  * REMEMBER records the query, an `event_id` high-water mark over the source
  * scope, and a schema hash. SHOW advances the materialization with only the
  * delta rows `hwm_old < event_id <= hwm_new` — the id bound is captured
  * BEFORE the delta is evaluated, so rows that land mid-SHOW are picked up
  * by the next SHOW instead of being silently skipped (and the filter is on
  * `event_id` alone, which is monotonic per store, so late/out-of-order
  * payload timestamps can't hide events from the delta).
  *
  *  - Selection queries append the delta to the stored Parquet in ONE job
  *    (no separate count pass).
  *  - Aggregate queries maintain mergeable partial state
  *    ([[AggStateCompiler]], the reference's `AggState` design) — SHOW costs
  *    one delta scan + a group-key merge, not a full recompute.
  *  - Sequence queries recompute ONLY the link groups the delta touched: a
  *    new event can change which chain an EXISTING head matches (a late B
  *    earlier than the stored match), so append-only is wrong — but a group
  *    with no delta event cannot change. Results are stored partitioned by
  *    a stable link-hash bucket; SHOW semi-joins the corpus down to the
  *    affected link keys (broadcast-sized per delta batch), re-matches just
  *    those groups, and swaps only the touched bucket directories — the
  *    distributed analog of the reference's frame-append design
  *    (`materialize/store/frame/`). Global-LIMIT sequences are not
  *    group-decomposable and keep the full-refresh path.
  *
  * Schema evolution: the recorded schema hash is checked on every SHOW and
  * appending against a changed schema fails (reference
  * `materialization.md:127-133`). Retention (`max_rows` / `max_age_seconds`,
  * reference `materialize/store/retention.rs`) prunes selection
  * materializations after each append; policies are recorded in the catalog
  * entry, set programmatically as in the reference.
  */
final class Materializer(store: EventStore) {
  private val spark: SparkSession = store.spark
  private def matDir(name: String) = Paths.get(store.root, "_materializations", name)

  /** Max bucket fan-out for sequence materializations: an incremental SHOW
    * rewrites only the buckets containing affected link keys, so this
    * bounds the rewrite fraction (1/64 per touched bucket) while keeping
    * the per-bucket directory swap a driver-side metadata operation. */
  private val SeqBuckets = 64

  /** ACTUAL bucket count for a NEW sequence materialization — derived from
    * the committed source bytes of the query's step types (a driver
    * metadata read, no job) and recorded in the catalog entry so every
    * SHOW buckets with the layout it reads. A pinned 64 wrote 64 near-empty
    * files (plus 64 directory moves and a 64-path listing) per materializer
    * op at gate scale — the dominant fsync cost of the remember/show gates
    * (r19 profile: 3 × 64-task write jobs per q_remember_show_seq) and a
    * real small-file cost at any scale where the corpus is small. One
    * bucket per `spark.graft.seq.bucketBytes` (default 16 MB) of source,
    * floored at 8 (parallel writes) and capped at [[SeqBuckets]] (rewrite
    * fraction at 100 TB). Existing materializations keep their recorded
    * count — layout and meta can never disagree. */
  private def seqBucketCountFor(q: QueryCmd): Int = {
    val types =
      if (q.eventType == "*") store.eventTypes
      else q.sequence.map(s => (s.head +: s.links.map(_._2)).distinct)
        .getOrElse(Seq(q.eventType))
    val bytes = types.map { t =>
      val dir = Paths.get(store.root, "data", t)
      if (Files.isDirectory(dir))
        EventStore.listDir(dir)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(Files.size(_)).sum
      else 0L
    }.sum
    val perBucket = spark.conf.get("spark.graft.seq.bucketBytes",
      (16L << 20).toString).toLong
    math.max(8, math.min(SeqBuckets.toLong, bytes / math.max(1L, perBucket) + 1L)).toInt
  }

  /** Affected-key sets at or under this size are collected and pushed into
    * the re-match scans as a LITERAL membership predicate instead of a
    * semi-join. The join form is delta-proportional in SHUFFLE but not in
    * SCAN — the corpus side still reads every step type's full data to
    * probe it, which at 100 TB is a corpus scan per SHOW even for a
    * one-user delta. A literal In/InSet reaches the Parquet reader
    * (row-group stats pruning on the context-sorted segment layout) and
    * removes the join from the plan entirely.
    *
    * The cap is 128, NOT "whatever fits on the driver": (a) Parquet In
    * pushdown degrades to a min/max range filter past
    * `spark.sql.parquet.pushdown.inFilterThreshold`, so row-group
    * effectiveness concentrates at small key counts; (b) the literal
    * expression's plan/codegen cost grows with key count and is
    * corpus-INDEPENDENT — measured +0.8 s per SHOW at 1500 keys on the
    * sf0.1 gate (PLANS.md r15), a pure loss whenever the scan it saves is
    * cheap; (c) large key sets are exactly what the semi-join (plus
    * Spark's runtime bloom-filter pruning on a real cluster) is for.
    * Tunable (`spark.graft.show.affectedKeyCap`) so both paths stay
    * test-covered; 0 disables the pushdown. */
  private def affectedKeyPushdownCap: Long =
    spark.conf.get("spark.graft.show.affectedKeyCap", "128").toLong

  private def seqBucket(c: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(hash(c), lit(nBuckets))

  /** The stored query of a materialization, if it exists (used by the auth
    * gate to scope SHOW to the query's event types). A corrupt/unparseable
    * meta.json yields None instead of throwing out of the auth gate. */
  def storedQuery(name: String): Option[QueryCmd] =
    readMeta(name).flatMap(m =>
      scala.util.Try(graft.parser.CommandParser.parse(m.query)).toOption
        .collect { case q: QueryCmd => q })

  // ---------------- catalog entry ----------------

  private case class Meta(query: String, hwmId: Long, schemaHash: String,
      maxRows: Option[Long], maxAgeSeconds: Option[Long],
      resultSchema: Option[org.apache.spark.sql.types.StructType] = None,
      seqBuckets: Int = 64) // legacy entries predate the field: always 64

  private def readMeta(name: String): Option[Meta] = {
    val f = matDir(name).resolve("meta.json")
    if (!Files.exists(f)) None
    else scala.util.Try {
      val n = EventStore.readTree(new String(Files.readAllBytes(f), "UTF-8"))
      Some(Meta(
        n.get("query").asText(),
        if (n.has("hwm_id")) n.get("hwm_id").asLong() else Long.MinValue,
        if (n.has("schema_hash")) n.get("schema_hash").asText() else "",
        if (n.has("max_rows") && !n.get("max_rows").isNull) Some(n.get("max_rows").asLong()) else None,
        if (n.has("max_age_seconds") && !n.get("max_age_seconds").isNull)
          Some(n.get("max_age_seconds").asLong()) else None,
        if (n.has("result_schema") && !n.get("result_schema").isNull)
          scala.util.Try(org.apache.spark.sql.types.DataType
            .fromJson(n.get("result_schema").asText())
            .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption
        else None,
        if (n.has("seq_buckets")) n.get("seq_buckets").asInt() else 64))
      // Try: a torn/truncated meta (legacy in-place writes; writes are
      // atomic now) must not throw out of SHOW or the auth gate's
      // storedQuery — treated as absent, so re-REMEMBER can heal it
    }.toOption.flatten
  }

  private def writeMeta(name: String, m: Meta): Unit = {
    val json = s"""{"query": ${EventStore.jsonString(m.query)}, "hwm_id": ${m.hwmId}, """ +
      s""""schema_hash": ${EventStore.jsonString(m.schemaHash)}, """ +
      s""""max_rows": ${m.maxRows.map(_.toString).getOrElse("null")}, """ +
      s""""max_age_seconds": ${m.maxAgeSeconds.map(_.toString).getOrElse("null")}, """ +
      s""""result_schema": ${m.resultSchema
        .map(s => EventStore.jsonString(s.json)).getOrElse("null")}, """ +
      s""""seq_buckets": ${m.seqBuckets}}"""
    // tmp + atomic move: meta is rewritten on every delta-advancing SHOW,
    // and an in-place truncate-then-write left a crash window that bricked
    // the materialization (r15 review finding — the query text is
    // unrecoverable once meta is torn)
    val tmp = matDir(name).resolve("meta.json.tmp")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, matDir(name).resolve("meta.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Fingerprint of every schema in the query's scope — SHOW refuses to
    * append across a schema change (reference materialization.md). */
  private def schemaHash(q: QueryCmd): String = {
    val types =
      if (q.eventType == "*") store.eventTypes.sorted
      else q.sequence.map(s => (s.head +: s.links.map(_._2)).distinct).getOrElse(Seq(q.eventType))
    val spec = types.flatMap(t => store.schemaOf(t)).map { s =>
      s"${s.eventType}/${s.version}:" + s.fields.map { case (n, t) => s"$n=${t.render}" }.mkString(",")
    }.mkString(";")
    java.security.MessageDigest.getInstance("MD5")
      .digest(spec.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Delta high-water mark — store-wide, from parquet footer stats +
    * memtable, CAPPED below any in-flight bulk-ingest id block
    * ([[EventStore.safeHwmEventId]]; no Spark job). A scope-free HWM is
    * correct for every query shape: every scoped row at or below it is
    * already visible (the delta window only BOUNDS which rows compile()
    * considers — the query's own scope filters still apply inside it), and
    * it trivially covers every step type of a sequence (a non-head side
    * ingested after the head holds ids above the head's max — a head-only
    * HWM would silently exclude those events). The in-flight cap closes the
    * bulk-write race: ids are allocated before the segment write commits,
    * so the raw visible max can run AHEAD of an uncommitted block, and a
    * mark taken there would exclude that block from every future delta.
    * The `q` parameter is kept for call-site readability. */
  private def currentMaxId(q: QueryCmd): Long =
    store.safeHwmEventId().getOrElse(Long.MinValue)

  /** Record a retention policy on an existing materialization (the reference
    * stores policies in the catalog and enforces them on append). */
  def setRetention(name: String, maxRows: Option[Long], maxAgeSeconds: Option[Long]): ExecResult =
    readMeta(name) match {
      case None    => ExecResult.Error(s"Materialization not found: $name", 404)
      case Some(m) =>
        writeMeta(name, m.copy(maxRows = maxRows, maxAgeSeconds = maxAgeSeconds))
        ExecResult.Ok(s"retention set on '$name'")
    }

  // ---------------- REMEMBER ----------------

  def remember(cmd: RememberCmd): ExecResult = {
    val dir = matDir(cmd.name)
    // "exists" means a READABLE catalog entry: a directory left by a failed
    // REMEMBER (or holding a torn legacy meta) used to block the name
    // forever while SHOW reported it not found (r15 review finding) — such
    // leftovers are cleared and the REMEMBER retried
    if (readMeta(cmd.name).isDefined)
      return ExecResult.Error(s"materialization '${cmd.name}' already exists")
    if (Files.exists(dir)) deleteRecursively(dir)
    Files.createDirectories(dir)
    try rememberBody(cmd, dir)
    catch {
      case e: Throwable =>
        // no meta was written: remove the partial dir so the name stays free
        scala.util.Try(deleteRecursively(dir))
        throw e
    }
  }

  private def rememberBody(cmd: RememberCmd, dir: Path): ExecResult = {
    val q = cmd.query
    val hwmId = currentMaxId(q) // captured BEFORE evaluation: a concurrent
                                // write lands in the next SHOW's delta
    // result schema recorded in the catalog for sequence queries: every
    // SHOW otherwise re-runs a full Catalyst analysis of the sequence plan
    // just to type the stored parquet read-back (the schema-hash guard
    // already invalidates the entry whenever the recorded shape could drift)
    var resultSchema: Option[org.apache.spark.sql.types.StructType] = None
    val nBkt = seqBucketCountFor(q) // recorded in meta; SHOW reads it back
    val storedDir =
      if (q.isAggregate && !q.isSequence) {
        AggStateCompiler.partialState(q, boundedSource(Long.MinValue, hwmId))
          .write.mode("overwrite").parquet(dir.resolve("state").toString)
        AggStateCompiler.uniqueFields(q).foreach { f =>
          AggStateCompiler.partialUnique(q, boundedSource(Long.MinValue, hwmId), f)
            .write.mode("overwrite").parquet(dir.resolve(s"uniq_$f").toString)
        }
        dir.resolve("state")
      } else if (q.isSequence && q.limit.isEmpty) {
        // bucket-partitioned by link hash so SHOW can rewrite only the
        // buckets its delta touches (see the class doc)
        val compiled = QueryCompiler.compile(q, boundedSource(Long.MinValue, hwmId))
        resultSchema = Some(compiled.schema)
        compiled
          .withColumn("_bkt", seqBucket(col("link_value"), nBkt))
          // explicit partition count: a bare repartition(col) lets AQE
          // coalesce this small exchange to ONE task that then writes all
          // bucket dirs sequentially (~1.5 s of file-open latency per
          // materializer op, the r17 stage profile's top cost); pinned
          // partitions write the dirs in parallel, still one file per dir
          .repartition(nBkt, col("_bkt"))
          .write.mode("overwrite").partitionBy("_bkt")
          .parquet(dir.resolve("data").toString)
        dir.resolve("data")
      } else {
        val compiled = QueryCompiler.compile(q, boundedSource(Long.MinValue, hwmId))
        if (q.isSequence) resultSchema = Some(compiled.schema)
        compiled.write.mode("overwrite").parquet(dir.resolve("data").toString)
        dir.resolve("data")
      }
    writeMeta(cmd.name,
      Meta(renderQuery(q), hwmId, schemaHash(q), None, None, resultSchema, nBkt))
    // rows-stored summary line (reference `handlers/remember.rs:168-169`);
    // summed from the just-written Parquet footers on the driver — a
    // metadata read, not a Spark job
    ExecResult.Ok(s"remembered query '${cmd.name}'\nrows stored: ${footerRowCount(storedDir)}")
  }

  /** Total row count of a Parquet directory from file footers (no job);
    * recurses into `_bkt=` partition subdirectories. */
  private def footerRowCount(dir: Path): Long = {
    val conf = spark.sessionState.newHadoopConf()
    def walk(p: Path): Iterator[Path] =
      if (Files.isDirectory(p)) EventStore.listDir(p).iterator.flatMap(walk)
      else Iterator.single(p)
    walk(dir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toUri), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }

  // ---------------- SHOW ----------------

  def show(name: String): ExecResult = {
    val dir = matDir(name)
    val meta = readMeta(name).getOrElse(
      return ExecResult.Error(s"Materialization not found: $name", 404))
    val query = scala.util.Try(graft.parser.CommandParser.parse(meta.query)).toOption
      .collect { case q: QueryCmd => q }
      .getOrElse(return ExecResult.Error(
        s"materialization '$name' has a corrupt stored query; recreate it"))

    if (meta.schemaHash.nonEmpty && schemaHash(query) != meta.schemaHash)
      return ExecResult.Error(
        s"schema changed since materialization '$name' was created; recreate it")

    if (query.isSequence) return showSequence(name, dir, meta, query)

    if (query.isAggregate) {
      val stateDir = dir.resolve("state")
      val uniqFields = AggStateCompiler.uniqueFields(query)
      // heal swapWrite crash windows (dir missing, rows in .old) — the
      // sequence path has recoverBuckets; these dirs had no healer (r15)
      recoverSwap(stateDir)
      uniqFields.foreach(f => recoverSwap(dir.resolve(s"uniq_$f")))
      // heal a crash AFTER the state swap but BEFORE the meta advance: the
      // state dir carries the hwm it was merged to; a marker ahead of meta
      // means the delta landed — advance meta instead of re-merging (a
      // re-merge would double-count: mergeState sums are not idempotent)
      var m = meta
      readHwmMarker(stateDir).filter(_ > m.hwmId).foreach { u =>
        m = m.copy(hwmId = u); writeMeta(name, m)
      }
      val newHwm = currentMaxId(query)
      if (newHwm > m.hwmId) {
        val delta = boundedSource(m.hwmId, newHwm)
        // uniq dirs merge FIRST (distinct-union — idempotent on a crash
        // re-run), then the state swap, whose embedded hwm marker is the
        // delta's commit point, then the meta advance
        uniqFields.foreach { f =>
          val mergedPairs = AggStateCompiler.mergeUnique(
            spark.read.parquet(dir.resolve(s"uniq_$f").toString),
            AggStateCompiler.partialUnique(query, delta, f))
          swapWrite(dir.resolve(s"uniq_$f"), mergedPairs)
        }
        val merged = AggStateCompiler.mergeState(query,
          spark.read.parquet(stateDir.toString),
          AggStateCompiler.partialState(query, delta))
        swapWrite(stateDir, merged, hwmMarker = Some(newHwm))
        writeMeta(name, m.copy(hwmId = newHwm))
      }
      val state = spark.read.parquet(stateDir.toString)
      val uniques = uniqFields
        .map(f => f -> spark.read.parquet(dir.resolve(s"uniq_$f").toString)).toMap
      return ExecResult.Frame(AggStateCompiler.finalize(query, state, uniques))
    }

    // selection: append the delta idempotently (deterministic part names +
    // a committed marker recording the window's upper bound, the
    // writeSegmentIdempotent discipline) — a bare append re-applied after a
    // crash before the meta advance duplicated every delta row (r15)
    val dataDir = dir.resolve("data")
    recoverSwap(dataDir) // retention's swapWrite crash window
    var m = meta
    readDeltaMarker(dataDir, m.hwmId).foreach { u =>
      m = m.copy(hwmId = u); writeMeta(name, m)
    }
    val newHwm = currentMaxId(query)
    if (newHwm > m.hwmId) {
      val delta = QueryCompiler.compile(query, boundedSource(m.hwmId, newHwm))
      appendDeltaIdempotent(dataDir, delta, m.hwmId, newHwm)
      writeMeta(name, m.copy(hwmId = newHwm))
      enforceRetention(name, dir, m)
    }
    ExecResult.Frame(spark.read.parquet(dataDir.toString))
  }

  /** Heal a [[swapWrite]] crash window on `target`: a crash between its two
    * moves leaves the only copy under `<target>.old` — restore it; both
    * present means the swap committed — finish the delete. Stale `.tmp`
    * scratch is dropped. (The sequence path's [[recoverBuckets]] plays this
    * role for bucket dirs.) */
  private def recoverSwap(target: Path): Unit = {
    val old = target.resolveSibling(target.getFileName.toString + ".old")
    if (Files.isDirectory(old)) {
      if (!Files.isDirectory(target)) Files.move(old, target)
      else deleteRecursively(old)
    }
    deleteRecursively(target.resolveSibling(target.getFileName.toString + ".tmp"))
  }

  /** The hwm a state dir was merged to ([[swapWrite]]'s `hwmMarker`);
    * None for legacy dirs that predate the marker. */
  private def readHwmMarker(dir: Path): Option[Long] =
    if (!Files.isDirectory(dir)) None
    else EventStore.listDir(dir).iterator.map(_.getFileName.toString)
      .collectFirst { case n if n.startsWith("_hwm_") && n.endsWith(".marker") =>
        n.stripPrefix("_hwm_").stripSuffix(".marker").toLong }

  /** The upper bound of an already-applied selection delta window starting
    * at `fromHwm` (crash between [[appendDeltaIdempotent]]'s marker and the
    * meta advance), if its committed marker exists. */
  private def readDeltaMarker(dataDir: Path, fromHwm: Long): Option[Long] = {
    val marker = dataDir.resolve(s"_show_delta_$fromHwm.committed")
    if (Files.exists(marker))
      scala.util.Try(new String(Files.readAllBytes(marker), "UTF-8").trim.toLong).toOption
    else None
  }

  /** Apply a selection SHOW delta exactly once: parts land under
    * deterministic `show_delta_<fromHwm>-NNNNN.parquet` names (a retried
    * window first deletes its own prior parts — replace, never append
    * beside), and an atomically-moved `_show_delta_<fromHwm>.committed`
    * marker recording `toHwm` is the commit point [[show]] heals from. */
  private def appendDeltaIdempotent(dataDir: Path, delta: DataFrame,
      fromHwm: Long, toHwm: Long): Unit = {
    val tag = s"show_delta_$fromHwm"
    if (Files.isDirectory(dataDir))
      EventStore.listDir(dataDir)
        .filter(_.getFileName.toString.startsWith(s"$tag-"))
        .foreach(Files.delete)
    val tmp = dataDir.resolveSibling(s"${dataDir.getFileName}.$tag.tmp")
    delta.write.mode("overwrite").parquet(tmp.toString)
    Files.createDirectories(dataDir)
    var i = 0
    EventStore.listDir(tmp).sortBy(_.getFileName.toString)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach { p =>
        Files.move(p, dataDir.resolve(f"$tag-$i%05d.parquet")); i += 1
      }
    deleteRecursively(tmp)
    // drop prior windows' markers (stale once this window supersedes them)
    EventStore.listDir(dataDir)
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("_show_delta_") && n.endsWith(".committed")
      }
      .foreach(Files.delete)
    val mtmp = dataDir.resolve(s"_show_delta_$fromHwm.tmp")
    Files.write(mtmp, toHwm.toString.getBytes("UTF-8"))
    Files.move(mtmp, dataDir.resolve(s"_show_delta_$fromHwm.committed"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** SHOW for sequence materializations — per-affected-group incremental
    * refresh (class doc). A delta event can change an EXISTING head's match
    * (sequence matching is first-B-at-or-after / latest-B-before per head),
    * so the unit of incrementality is the link group, not the row: groups
    * with a delta event are re-matched from the full store restricted to
    * those link keys; untouched groups keep their stored rows verbatim.
    *
    * Scale shape: the affected-key table is bounded by the delta batch.
    * Small key sets (≤ [[affectedKeyPushdownCap]]) are collected and pushed
    * into the re-match scans as a literal membership predicate — the scan
    * itself becomes delta-proportional (Parquet row-group pruning on the
    * context-sorted layout) and no join appears in the plan; larger sets
    * fall back to a broadcast semi-join (no corpus shuffle). The re-match
    * shuffles only affected groups' events; the stored rewrite touches only
    * the bucket directories containing affected keys. */
  private def showSequence(name: String, dir: Path, meta: Meta,
      query: QueryCmd): ExecResult = {
    val dataDir = dir.resolve("data")
    recoverBuckets(dataDir) // heal any crash mid-swap before reading the dir
    val partitioned = Files.isDirectory(dataDir) && EventStore.listDir(dataDir)
      .exists(_.getFileName.toString.startsWith("_bkt="))
    // catalog-recorded schema when present (guarded by the schema-hash
    // check above); legacy entries fall back to a plan-only compile
    val resultSchema = meta.resultSchema
      .getOrElse(QueryCompiler.compile(query, store).schema)
    val newHwm = currentMaxId(query)

    if (query.limit.isDefined) { // a global row cap is not group-decomposable
      swapWrite(dataDir, QueryCompiler.compile(query, boundedSource(Long.MinValue, newHwm)))
      writeMeta(name, meta.copy(hwmId = newHwm))
      return ExecResult.Frame(spark.read.schema(resultSchema).parquet(dataDir.toString))
    }

    val storedSchema = org.apache.spark.sql.types.StructType(
      resultSchema.fields :+ org.apache.spark.sql.types.StructField(
        "_bkt", org.apache.spark.sql.types.IntegerType))

    val nBkt = meta.seqBuckets // the layout's recorded bucket count

    if (!partitioned) {
      // legacy flat storage (or an emptied-out dir): full refresh, upgrading
      // to the bucket-partitioned layout
      val bucketed = QueryCompiler.compile(query, boundedSource(Long.MinValue, newHwm))
        .withColumn("_bkt", seqBucket(col("link_value"), nBkt))
      val tmp = dataDir.resolveSibling("data.tmp")
      bucketed.repartition(nBkt, col("_bkt")) // pinned: see rememberBody
        .write.mode("overwrite").partitionBy("_bkt").parquet(tmp.toString)
      val old = dataDir.resolveSibling("data.old")
      if (Files.exists(dataDir)) Files.move(dataDir, old)
      Files.move(tmp, dataDir)
      deleteRecursively(old)
      writeMeta(name, meta.copy(hwmId = newHwm))
      return ExecResult.Frame(
        spark.read.schema(storedSchema).parquet(dataDir.toString).drop("_bkt"))
    }

    if (newHwm > meta.hwmId) {
      val linkField = query.linkField.getOrElse(EventSchema.ContextId)
      val stepTypes = query.sequence
        .map(s => (s.head +: s.links.map(_._2)).distinct)
        .getOrElse(Seq(query.eventType))
      val delta = boundedSource(meta.hwmId, newHwm)
      // link keys touched by ANY delta event of ANY step type — a superset
      // of the groups whose match set can change (re-matching an unchanged
      // group reproduces its rows, so the superset is safely conservative)
      val affected = stepTypes.map { t =>
          val f = delta.frame(t)
          if (f.columns.contains(linkField))
            f.select(col(linkField).cast("string").as("__aff_link"))
          else f.limit(0).select(lit(null).cast("string").as("__aff_link"))
        }.reduce(_.unionByName(_))
        .filter(col("__aff_link").isNotNull)
        .distinct().localCheckpoint()
      // ONE bounded probe job answers "is the delta small?" AND hands back
      // keys + buckets when it is (r17: this was three jobs — count, key
      // collect, bucket collect — and each small driver job costs ~100 ms
      // of scheduling latency on an incremental-refresh path that exists
      // to be delta-fast). limit(cap+1) bounds the collect: cap+1 rows
      // back means "too big" (fall back to the semi-join + a ≤SeqBuckets
      // bucket collect); ≤ cap rows back IS the full affected set — small
      // deltas push keys as a literal predicate, scan-proportional to the
      // delta (scaladoc on the cap), and the keys replace the keep-side
      // anti-join too.
      val cap = affectedKeyPushdownCap
      // the clamp bounds driver memory even under an absurd configured cap;
      // `small` must compare against the SAME clamped value (ADVICE r17: a
      // cap > 1M made the truncated 1,000,001-row probe look like the full
      // affected set, silently leaving affected rows unrefreshed)
      val effCap = math.min(cap, 1000000L)
      val probe =
        if (cap > 0)
          affected.select(col("__aff_link"), seqBucket(col("__aff_link"), nBkt).as("b"))
            .limit(effCap.toInt + 1).collect()
        else Array.empty[org.apache.spark.sql.Row]
      val small = cap > 0 && probe.length <= effCap
      val affKeys: Option[Seq[String]] =
        if (small) Some(probe.map(_.getString(0)).toIndexedSeq) else None
      // bounded collect: at most nBkt (<= SeqBuckets) distinct bucket ids
      val affBkts =
        if (small) probe.map(_.getInt(1)).distinct.toSeq
        else affected.select(seqBucket(col("__aff_link"), nBkt).as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
      if (affBkts.nonEmpty) {
        val restricted: graft.engine.EventSource = new graft.engine.EventSource {
          override def eventTypes: Seq[String] = store.eventTypes
          override def frame(t: String): DataFrame = {
            val f = store.frame(t)
            if (!f.columns.contains(linkField)) f
            else affKeys match {
              case Some(keys) => f.filter(f(linkField).cast("string").isInCollection(keys))
              case None => f.join(affected,
                f(linkField).cast("string") === affected("__aff_link"), "left_semi")
            }
          }
          override def schemaOf(t: String) = store.schemaOf(t)
        }
        val fresh = QueryCompiler.compile(query, restricted)
          .withColumn("_bkt", seqBucket(col("link_value"), nBkt))
        val stored = spark.read.schema(storedSchema).parquet(dataDir.toString)
        val inAff = stored.filter(col("_bkt").isInCollection(affBkts))
        val keep = affKeys match {
          case Some(keys) => inAff.filter(!col("link_value").isInCollection(keys))
          case None => inAff
            .join(affected, stored("link_value") === affected("__aff_link"), "left_anti")
        }
        replaceBuckets(dataDir, keep.unionByName(fresh), affBkts, nBkt)
      }
      writeMeta(name, meta.copy(hwmId = newHwm))
    }
    ExecResult.Frame(
      spark.read.schema(storedSchema).parquet(dataDir.toString).drop("_bkt"))
  }

  /** Rewrite ONLY `affBkts` of a `_bkt`-partitioned dataset dir: `combined`
    * (covering exactly those buckets) is materialized to a tmp sibling
    * BEFORE any delete — the plan reads the old files — then each affected
    * bucket directory is swapped in (or removed when the bucket emptied).
    *
    * Crash safety mirrors the flat-path data.tmp/data.old discipline: a live
    * bucket is never deleted before its replacement is in place — it is
    * MOVED aside into `<target>.old/` first, so every crash point leaves the
    * bucket's rows on disk in exactly one of data/, data.old/ or data.tmp/,
    * and [[recoverBuckets]] (run before every sequence SHOW reads the dir)
    * restores any bucket the crash left aside-only. The meta HWM is only
    * advanced after this returns, so a recovered pre-update bucket is
    * re-matched by the next SHOW's delta — no rows are lost either way. */
  private def replaceBuckets(target: Path, combined: DataFrame,
      affBkts: Seq[Int], nBkt: Int): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    combined.repartition(nBkt, col("_bkt")) // delta-sized buckets,
      // pinned partition count so the writes parallelize (see rememberBody)
      .write.mode("overwrite").partitionBy("_bkt").parquet(tmp.toString)
    val old = target.resolveSibling(target.getFileName.toString + ".old")
    deleteRecursively(old) // stale leftovers were recovered on SHOW entry
    Files.createDirectories(old)
    affBkts.foreach { b =>
      val dst = target.resolve(s"_bkt=$b")
      val src = tmp.resolve(s"_bkt=$b")
      if (Files.exists(dst)) Files.move(dst, old.resolve(s"_bkt=$b"))
      if (Files.exists(src)) Files.move(src, dst)
    }
    deleteRecursively(old)
    deleteRecursively(tmp)
  }

  /** Recover from a crash mid-[[replaceBuckets]]: any bucket present in
    * `<target>.old/` but absent from the live dir was moved aside without
    * its replacement landing — move it back (its pre-update rows are
    * consistent with the un-advanced HWM). Leftover .old/.tmp siblings are
    * then dropped so partition discovery never sees them. */
  private def recoverBuckets(target: Path): Unit = {
    val old = target.resolveSibling(target.getFileName.toString + ".old")
    if (Files.isDirectory(old)) {
      if (!Files.isDirectory(target)) {
        // swapWrite/upgrade crashed between its two moves: .old is the only
        // complete copy — restore it wholesale
        Files.move(old, target)
      } else {
        EventStore.listDir(old)
          .filter(p => p.getFileName.toString.startsWith("_bkt="))
          .foreach { p =>
            val dst = target.resolve(p.getFileName.toString)
            if (!Files.exists(dst)) Files.move(p, dst)
          }
        deleteRecursively(old)
      }
    }
    deleteRecursively(target.resolveSibling(target.getFileName.toString + ".tmp"))
  }

  /** Retention (reference `materialize/store/retention.rs`): drop rows past
    * `max_age_seconds`, then keep the most recent `max_rows` — enforced
    * after each delta append. */
  private def enforceRetention(name: String, dir: Path, meta: Meta): Unit = {
    if (meta.maxRows.isEmpty && meta.maxAgeSeconds.isEmpty) return
    var kept = spark.read.parquet(dir.resolve("data").toString)
    meta.maxAgeSeconds.foreach { maxAge =>
      kept = kept.filter(col(EventSchema.Timestamp) >= store.now - maxAge)
    }
    meta.maxRows.foreach { maxRows =>
      kept = kept.orderBy(col(EventSchema.Timestamp).desc).limit(
        math.min(maxRows, Int.MaxValue.toLong).toInt)
    }
    swapWrite(dir.resolve("data"), kept)
  }

  /** Overwrite a Parquet dir that the plan is also reading: write to a tmp
    * sibling, then swap (a direct overwrite would clobber its own input). */
  /** Overwrite `target` via tmp + two atomic renames. `hwmMarker` embeds an
    * `_hwm_<U>.marker` file (underscore-prefixed: invisible to Parquet reads) in the new dir —
    * the aggregate SHOW's delta commit point. Crash windows between the two
    * moves are healed by [[recoverSwap]] at the next SHOW. */
  private def swapWrite(target: Path, df: DataFrame,
      hwmMarker: Option[Long] = None): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    hwmMarker.foreach(u => Files.write(tmp.resolve(s"_hwm_$u.marker"), Array.emptyByteArray))
    val old = target.resolveSibling(target.getFileName.toString + ".old")
    if (Files.exists(target)) Files.move(target, old)
    Files.move(tmp, target)
    deleteRecursively(old)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      EventStore.listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** Source view bounded to `lo < event_id <= hi` — the SHOW delta window
    * (reference `handlers/show/delta/{refresher,watermark}.rs`, re-keyed to
    * the monotonic event id so late timestamps can't be skipped). */
  private def boundedSource(lo: Long, hi: Long): graft.engine.EventSource =
    new graft.engine.EventSource {
      override def eventTypes: Seq[String] = store.eventTypes
      override def frame(t: String): DataFrame = {
        val f = store.frame(t)
        val lower = if (lo == Long.MinValue) f else f.filter(col(EventSchema.EventId) > lo)
        if (hi == Long.MaxValue) lower else lower.filter(col(EventSchema.EventId) <= hi)
      }
      override def schemaOf(t: String) = store.schemaOf(t)
    }

  /** Render a QueryCmd back to command text (stored in the catalog entry). */
  private def renderQuery(q: QueryCmd): String = Render.query(q)
}
