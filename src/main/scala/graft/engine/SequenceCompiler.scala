package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ast._
import graft.schema.EventSchema

/** Compiles sequence (funnel) queries:
  * `QUERY a FOLLOWED BY b [FOLLOWED BY c …] LINKED BY k [WHERE …] [USING TIME f]`.
  *
  * Semantics (sneldb `src/engine/core/read/sequence/matcher.rs:310-600`):
  *  - events of each type are grouped by the link field and sorted by the
  *    sequence time field (default `timestamp`), tiebroken by `event_id`;
  *  - `FOLLOWED BY`: each head event matches the FIRST b with `ts_b >= ts_a`
  *    — INCLUSIVE, and with a duplicated type (`a FOLLOWED BY a`) the head
  *    is its own earliest candidate, so every head self-completes. That is
  *    the reference's exact behavior (matcher.rs: `rows_by_type` makes both
  *    sides the same row list and "events with the same timestamp are
  *    considered matches"), kept verbatim for parity; the STREAMING funnel
  *    deliberately uses strict `(ts, event_id)` ordering instead (its class
  *    doc states the divergence);
  *  - `PRECEDED BY`: each head event matches the LATEST b with `ts_b < ts_a`
  *    (strict). We fix a reference edge case where a group whose earliest
  *    head event precedes every b returned no matches at all;
  *  - WHERE conditions are split per event type at plan time
  *    (`sequence/utils.rs::transform_where_clause_for_event_type`) — prefixed
  *    fields (`a.page`) go to their side, un-prefixed fields go to the side
  *    that has the field, and are an ambiguity error if both sides do
  *    (`sequence/where_evaluator.rs`);
  *  - each matched sequence is one output row carrying all events of the
  *    chain (columns prefixed with the event type); `LIMIT` caps matched
  *    sequences, ordered by (head time, head event_id);
  *  - chains of >2 events: the reference parses them but returns empty
  *    (`matcher.rs:274-303` "Phase 4"); we implement them properly — each
  *    subsequent link matches relative to the previously matched event.
  *
  * Execution shape (100 TB-ready): both sides are filtered and
  * column-pruned at scan (Parquet pushdown), then shuffled ONCE by the link
  * key and matched group-locally in linear time per group
  * (`flatMapGroups` — the per-entity event list is small by construction).
  * No join blowup on hot keys, no driver collects.
  */
object SequenceCompiler {

  def compile(q: QueryCmd, src: EventSource): DataFrame = {
    val seq = q.sequence.getOrElse(throw new IllegalArgumentException("not a sequence query"))
    val steps: Seq[(String, Option[SequenceLink])] =
      (seq.head, None) +: seq.links.map { case (l, t) => (t, Some(l)) }
    val linkField = q.linkField.getOrElse(EventSchema.ContextId)
    val timeField = q.sequenceTimeField.getOrElse(EventSchema.Timestamp)

    // column prefixes; duplicate event types in a chain get positional suffixes
    val typeCounts = steps.map(_._1).groupBy(identity).view.mapValues(_.size).toMap
    val prefixes = steps.zipWithIndex.map { case ((t, _), i) =>
      if (typeCounts(t) > 1) s"${t}_$i" else t
    }

    // an unknown step type collapses to the EMPTY side (matcher.rs:
    // rows_by_type.get(t).unwrap_or(&[]) — the whole query is then empty),
    // instead of throwing out of src.frame (r15 review finding; the same
    // degradation QueryCompiler.scoped applies to plain queries)
    def frameFor(t: String): DataFrame =
      if (src.eventTypes.contains(t)) src.frame(t)
      else try src.frame(t) catch {
        case _: IllegalArgumentException | _: MatchError =>
          QueryCompiler.emptyCoreFrame()
      }
    // loop-invariant: one frame construction per distinct type, not per step
    val schemasByType = steps.map(_._1).distinct.map(t => t -> frameFor(t).schema).toMap

    // per-side filtered + projected frames
    val sides = steps.zipWithIndex.map { case ((tpe, _), i) =>
      val df0 = QueryCompiler.applyBaseFilters(frameFor(tpe), q.copy(where = None))
      val filtered = q.where match {
        case Some(expr) =>
          splitForType(expr, tpe, schemasByType) match {
            case Some(sideExpr) => df0.filter(ExprCompiler.compile(sideExpr, df0.schema))
            case None           => df0
          }
        case None => df0
      }
      val payloadCols = filtered.columns.filterNot(EventSchema.AllCoreFields.contains).toSeq
      val wanted = q.returnFields match {
        case None | Some(Seq()) => payloadCols
        case Some(fs) =>
          fs.flatMap { f =>
            val plain = if (f.contains(".")) {
              val Array(p, n) = f.split("\\.", 2); if (p == tpe) Some(n) else None
            } else Some(f)
            // shadowed names resolve to their internal p$ column (and the
            // internal spelling itself is not addressable) — the same
            // mapping as QueryCompiler.compileSelection
            plain.flatMap(EventSchema.resolveReturn).filter(payloadCols.contains)
          }
      }
      (filtered, wanted, prefixes(i))
    }

    // output schema: link_value, then per step: <p>_timestamp + <p>_<field>…
    // (shadowed internal columns surface under their DECLARED name)
    val outFields = StructField("link_value", StringType) +:
      sides.flatMap { case (df, wanted, p) =>
        StructField(s"${p}_${EventSchema.Timestamp}", LongType) +:
          wanted.map(f =>
            df.schema(f).copy(name = s"${p}_${EventSchema.displayName(f)}", nullable = true))
      }
    val outSchema = StructType(outFields)

    // tagged union: [__link, __side, __ts, __eid, f0, f1, …] where the payload
    // slots are per-side (nulls elsewhere) — one unionByName, one shuffle.
    val slotNames = sides.zipWithIndex.flatMap { case ((_, wanted, _), i) =>
      wanted.map(f => s"__s${i}_$f")
    }
    val tagged = sides.zipWithIndex.map { case ((df, wanted, _), i) =>
      val slots = sides.zipWithIndex.flatMap { case ((_, w2, _), j) =>
        w2.map { f =>
          if (i == j) col(f).as(s"__s${j}_$f")
          else lit(null).cast(sides(j)._1.schema(f).dataType).as(s"__s${j}_$f")
        }
      }
      // a side lacking the USING TIME field orders at 0 (reference
      // `read/sequence/group.rs:368-377`: get_i64_at(...).unwrap_or(0))
      val tsCol =
        if (df.columns.contains(timeField)) col(timeField).cast("long") else lit(0L)
      // a side whose schema lacks the LINKED BY field contributes no rows
      // (null link -> dropped by the isNotNull filter, so the group never
      // completes — the reference's missing-link-value behavior) instead of
      // failing analysis with UNRESOLVED_COLUMN (r15 review finding)
      val linkCol =
        if (df.columns.contains(linkField)) col(linkField).cast("string")
        else lit(null).cast("string")
      val eidCol =
        if (df.columns.contains(EventSchema.EventId)) col(EventSchema.EventId)
        else lit(0L)
      df.select(
        (Seq(linkCol.as("__link"), lit(i).as("__side"),
          tsCol.as("__ts"), eidCol.as("__eid")) ++ slots): _*)
    }.reduce(_.unionByName(_))
      .filter(col("__link").isNotNull)

    val links: Array[Int] = steps.map {
      case (_, Some(SequenceLink.FollowedBy)) => 1
      case (_, Some(SequenceLink.PrecededBy)) => -1
      case (_, None)                          => 0
    }.toArray
    val slotOffsets: Array[(Int, Int)] = {
      var off = 0
      sides.zipWithIndex.map { case ((_, wanted, _), _) =>
        val r = (off, wanted.size); off += wanted.size; r
      }.toArray
    }
    val nSides = sides.size

    // One hash exchange on the link key, Tungsten-sorted within partitions
    // by (link, ts, eid), then a single streaming pass that matches each
    // consecutive link group. This replaced groupByKey(Row).flatMapGroups
    // (r17): the typed-group path paid a per-row key-extraction lambda plus
    // a per-GROUP Scala sortBy with tuple allocations — ~35 µs/row measured
    // at sf0.1 — while the radix sort under sortWithinPartitions hands the
    // match pre-ordered rows for free. Memory bound is unchanged: one link
    // group buffered at a time.
    val matched = tagged
      .repartition(col("__link"))
      .sortWithinPartitions(col("__link"), col("__ts"), col("__eid"))
      .mapPartitions { it: Iterator[Row] =>
        new Iterator[Row] {
          private var pending: Iterator[Row] = Iterator.empty
          private var nextRow: Row = if (it.hasNext) it.next() else null
          private def advance(): Unit = {
            while (!pending.hasNext && nextRow != null) {
              val link = nextRow.getString(0)
              val bySide = Array.fill(nSides)(
                scala.collection.mutable.ArrayBuffer.empty[Row])
              while (nextRow != null && nextRow.getString(0) == link) {
                bySide(nextRow.getInt(1)) += nextRow
                nextRow = if (it.hasNext) it.next() else null
              }
              pending = matchGroup(link, bySide, links, slotOffsets)
            }
          }
          def hasNext: Boolean = { advance(); pending.hasNext }
          def next(): Row = { advance(); pending.next() }
        }
      }(Encoders.row(outSchema))

    // LIMIT caps matched sequences; order by (head time, then every output
    // column) for fully deterministic pagination — the reference's group
    // ordering (`matcher.rs:96-130` sort-by-earliest-timestamp) is only
    // deterministic per shard layout. Ordering resolves by POSITION via
    // unique internal names: a RETURNed payload field may shadow a step's
    // timestamp, duplicating '<prefix>_timestamp' in the output schema,
    // and a name-based orderBy would then throw an ambiguous-reference
    // AnalysisException (and silently drop the duplicate from the
    // tie-break column list).
    q.limit match {
      case Some(n) =>
        val names = outSchema.fieldNames.toIndexedSeq
        val uniq = names.indices.map(i => s"__ord$i")
        // OFFSET pages within the same deterministic order (it parses
        // whenever LIMIT does; silently returning page 1 for every page
        // was the r15 review finding)
        matched.toDF(uniq: _*)
          .orderBy((uniq(1) +: uniq.patch(1, Nil, 1)).map(col): _*)
          .offset(q.offset.getOrElse(0))
          .limit(n)
          .toDF(names: _*)
      case None => matched
    }
  }

  /** Group-local chain matching. `bySide` carries the group's rows
    * ([__link, __side, __ts, __eid, slot0…]) per step side, ALREADY
    * (ts, eid)-sorted — the caller's sortWithinPartitions ordered the
    * whole group and per-side subsequences inherit that order; emits one
    * Row per matched chain. */
  private def matchGroup(link: String,
      bySide: Array[scala.collection.mutable.ArrayBuffer[Row]],
      links: Array[Int], slotOffsets: Array[(Int, Int)]): Iterator[Row] = {
    val nSides = bySide.length
    if (bySide.exists(_.isEmpty)) return Iterator.empty
    val sorted = bySide.map(_.toArray)

    val heads = sorted(0)
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var h = 0
    while (h < heads.length) {
      val chain = new Array[Row](nSides)
      chain(0) = heads(h)
      var cursorTs = heads(h).getLong(2)
      var ok = true
      var s = 1
      while (s < nSides && ok) {
        val arr = sorted(s)
        val idx =
          if (links(s) > 0) lowerBound(arr, cursorTs)      // first ts >= cursor
          else upperBoundBefore(arr, cursorTs)             // latest ts < cursor
        if (idx < 0 || idx >= arr.length) ok = false
        else { chain(s) = arr(idx); cursorTs = arr(idx).getLong(2) }
        s += 1
      }
      if (ok) {
        val values = new Array[Any](1 + slotOffsets.map(_._2).sum + nSides)
        values(0) = link
        var vi = 1
        var i = 0
        while (i < nSides) {
          values(vi) = chain(i).getLong(2); vi += 1
          val (off, len) = slotOffsets(i)
          var k = 0
          while (k < len) { values(vi) = chain(i).get(4 + off + k); vi += 1; k += 1 }
          i += 1
        }
        out += Row.fromSeq(values.toIndexedSeq)
      }
      h += 1
    }
    out.iterator
  }

  /** first index with ts >= target, or arr.length. */
  private def lowerBound(arr: Array[Row], target: Long): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid).getLong(2) >= target) hi = mid else lo = mid + 1
    }
    lo
  }

  /** last index with ts < target, or -1. */
  private def upperBoundBefore(arr: Array[Row], target: Long): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid).getLong(2) < target) lo = mid + 1 else hi = mid
    }
    lo - 1
  }

  /** Reference `transform_where_clause_for_event_type` + ambiguity rule:
    * keep conditions whose field belongs to `tpe` (prefix match or
    * un-prefixed field present in this type's schema); un-prefixed fields
    * present in MORE THAN ONE side schema are an error. Core fields
    * (context_id/timestamp/…) are never ambiguous — they apply to all sides. */
  private[engine] def splitForType(expr: Expr, tpe: String,
      schemas: Map[String, StructType]): Option[Expr] = {
    def fieldApplies(f: FieldRef): Option[Boolean] = f.event match {
      case Some(e) => Some(e == tpe)
      case None =>
        if (EventSchema.AllCoreFields.contains(f.name)) Some(true)
        else {
          val owners = schemas.filter(_._2.fieldNames.contains(f.name)).keys.toSeq
          if (owners.size > 1)
            throw new IllegalArgumentException(
              s"ambiguous field '${f.name}' in sequence WHERE: present in ${owners.sorted.mkString(", ")} — prefix it with the event type")
          Some(owners.contains(tpe))
        }
    }
    expr match {
      case Expr.Cmp(f, op, v) =>
        if (fieldApplies(f).contains(true)) Some(Expr.Cmp(FieldRef(f.name), op, v)) else None
      case Expr.In(f, vs) =>
        if (fieldApplies(f).contains(true)) Some(Expr.In(FieldRef(f.name), vs)) else None
      case Expr.And(l, r) =>
        (splitForType(l, tpe, schemas), splitForType(r, tpe, schemas)) match {
          case (Some(a), Some(b)) => Some(Expr.And(a, b))
          case (Some(a), None)    => Some(a)
          case (None, Some(b))    => Some(b)
          case (None, None)       => None
        }
      case Expr.Or(l, r) =>
        (splitForType(l, tpe, schemas), splitForType(r, tpe, schemas)) match {
          case (Some(a), Some(b)) => Some(Expr.Or(a, b))
          case (Some(a), None)    => Some(a)
          case (None, Some(b))    => Some(b)
          case (None, None)       => None
        }
      case Expr.Not(e) => splitForType(e, tpe, schemas).map(Expr.Not)
    }
  }
}
