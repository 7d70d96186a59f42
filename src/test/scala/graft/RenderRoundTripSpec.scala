package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ast._
import graft.parser.CommandParser

/** Property: `parse(render(q)) == q` for generated QUERY ASTs.
  *
  * [[ast.Render]] is load-bearing beyond convenience — the materialization
  * catalog persists REMEMBERed queries as rendered text and re-parses them
  * on SHOW, so any render/parse drift silently corrupts stored queries.
  * This spec drives randomized ASTs (nested boolean trees, escaped string
  * literals, sequences with event-prefixed fields, every agg form, calendar
  * buckets, paging) through the round trip. Deterministic: fixed scalacheck
  * seed, no flaky shrinking.
  */
class RenderRoundTripSpec extends AnyFunSuite {

  // words the tokenizer/grammar claims; generated identifiers avoid them
  private val keywords = Set(
    "query", "find", "replay", "define", "store", "flush", "ping", "batch",
    "remember", "show", "plot", "and", "or", "not", "in", "by", "per",
    "limit", "offset", "order", "asc", "desc", "since", "for", "return",
    "linked", "using", "time", "followed", "preceded", "where", "count",
    "unique", "total", "avg", "min", "max", "hour", "day", "week", "month",
    "year", "null", "true", "false", "vs", "of", "breakdown", "over", "top",
    "filter", "exists", "as")

  private val ident: Gen[String] = (for {
    h <- Gen.alphaLowerChar
    n <- Gen.choose(0, 6)
    t <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.numChar, 1 -> Gen.const('_')))
  } yield (h :: t).mkString).retryUntil(s => !keywords(s))

  private val litGen: Gen[Lit] = Gen.frequency(
    3 -> Gen.asciiPrintableStr.map(Lit.Str(_)), // incl. quotes/backslashes
    3 -> Gen.chooseNum(-1000000L, 1000000L).map(Lit.I64(_)),
    // thousandths render as plain decimals (no scientific notation)
    2 -> Gen.chooseNum(-1000000L, 1000000L).map(n => Lit.F64(n / 1000.0)),
    1 -> Gen.oneOf(true, false).map(Lit.Bool(_)),
    1 -> Gen.const(Lit.Null))

  private def fieldGen(events: Seq[String]): Gen[FieldRef] = for {
    name <- ident
    ev <- if (events.isEmpty) Gen.const(None)
          else Gen.option(Gen.oneOf(events))
  } yield FieldRef(name, ev)

  private def exprGen(events: Seq[String], depth: Int): Gen[Expr] = {
    val cmp = for {
      f <- fieldGen(events); op <- Gen.oneOf(CompareOp.Eq, CompareOp.Neq,
        CompareOp.Gt, CompareOp.Gte, CompareOp.Lt, CompareOp.Lte)
      v <- litGen
    } yield Expr.Cmp(f, op, v)
    val in = for {
      f <- fieldGen(events); n <- Gen.choose(1, 4)
      vs <- Gen.listOfN(n, litGen)
    } yield Expr.In(f, vs)
    if (depth <= 0) Gen.oneOf(cmp, in)
    else Gen.frequency(
      3 -> cmp, 1 -> in,
      1 -> exprGen(events, depth - 1).map(Expr.Not(_)),
      1 -> Gen.zip(exprGen(events, depth - 1), exprGen(events, depth - 1))
        .map { case (l, r) => Expr.And(l, r) },
      1 -> Gen.zip(exprGen(events, depth - 1), exprGen(events, depth - 1))
        .map { case (l, r) => Expr.Or(l, r) })
  }

  private val aggGen: Gen[AggSpec] = Gen.oneOf(
    Gen.const(AggSpec.Count), ident.map(AggSpec.CountField(_)),
    ident.map(AggSpec.CountUnique(_)), ident.map(AggSpec.Total(_)),
    ident.map(AggSpec.Avg(_)), ident.map(AggSpec.Min(_)),
    ident.map(AggSpec.Max(_)))

  private val queryGen: Gen[QueryCmd] = for {
    head <- ident
    nLinks <- Gen.frequency(3 -> Gen.const(0), 2 -> Gen.choose(1, 3))
    links <- Gen.listOfN(nLinks, Gen.zip(
      Gen.oneOf(SequenceLink.FollowedBy, SequenceLink.PrecededBy), ident))
    seq = if (links.isEmpty) None else Some(EventSequence(head, links))
    events = head +: links.map(_._2)
    ctx <- Gen.option(ident)
    // ≤ 11 digits stays in TimeParser's "seconds" inference band
    since <- Gen.option(Gen.chooseNum(0L, 90000000000L))
    timeField <- if (since.isDefined) Gen.option(ident) else Gen.const(None)
    ret <- Gen.option(Gen.choose(1, 3).flatMap(Gen.listOfN(_, ident)))
    link <- if (seq.isDefined) Gen.option(ident) else Gen.const(None)
    where <- Gen.option(exprGen(if (seq.isDefined) events else Nil, 2))
    seqTime <- if (seq.isDefined) Gen.option(ident) else Gen.const(None)
    nAggs <- Gen.frequency(2 -> Gen.const(0), 2 -> Gen.choose(1, 3))
    aggs <- Gen.listOfN(nAggs, aggGen)
    bucket <- if (aggs.nonEmpty) Gen.option(Gen.oneOf(TimeGranularity.Hour,
      TimeGranularity.Day, TimeGranularity.Week, TimeGranularity.Month,
      TimeGranularity.Year)) else Gen.const(None)
    bucketField <- if (bucket.isDefined) Gen.option(ident) else Gen.const(None)
    by <- if (aggs.nonEmpty) Gen.choose(0, 2).flatMap(Gen.listOfN(_, ident))
          else Gen.const(Nil)
    limit <- Gen.option(Gen.choose(1, 10000))
    offset <- if (limit.isDefined) Gen.option(Gen.choose(0, 1000)) else Gen.const(None)
    order <- Gen.option(Gen.zip(ident, Gen.oneOf(true, false))
      .map { case (f, d) => OrderSpec(f, d) })
  } yield QueryCmd(
    eventType = head, sequence = seq, contextId = ctx, since = since,
    returnFields = ret, linkField = link, where = where,
    timeField = timeField, sequenceTimeField = seqTime, aggs = aggs,
    timeBucket = bucket, bucketTimeField = bucketField, groupBy = by,
    limit = limit, offset = offset, orderBy = order)

  test("parse(render(q)) == q on 1000 generated QUERY ASTs") {
    val params = Gen.Parameters.default
    var seed = Seed(20260813L)
    var checked = 0
    while (checked < 1000) {
      queryGen(params, seed) match {
        case Some(q) =>
          val text = Render.query(q)
          val back = try CommandParser.parse(text) catch {
            case e: Exception => fail(s"parse failed for <$text>\nast: $q\n$e")
          }
          assert(back == q, s"round-trip drift for <$text>\nexpected: $q\ngot:      $back")
          checked += 1
        case None => ()
      }
      seed = seed.next
    }
  }
}
