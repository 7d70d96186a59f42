package graft.parser

import graft.ast._
import graft.time.TimeParser
import scala.collection.mutable.ArrayBuffer

/** Parse error with a human-readable message (the reference returns 400s with
  * similar messages — `src/command/parser/command.rs:19-93`). */
final case class ParseException(msg: String) extends Exception(msg)

/** Recursive-descent parser for the command language (SURVEY.md §2.1).
  *
  * Grammar (keywords case-insensitive; reference PEG
  * `src/command/parser/commands/query.rs:26-277`):
  * {{{
  * QUERY <type|*> [FOLLOWED BY|PRECEDED BY <type>]…
  *   [FOR ctx] [SINCE ts] [RETURN [f,…]] [LINKED BY f] [WHERE expr]
  *   [USING TIME f] [USING f] [agg[, agg…]] [PER gran [USING f]]
  *   [BY f[,f…] [USING f]] [LIMIT n] [OFFSET n] [ORDER BY f [ASC|DESC]]
  * }}}
  * Optional clauses are accepted in any order (superset of the reference's
  * fixed clause order). Precedence in WHERE: NOT > AND > OR.
  */
object CommandParser {

  // ---------------- tokenizer ----------------

  sealed trait Tok { def text: String }
  final case class Word(text: String) extends Tok
  final case class Str(text: String) extends Tok // unquoted content
  final case class Sym(text: String) extends Tok

  private val symbols = List("->", "!=", ">=", "<=", "(", ")", ",", "[", "]", "{", "}", ":", "=", ">", "<")

  def tokenize(input: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = input(i)
          if (d == '\\' && i + 1 < n) { sb.append(input(i + 1)); i += 2 }
          else if (d == quote) { closed = true; i += 1 }
          else { sb.append(d); i += 1 }
        }
        if (!closed) throw ParseException(s"unterminated string literal starting at offset ${i}")
        out += Str(sb.toString)
      } else {
        symbols.find(s => input.startsWith(s, i)) match {
          case Some(s) => out += Sym(s); i += s.length
          case None =>
            val start = i
            while (i < n && !input(i).isWhitespace && !isSymStart(input, i) &&
                   input(i) != '"' && input(i) != '\'') i += 1
            out += Word(input.substring(start, i))
        }
      }
    }
    out.toVector
  }

  private def isSymStart(s: String, i: Int): Boolean = {
    val c = s(i)
    // '-' and '.' are word chars (ISO dates, negative numbers, dotted fields)
    c == '(' || c == ')' || c == ',' || c == '[' || c == ']' || c == '{' || c == '}' ||
    c == ':' || c == '=' || c == '>' || c == '<' ||
    (c == '!' && i + 1 < s.length && s(i + 1) == '=') ||
    (c == '-' && i + 1 < s.length && s(i + 1) == '>')
  }

  // ---------------- parser state ----------------

  private final class P(val toks: Vector[Tok], val raw: String) {
    var depth: Int = 0 // expression nesting level (see MaxExprDepth)
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok =
      if (pos < toks.length) { val t = toks(pos); pos += 1; t }
      else throw ParseException("unexpected end of command")
    def isKw(t: Tok, kw: String): Boolean = t match {
      case Word(w) => w.equalsIgnoreCase(kw); case _ => false
    }
    def peekKw(kw: String): Boolean = peek.exists(isKw(_, kw))
    def peekKw2(kw1: String, kw2: String): Boolean =
      peekKw(kw1) && pos + 1 < toks.length && isKw(toks(pos + 1), kw2)
    def eatKw(kw: String): Boolean = if (peekKw(kw)) { pos += 1; true } else false
    def expectKw(kw: String): Unit =
      if (!eatKw(kw)) throw ParseException(s"expected '$kw' but found ${peek.map(_.text).getOrElse("<end>")}")
    def expectSym(s: String): Unit = next() match {
      case Sym(`s`) => ()
      case t        => throw ParseException(s"expected '$s' but found '${t.text}'")
    }
    def word(): String = next() match {
      case Word(w) => w
      case Str(s)  => s
      case t       => throw ParseException(s"expected identifier but found '${t.text}'")
    }
    def int(): Int = next() match {
      case Word(w) if w.matches("-?\\d+") => w.toInt
      case t => throw ParseException(s"expected integer but found '${t.text}'")
    }
    def done: Boolean = pos >= toks.length
  }

  private val clauseKeywords = Set(
    "for", "since", "return", "linked", "where", "using", "per", "by", "limit",
    "offset", "order", "followed", "preceded", "count", "total", "avg", "min",
    "max", "and", "or", "not", "in", "asc", "desc", "unique", "time", "vs")

  // ---------------- public entry ----------------

  def parse(input: String): Command = parseImpl(input, batchDepth = 0)

  /** Batch nesting bound: each BATCH level re-parses its parts, so an
    * adversarial `BATCH [ BATCH { [ … ] } …` (braces shield the inner
    * brackets from the splitter) recursed once per level AND copied the
    * remaining text per level — O(n²) blowup to a driver OOM from a
    * ~400 KB command. The reference has no nested-batch semantics; 4
    * levels is already generous. */
  private val MaxBatchDepth = 4

  private def parseImpl(input: String, batchDepth: Int): Command = {
    val trimmed = input.trim
    val p = new P(tokenize(trimmed), trimmed)
    val head = p.word().toUpperCase
    head match {
      case "QUERY" | "FIND" => parseQuery(p)
      case "REPLAY"         => parseReplay(p)
      case "DEFINE"         => parseDefine(p)
      case "STORE"          => parseStore(p, trimmed)
      case "FLUSH"          => FlushCmd
      case "PING"           => PingCmd
      case "REMEMBER"       => parseRemember(p)
      case "BATCH"          => parseBatch(trimmed, batchDepth)
      case "SHOW" =>
        if (p.eatKw("permissions")) { p.eatKw("for"); ShowPermissionsCmd(p.word()) }
        else ShowCmd(p.word())
      case "CREATE" =>
        p.expectKw("user"); parseCreateUser(p)
      case "GRANT"          => parseGrantRevoke(p, isGrant = true)
      case "REVOKE" =>
        if (p.eatKw("key")) RevokeKeyCmd(p.word()) else parseGrantRevoke(p, isGrant = false)
      case "LIST" =>
        p.expectKw("users"); ListUsersCmd
      case "AUTH" =>
        // AUTH user:signature — a transport/session construct; surfaced as a
        // parse error pointing at the SecureEventStore credential mechanism
        throw ParseException("AUTH is handled by the session transport; pass credentials as 'user_id=<u> signature=<sig>' suffix")
      case "PLOT"           => parsePlot(p)
      case other            => throw ParseException(s"unknown command: $other")
    }
  }

  // ---------------- QUERY ----------------

  private[parser] def parseQuery(p: P): QueryCmd = {
    val eventType = p.word()
    // sequence links
    val links = ArrayBuffer.empty[(SequenceLink, String)]
    var continue = true
    while (continue) {
      if (p.peekKw2("followed", "by")) { p.pos += 2; links += ((SequenceLink.FollowedBy, p.word())) }
      else if (p.peekKw2("preceded", "by")) { p.pos += 2; links += ((SequenceLink.PrecededBy, p.word())) }
      else continue = false
    }
    var q = QueryCmd(eventType,
      sequence = if (links.nonEmpty) Some(EventSequence(eventType, links.toSeq)) else None)

    var progressed = true
    while (!p.done && progressed) {
      progressed = true
      if (p.eatKw("for")) q = q.copy(contextId = Some(p.word()))
      else if (p.eatKw("since")) q = q.copy(since = parseSince(p))
      else if (p.eatKw("return")) q = q.copy(returnFields = Some(parseReturnList(p)))
      else if (p.peekKw2("linked", "by")) { p.pos += 2; q = q.copy(linkField = Some(p.word())) }
      else if (p.eatKw("where")) q = q.copy(where = Some(parseOr(p)))
      else if (p.peekKw2("using", "time")) { p.pos += 2; q = q.copy(sequenceTimeField = Some(p.word())) }
      else if (p.eatKw("using")) q = q.copy(timeField = Some(p.word()))
      else if (p.eatKw("per")) {
        val g = parseGranularity(p.word())
        val f = if (p.peekKw2("using", "time")) { p.pos += 2; Some(p.word()) }
                else if (p.eatKw("using")) Some(p.word()) else None
        q = q.copy(timeBucket = Some(g), bucketTimeField = f)
      }
      else if (p.peekKw2("order", "by")) {
        p.pos += 2
        val f = p.word()
        val desc = if (p.eatKw("desc")) true else { p.eatKw("asc"); false }
        q = q.copy(orderBy = Some(OrderSpec(f, desc)))
      }
      else if (p.eatKw("by")) {
        val fields = ArrayBuffer(p.word())
        while (p.peek.contains(Sym(","))) { p.pos += 1; fields += p.word() }
        val f = if (p.eatKw("using")) Some(p.word()) else None
        q = q.copy(groupBy = fields.toSeq,
          bucketTimeField = f.orElse(q.bucketTimeField))
      }
      else if (p.eatKw("limit")) q = q.copy(limit = Some(p.int()))
      else if (p.eatKw("offset")) q = q.copy(offset = Some(p.int()))
      else if (isAggStart(p)) {
        val aggs = ArrayBuffer(parseAgg(p))
        while (p.peek.contains(Sym(","))) { p.pos += 1; aggs += parseAgg(p) }
        q = q.copy(aggs = q.aggs ++ aggs)
      }
      else progressed = false
    }
    if (!p.done) throw ParseException(s"unexpected token: '${p.peek.get.text}'")
    // reference parity: pagination is only defined relative to a bounded page
    if (q.offset.isDefined && q.limit.isEmpty)
      throw ParseException("OFFSET requires LIMIT")
    q
  }

  private def isAggStart(p: P): Boolean =
    p.peekKw("count") || p.peekKw("total") || p.peekKw("avg") || p.peekKw("min") || p.peekKw("max")

  private def parseAgg(p: P): AggSpec = {
    val kw = p.word().toLowerCase
    kw match {
      case "count" =>
        if (p.eatKw("unique")) AggSpec.CountUnique(p.word())
        else p.peek match {
          case Some(Word(w)) if !clauseKeywords.contains(w.toLowerCase) =>
            p.pos += 1; AggSpec.CountField(w)
          case _ => AggSpec.Count
        }
      case "total" => AggSpec.Total(p.word())
      case "avg"   => AggSpec.Avg(p.word())
      case "min"   => AggSpec.Min(p.word())
      case "max"   => AggSpec.Max(p.word())
      case other   => throw ParseException(s"unknown aggregation: $other")
    }
  }

  private def parseGranularity(w: String): TimeGranularity = w.toLowerCase match {
    case "hour"  => TimeGranularity.Hour
    case "day"   => TimeGranularity.Day
    case "week"  => TimeGranularity.Week
    case "month" => TimeGranularity.Month
    case "year"  => TimeGranularity.Year
    case other   => throw ParseException(s"unknown time granularity: $other")
  }

  private def parseSince(p: P): Option[Long] = {
    // Unquoted ISO-8601 datetimes contain ':' which the tokenizer treats as a
    // symbol — reassemble `2024-03-01T00 : 00 : 00Z` style splits.
    val sb = new StringBuilder(p.next().text)
    while (p.peek.contains(Sym(":")) && p.pos + 1 < p.toks.length &&
           p.toks(p.pos + 1).isInstanceOf[Word]) {
      p.pos += 1
      sb.append(':').append(p.next().text)
    }
    // reference parity: an unparsable SINCE value is IGNORED (query includes
    // all rows) rather than rejected — scenario `since_unparsable_ignored…`
    TimeParser.parseToEpochSeconds(sb.toString)
  }

  /** `RETURN [a, b]` or `RETURN a, b` or `RETURN []` (= all fields). */
  private def parseReturnList(p: P): Seq[String] = {
    val fields = ArrayBuffer.empty[String]
    if (p.peek.contains(Sym("["))) {
      p.pos += 1
      while (!p.peek.contains(Sym("]"))) {
        fields += p.word()
        if (p.peek.contains(Sym(","))) p.pos += 1
      }
      p.expectSym("]")
    } else {
      fields += p.word()
      while (p.peek.contains(Sym(","))) { p.pos += 1; fields += p.word() }
    }
    fields.toSeq
  }

  // ---------------- WHERE expressions ----------------
  // Precedence NOT > AND > OR (reference `query.rs:192-211`).

  private[parser] def parseOr(p: P): Expr = {
    var l = parseAnd(p)
    while (p.eatKw("or")) l = Expr.Or(l, parseAnd(p))
    l
  }

  private def parseAnd(p: P): Expr = {
    var l = parseNot(p)
    while (p.eatKw("and")) l = Expr.And(l, parseNot(p))
    l
  }

  /** Expression nesting bound: recursive descent means parser stack depth
    * tracks paren/NOT depth, and an adversarial `((((…` command would kill
    * the serving thread with a StackOverflowError — an Error, which
    * `execute`'s Exception handler cannot turn into a clean protocol error.
    * 256 is far beyond any legitimate WHERE clause. */
  private val MaxExprDepth = 256

  private def enter(p: P): Unit = {
    p.depth += 1
    if (p.depth > MaxExprDepth)
      throw ParseException(s"expression nesting exceeds $MaxExprDepth levels")
  }

  private def parseNot(p: P): Expr =
    if (p.eatKw("not")) {
      enter(p)
      try Expr.Not(parseNot(p)) finally p.depth -= 1
    } else parsePrimary(p)

  private def parsePrimary(p: P): Expr = {
    if (p.peek.contains(Sym("("))) {
      p.pos += 1
      enter(p)
      val e = try parseOr(p) finally p.depth -= 1
      p.expectSym(")")
      return e
    }
    val w = p.word()
    if (w.equalsIgnoreCase("exists")) {
      // EXISTS(field) — reference plotql.rs:171-190 desugars to the
      // placeholder comparison `exists(field) = true` (its own TODO); bare
      // `exists` without parens is a parse error (plotql_tests.rs
      // rejects_invalid_exists_expression)
      if (!p.peek.contains(Sym("(")))
        throw ParseException("EXISTS requires a parenthesized field, e.g. EXISTS(user_id)")
      p.pos += 1
      val id = p.word()
      p.expectSym(")")
      return Expr.Cmp(FieldRef(s"exists($id)"), CompareOp.Eq, Lit.Bool(true))
    }
    val field = parseFieldRef(w)
    p.peek match {
      case Some(Sym(op)) if Set("=", "!=", ">", ">=", "<", "<=").contains(op) =>
        p.pos += 1
        Expr.Cmp(field, sym2op(op), parseLit(p))
      case Some(t) if p.isKw(t, "in") =>
        p.pos += 1
        p.expectSym("(")
        val vals = ArrayBuffer(parseLit(p))
        while (p.peek.contains(Sym(","))) { p.pos += 1; vals += parseLit(p) }
        p.expectSym(")")
        Expr.In(field, vals.toSeq)
      case _ =>
        // bare field ⇒ field = true (reference `query.rs:213-220`)
        Expr.Cmp(field, CompareOp.Eq, Lit.Bool(true))
    }
  }

  private def sym2op(s: String): CompareOp = s match {
    case "="  => CompareOp.Eq
    case "!=" => CompareOp.Neq
    case ">"  => CompareOp.Gt
    case ">=" => CompareOp.Gte
    case "<"  => CompareOp.Lt
    case "<=" => CompareOp.Lte
  }

  private def parseFieldRef(w: String): FieldRef = {
    val idx = w.indexOf('.')
    if (idx > 0 && idx < w.length - 1 && !w.matches("-?\\d+(\\.\\d+)?"))
      FieldRef(w.substring(idx + 1), Some(w.substring(0, idx)))
    else FieldRef(w)
  }

  /** value: "str" | number | true/false | bare-word→string (reference `query.rs:140`). */
  private def parseLit(p: P): Lit = p.next() match {
    case Str(s) => Lit.Str(s)
    case Word(w) =>
      if (w.equalsIgnoreCase("true")) Lit.Bool(true)
      else if (w.equalsIgnoreCase("false")) Lit.Bool(false)
      else if (w.equalsIgnoreCase("null")) Lit.Null
      else if (w.matches("-?\\d+")) Lit.I64(w.toLong)
      else if (w.matches("-?\\d*\\.\\d+([eE][-+]?\\d+)?") || w.matches("-?\\d+[eE][-+]?\\d+")) Lit.F64(w.toDouble)
      else Lit.Str(w)
    case t => throw ParseException(s"expected literal but found '${t.text}'")
  }

  // ---------------- REPLAY ----------------

  private def parseReplay(p: P): ReplayCmd = {
    // REPLAY [<type>] FOR <ctx> [SINCE ts] [USING f] [RETURN [...]] [LIMIT n] [OFFSET n]
    val maybeType = p.peek match {
      case Some(t) if !p.isKw(t, "for") => Some(p.word())
      case _                            => None
    }
    p.expectKw("for")
    var cmd = ReplayCmd(maybeType, p.word())
    var progressed = true
    while (!p.done && progressed) {
      if (p.eatKw("since")) cmd = cmd.copy(since = parseSince(p))
      else if (p.eatKw("using")) cmd = cmd.copy(timeField = Some(p.word()))
      else if (p.eatKw("return")) cmd = cmd.copy(returnFields = Some(parseReturnList(p)))
      else if (p.eatKw("limit")) cmd = cmd.copy(limit = Some(p.int()))
      else if (p.eatKw("offset")) cmd = cmd.copy(offset = Some(p.int()))
      else progressed = false
    }
    if (!p.done) throw ParseException(s"unexpected token: '${p.peek.get.text}'")
    if (cmd.offset.isDefined && cmd.limit.isEmpty)
      throw ParseException("OFFSET requires LIMIT")
    cmd
  }

  // ---------------- DEFINE ----------------

  private def parseDefine(p: P): DefineCmd = {
    // DEFINE <type> [AS <ver>] FIELDS { k: "type" | k: [v1, v2], ... }
    val typ = p.word()
    val ver = if (p.eatKw("as")) Some(p.int()) else None
    p.expectKw("fields")
    p.expectSym("{")
    val fields = ArrayBuffer.empty[(String, String)]
    while (!p.peek.contains(Sym("}"))) {
      val name = p.word()
      p.expectSym(":")
      val spec: String = p.peek match {
        case Some(Sym("[")) =>
          p.pos += 1
          val vs = ArrayBuffer.empty[String]
          while (!p.peek.contains(Sym("]"))) {
            vs += p.word()
            if (p.peek.contains(Sym(","))) p.pos += 1
          }
          p.expectSym("]")
          vs.mkString("[", ", ", "]")
        case _ =>
          val first = p.next().text
          // allow "T | null": tokenizer keeps '|' inside words? '|' is a word char here;
          // a spec may come as one word "string|null" or three tokens "string | null"
          if (p.peek.exists(_.text == "|")) { p.pos += 1; s"$first | ${p.word()}" }
          else first
      }
      fields += ((name, spec))
      if (p.peek.contains(Sym(","))) p.pos += 1
    }
    p.expectSym("}")
    DefineCmd(typ, ver, fields.toSeq)
  }

  // ---------------- STORE ----------------

  private def parseStore(p: P, raw: String): StoreCmd = {
    // STORE <type> FOR <ctx> PAYLOAD {json} — JSON grabbed raw with balanced braces
    val typ = p.word()
    p.expectKw("for")
    val ctx = p.word()
    p.expectKw("payload")
    val idx = raw.toUpperCase.indexOf("PAYLOAD")
    val braceStart = raw.indexOf('{', idx)
    if (braceStart < 0) throw ParseException("STORE: missing PAYLOAD JSON object")
    var depth = 0; var i = braceStart; var end = -1; var inStr = false
    while (i < raw.length && end < 0) {
      val c = raw(i)
      if (inStr) { if (c == '\\') i += 1 else if (c == '"') inStr = false }
      else if (c == '"') inStr = true
      else if (c == '{') depth += 1
      else if (c == '}') { depth -= 1; if (depth == 0) end = i }
      i += 1
    }
    if (end < 0) throw ParseException("STORE: unbalanced PAYLOAD JSON")
    StoreCmd(typ, ctx, raw.substring(braceStart, end + 1))
  }

  // ---------------- PLOT (PlotQL) ----------------
  // Reference: `src/command/parser/commands/plotql.rs:8-266`; pure sugar that
  // desugars to QueryCmd / CompareCmd (`plotql.rs:531-652`).
  //   PLOT <metric> OF <event>[-> <event>…] [FILTER expr] [TOP n [BY f]]
  //     [VS <metric> OF <event> …]… [BREAKDOWN BY f,…]
  //     [OVER HOUR|DAY|WEEK|MONTH|YEAR[(field)]] [TOP n [BY f]]
  //   metric := COUNT | COUNT(f) | UNIQUE(f) | TOTAL(f)|SUM(f) | AVG(f) | MIN(f) | MAX(f)

  /** `TOP n BY <target>` target: a plain column or a metric expression
    * (reference plotql.rs:126-134 `top_by_target`). */
  private sealed trait TopBy
  private object TopBy {
    final case class Field(name: String) extends TopBy
    final case class Metric(agg: AggSpec) extends TopBy
  }

  private final case class PlotSide(agg: AggSpec, events: Seq[String],
      where: Option[Expr], top: Option[(Int, Option[TopBy])], label: String)

  /** Event identifiers must not end with a dash (reference plotql.rs
    * identifier rule; plotql_tests.rs rejects_identifier_ending_with_dash). */
  private def plotEventName(p: P): String = {
    val w = p.word()
    if (w.endsWith("-")) throw ParseException(s"invalid identifier: '$w' (trailing dash)")
    w
  }

  /** BY target: metric keyword followed by `(` (or bare `count`) parses as a
    * metric; anything else is a column name. */
  private def parseTopBy(p: P): TopBy = {
    val metricKws = Set("count", "unique", "total", "sum", "avg", "min", "max")
    p.peek match {
      case Some(t) if metricKws.contains(t.text.toLowerCase) =>
        val isCall = p.toks.lift(p.pos + 1).contains(Sym("("))
        if (isCall || t.text.equalsIgnoreCase("count")) TopBy.Metric(parsePlotMetric(p))
        else TopBy.Field(p.word())
      case _ => TopBy.Field(p.word())
    }
  }

  private def parsePlot(p: P): Command = {
    val first = parsePlotSide(p)
    val sides = ArrayBuffer(first)
    while (p.eatKw("vs")) sides += parsePlotSide(p)
    // shared trailing clauses
    var groupBy: Seq[String] = Nil
    var bucket: Option[TimeGranularity] = None
    var bucketField: Option[String] = None
    var top: Option[(Int, Option[TopBy])] = None
    var progressed = true
    while (!p.done && progressed) {
      if (p.peekKw2("breakdown", "by")) {
        p.pos += 2
        val fs = ArrayBuffer(p.word())
        while (p.peek.contains(Sym(","))) { p.pos += 1; fs += p.word() }
        groupBy = fs.toSeq
      } else if (p.eatKw("over")) {
        bucket = Some(parseGranularity(p.word()))
        if (p.peek.contains(Sym("("))) { p.pos += 1; bucketField = Some(p.word()); p.expectSym(")") }
      } else if (p.eatKw("top")) {
        val n = p.int()
        val byF = if (p.eatKw("by")) Some(parseTopBy(p)) else None
        top = Some((n, byF))
      } else progressed = false
    }
    if (!p.done) throw ParseException(s"unexpected token: '${p.peek.get.text}'")

    def build(s: PlotSide): QueryCmd = {
      val seq =
        if (s.events.length > 1)
          Some(EventSequence(s.events.head, s.events.tail.map(e => (SequenceLink.FollowedBy: SequenceLink, e))))
        else None
      val effTop = s.top.orElse(top)
      // TOP BY a metric orders by that aggregate's output column, adding it
      // to the agg list when it differs from the side's main metric
      // (reference plotql.rs:614-652 build_order_spec_for_metrics)
      val (aggs, orderBy) = effTop match {
        case Some((_, Some(TopBy.Metric(m)))) =>
          val as = if (m == s.agg) Seq(s.agg) else Seq(s.agg, m)
          (as, Some(OrderSpec(m.outputName, descending = true)))
        case Some((_, Some(TopBy.Field(f)))) =>
          (Seq(s.agg), Some(OrderSpec(f, descending = true)))
        case Some((_, None)) =>
          (Seq(s.agg), Some(OrderSpec(s.agg.outputName, descending = true)))
        case None => (Seq(s.agg), None)
      }
      QueryCmd(s.events.head, sequence = seq, where = s.where,
        aggs = aggs, groupBy = groupBy, timeBucket = bucket,
        bucketTimeField = bucketField,
        limit = effTop.map(_._1),
        orderBy = orderBy)
    }

    if (sides.length == 1) build(sides.head)
    else {
      // exact equality including the aggregated field (reference
      // plotql.rs:275, MetricSpec::equals)
      if (sides.map(_.agg).distinct.length > 1)
        throw ParseException("All sides of a comparison query must use the same metric function")
      CompareCmd(sides.toSeq.map(build), sides.toSeq.map(_.label))
    }
  }

  private def parsePlotSide(p: P): PlotSide = {
    val agg = parsePlotMetric(p)
    p.expectKw("of")
    val events = ArrayBuffer(plotEventName(p))
    while (p.peek.exists(_.text == "->") || p.peekKw("then")) { p.pos += 1; events += plotEventName(p) }
    var where: Option[Expr] = None
    var top: Option[(Int, Option[TopBy])] = None
    var progressed = true
    while (!p.done && progressed) {
      if (p.eatKw("filter")) where = Some(parseOr(p))
      else if (p.eatKw("top")) {
        val n = p.int()
        val byF = if (p.eatKw("by")) Some(parseTopBy(p)) else None
        top = Some((n, byF))
      } else progressed = false
    }
    PlotSide(agg, events.toSeq, where, top, events.mkString("->"))
  }

  private def parsePlotMetric(p: P): AggSpec = {
    val name = p.word().toLowerCase
    def arg(): String = { p.expectSym("("); val f = p.word(); p.expectSym(")"); f }
    name match {
      case "count" =>
        if (p.peek.contains(Sym("("))) AggSpec.CountField(arg()) else AggSpec.Count
      case "unique"        => AggSpec.CountUnique(arg())
      case "total" | "sum" => AggSpec.Total(arg())
      case "avg"           => AggSpec.Avg(arg())
      case "min"           => AggSpec.Min(arg())
      case "max"           => AggSpec.Max(arg())
      case other           => throw ParseException(s"unknown PLOT metric: $other")
    }
  }

  // ---------------- auth commands ----------------
  // CREATE USER <name> [WITH KEY "key"] [WITH ROLES [r1, r2]]
  // GRANT READ[, WRITE] ON <type> TO <user> ; REVOKE … FROM|TO <user>
  // (reference `docs/src/commands/user_management.md`)

  private def parseCreateUser(p: P): CreateUserCmd = {
    val name = p.word()
    var key: Option[String] = None
    var roles: Seq[String] = Nil
    while (p.eatKw("with")) {
      if (p.eatKw("key")) key = Some(p.word())
      else if (p.eatKw("roles") || p.eatKw("role")) {
        val rs = ArrayBuffer.empty[String]
        if (p.peek.contains(Sym("["))) {
          p.pos += 1
          while (!p.peek.contains(Sym("]"))) {
            rs += p.word()
            if (p.peek.contains(Sym(","))) p.pos += 1
          }
          p.expectSym("]")
        } else {
          rs += p.word()
          while (p.peek.contains(Sym(","))) { p.pos += 1; rs += p.word() }
        }
        roles = rs.toSeq
      } else throw ParseException("CREATE USER: expected WITH KEY or WITH ROLES")
    }
    CreateUserCmd(name, key, roles)
  }

  // GRANT READ[, WRITE] ON <type>[, <type>…] TO <user>
  // REVOKE READ[, WRITE] ON <type>[, <type>…] FROM <user>
  // Permission names validate at parse time (reference
  // `parser/commands/grant_permission.rs`: "Invalid permission: ...").
  private def parseGrantRevoke(p: P, isGrant: Boolean): Command = {
    val perms = ArrayBuffer(p.word())
    while (p.peek.contains(Sym(","))) { p.pos += 1; perms += p.word() }
    perms.find(w => !w.equalsIgnoreCase("read") && !w.equalsIgnoreCase("write")).foreach { bad =>
      throw ParseException(s"Invalid permission: '$bad'. Must be 'READ' or 'WRITE'")
    }
    p.expectKw("on")
    val types = ArrayBuffer(p.word())
    while (p.peek.contains(Sym(","))) { p.pos += 1; types += p.word() }
    if (!p.eatKw("to")) p.expectKw("from")
    val user = p.word()
    if (isGrant) GrantCmd(perms.toSeq.map(_.toLowerCase), types.toSeq, user)
    else RevokePermCmd(perms.toSeq.map(_.toLowerCase), types.toSeq, user)
  }

  // ---------------- BATCH ----------------
  // `BATCH [ cmd1; cmd2; … ]` — semicolon-separated commands in brackets
  // (reference `parser/commands/batch.rs`). Split on the raw string at
  // depth 0 (semicolons inside strings/braces are preserved).
  private def parseBatch(raw: String, batchDepth: Int): BatchCmd = {
    if (batchDepth >= MaxBatchDepth)
      throw ParseException(s"BATCH nesting exceeds $MaxBatchDepth levels")
    val start = raw.indexOf('[')
    if (start < 0) throw ParseException("BATCH: expected '[' to start the block")
    var depth = 0; var inStr = false; var strQuote = ' '
    var end = -1
    val parts = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = start + 1
    while (i < raw.length && end < 0) {
      val c = raw(i)
      if (inStr) {
        if (c == '\\') { sb.append(c); if (i + 1 < raw.length) { sb.append(raw(i + 1)); i += 1 } }
        else { if (c == strQuote) inStr = false; sb.append(c) }
      } else c match {
        case '"' | '\'' => inStr = true; strQuote = c; sb.append(c)
        case '{' => depth += 1; sb.append(c)
        case '}' => depth -= 1; sb.append(c)
        case ';' if depth == 0 => parts += sb.toString; sb.clear()
        case ']' if depth == 0 => end = i
        case other => sb.append(other)
      }
      i += 1
    }
    if (end < 0) throw ParseException("BATCH: missing closing ']'")
    parts += sb.toString
    val cmds = parts.map(_.trim).filter(_.nonEmpty).map(parseImpl(_, batchDepth + 1))
    if (cmds.isEmpty) throw ParseException("BATCH must contain at least one command")
    BatchCmd(cmds.toSeq)
  }

  // ---------------- REMEMBER ----------------

  private def parseRemember(p: P): RememberCmd = {
    // REMEMBER QUERY <query…> AS <name>
    p.expectKw("query")
    // find trailing AS <name>: parse query over tokens up to last 'AS'
    val asIdx = (p.toks.length - 2 to p.pos by -1)
      .find(i => p.isKw(p.toks(i), "as"))
      .getOrElse(throw ParseException("REMEMBER: missing AS <name>"))
    val sub = new P(p.toks.slice(p.pos, asIdx), p.raw)
    val q = parseQuery(sub)
    val name = p.toks(asIdx + 1).text
    RememberCmd(q, name)
  }
}
