package graft.ast

/** Render AST nodes back to command text (the inverse of
  * [[graft.parser.CommandParser]]) — used by the materialization catalog
  * (stored queries) and the HTTP JSON command form. */
object Render {

  def query(q: QueryCmd): String = {
    val sb = new StringBuilder(s"QUERY ${q.eventType}")
    q.sequence.foreach(_.links.foreach { case (l, t) =>
      sb.append(l match {
        case SequenceLink.FollowedBy => s" FOLLOWED BY $t"
        case SequenceLink.PrecededBy => s" PRECEDED BY $t"
      })
    })
    q.contextId.foreach(c => sb.append(s" FOR $c"))
    q.since.foreach(s => sb.append(s" SINCE $s"))
    q.returnFields.foreach(fs => sb.append(fs.mkString(" RETURN [", ", ", "]")))
    q.linkField.foreach(f => sb.append(s" LINKED BY $f"))
    q.where.foreach(w => sb.append(" WHERE " + expr(w)))
    q.sequenceTimeField.foreach(f => sb.append(s" USING TIME $f"))
    q.timeField.foreach(f => sb.append(s" USING $f"))
    if (q.aggs.nonEmpty) sb.append(q.aggs.map(agg).mkString(" ", ", ", ""))
    q.timeBucket.foreach(g => sb.append(s" PER ${g.toString.toUpperCase}" +
      q.bucketTimeField.map(f => s" USING $f").getOrElse("")))
    if (q.groupBy.nonEmpty) sb.append(q.groupBy.mkString(" BY ", ", ", ""))
    q.limit.foreach(n => sb.append(s" LIMIT $n"))
    q.offset.foreach(n => sb.append(s" OFFSET $n"))
    q.orderBy.foreach(o => sb.append(s" ORDER BY ${o.field} ${if (o.descending) "DESC" else "ASC"}"))
    sb.toString
  }

  def agg(a: AggSpec): String = a match {
    case AggSpec.Count           => "COUNT"
    case AggSpec.CountField(f)   => s"COUNT $f"
    case AggSpec.CountUnique(f)  => s"COUNT UNIQUE $f"
    case AggSpec.Total(f)        => s"TOTAL $f"
    case AggSpec.Avg(f)          => s"AVG $f"
    case AggSpec.Min(f)          => s"MIN $f"
    case AggSpec.Max(f)          => s"MAX $f"
  }

  def expr(e: Expr): String = e match {
    case Expr.Cmp(f, op, v) =>
      val o = op match {
        case CompareOp.Eq => "="; case CompareOp.Neq => "!="
        case CompareOp.Gt => ">"; case CompareOp.Gte => ">="
        case CompareOp.Lt => "<"; case CompareOp.Lte => "<="
      }
      s"${f.render} $o ${lit(v)}"
    case Expr.In(f, vs)  => s"${f.render} IN (${vs.map(lit).mkString(", ")})"
    case Expr.Not(inner) => s"NOT (${expr(inner)})"
    case Expr.And(l, r)  => s"(${expr(l)} AND ${expr(r)})"
    case Expr.Or(l, r)   => s"(${expr(l)} OR ${expr(r)})"
  }

  def lit(l: Lit): String = l match {
    // backslash first — a value ending in '\' must not escape the closing
    // quote when the rendered text is re-parsed (tokenizer unescape is
    // CommandParser.scala: '\x' → 'x')
    case Lit.Str(s)  => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case Lit.I64(n)  => n.toString
    case Lit.F64(d)  => d.toString
    case Lit.Bool(b) => b.toString
    case Lit.Null    => "null"
  }
}
