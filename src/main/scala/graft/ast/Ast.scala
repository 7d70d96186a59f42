package graft.ast

/** AST of the command language — mirrors the reference's AST
  * (sneldb `src/command/types.rs:5-76,246-322`) re-expressed as Scala ADTs.
  * The grammar is in SURVEY.md §2.1.
  */

/** A literal value in a WHERE comparison / IN list. */
sealed trait Lit
object Lit {
  final case class Str(v: String) extends Lit
  final case class I64(v: Long) extends Lit
  final case class F64(v: Double) extends Lit
  final case class Bool(v: Boolean) extends Lit
  case object Null extends Lit
}

/** A field reference; `event` is set for event-prefixed fields in sequence
  * queries (`a.page`) — reference `query.rs:261-263`. */
final case class FieldRef(name: String, event: Option[String] = None) {
  def render: String = event.fold(name)(e => s"$e.$name")
}

sealed trait CompareOp
object CompareOp {
  case object Eq extends CompareOp
  case object Neq extends CompareOp
  case object Gt extends CompareOp
  case object Gte extends CompareOp
  case object Lt extends CompareOp
  case object Lte extends CompareOp
}

/** WHERE expression tree; precedence NOT > AND > OR (reference `query.rs:192-211`). */
sealed trait Expr
object Expr {
  final case class Cmp(field: FieldRef, op: CompareOp, value: Lit) extends Expr
  final case class In(field: FieldRef, values: Seq[Lit]) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
}

/** Aggregation spec — reference `types.rs:272-279` / `query.rs:125-144`. */
sealed trait AggSpec {
  /** Output column name — reference naming (`aggregate_stream.rs:599-658`):
    * `count`, `count_<f>`, `count_unique_<f>`, `total_<f>`, `avg_<f>`,
    * `min_<f>`, `max_<f>`. */
  def outputName: String = this match {
    case AggSpec.Count           => "count"
    case AggSpec.CountField(f)   => s"count_$f"
    case AggSpec.CountUnique(f)  => s"count_unique_$f"
    case AggSpec.Total(f)        => s"total_$f"
    case AggSpec.Avg(f)          => s"avg_$f"
    case AggSpec.Min(f)          => s"min_$f"
    case AggSpec.Max(f)          => s"max_$f"
  }
}
object AggSpec {
  case object Count extends AggSpec
  final case class CountField(field: String) extends AggSpec
  final case class CountUnique(field: String) extends AggSpec
  final case class Total(field: String) extends AggSpec
  final case class Avg(field: String) extends AggSpec
  final case class Min(field: String) extends AggSpec
  final case class Max(field: String) extends AggSpec
}

sealed trait TimeGranularity
object TimeGranularity {
  case object Hour extends TimeGranularity
  case object Day extends TimeGranularity
  case object Week extends TimeGranularity
  case object Month extends TimeGranularity
  case object Year extends TimeGranularity
}

final case class OrderSpec(field: String, descending: Boolean)

sealed trait SequenceLink
object SequenceLink {
  /** b.ts >= a.ts (reference `matcher.rs:310-465`). */
  case object FollowedBy extends SequenceLink
  /** b.ts < a.ts, strict (reference `matcher.rs:466-600`). */
  case object PrecededBy extends SequenceLink
}

/** `QUERY a FOLLOWED BY b [FOLLOWED BY c …]` — head + links chain. */
final case class EventSequence(head: String, links: Seq[(SequenceLink, String)])

sealed trait Command

/** The QUERY / FIND command (REPLAY is rewritten into this — reference
  * `types.rs:172-202`). `eventType` may be `"*"` (all types, replay path). */
final case class QueryCmd(
    eventType: String,
    sequence: Option[EventSequence] = None,
    contextId: Option[String] = None,
    since: Option[Long] = None,      // normalized epoch seconds
    returnFields: Option[Seq[String]] = None, // None or Some(Nil) = all payload fields
    linkField: Option[String] = None,
    where: Option[Expr] = None,
    timeField: Option[String] = None,       // USING <field> — SINCE pruning field
    sequenceTimeField: Option[String] = None, // USING TIME <field>
    aggs: Seq[AggSpec] = Nil,
    timeBucket: Option[TimeGranularity] = None,
    bucketTimeField: Option[String] = None, // PER <gran> USING <field>
    groupBy: Seq[String] = Nil,
    limit: Option[Int] = None,
    offset: Option[Int] = None,
    orderBy: Option[OrderSpec] = None
) extends Command {
  def isAggregate: Boolean = aggs.nonEmpty
  def isSequence: Boolean = sequence.exists(_.links.nonEmpty)
}

final case class DefineCmd(
    eventType: String,
    version: Option[Int],
    fields: Seq[(String, String)] // name -> raw type spec (parsed by FieldType)
) extends Command

final case class StoreCmd(
    eventType: String,
    contextId: String,
    payloadJson: String
) extends Command

final case class ReplayCmd(
    eventType: Option[String],
    contextId: String,
    since: Option[Long] = None,
    timeField: Option[String] = None,
    returnFields: Option[Seq[String]] = None,
    limit: Option[Int] = None,
    offset: Option[Int] = None
) extends Command {
  /** REPLAY is sugar for QUERY with `*` allowed — reference `types.rs:172-202`. */
  def toQuery: QueryCmd = QueryCmd(
    eventType = eventType.getOrElse("*"),
    contextId = Some(contextId),
    since = since,
    timeField = timeField,
    returnFields = returnFields,
    limit = limit,
    offset = offset
  )
}

case object FlushCmd extends Command
case object PingCmd extends Command
final case class BatchCmd(commands: Seq[Command]) extends Command
final case class RememberCmd(query: QueryCmd, name: String) extends Command
final case class ShowCmd(name: String) extends Command
/** N queries side-by-side with the same metric (PLOT … VS …). */
final case class CompareCmd(queries: Seq[QueryCmd], labels: Seq[String]) extends Command

// ---- auth / user management (reference `docs/src/commands/user_management.md`) ----
final case class CreateUserCmd(name: String, key: Option[String], roles: Seq[String]) extends Command
final case class GrantCmd(perms: Seq[String], eventTypes: Seq[String], user: String) extends Command
final case class RevokePermCmd(perms: Seq[String], eventTypes: Seq[String], user: String) extends Command
final case class RevokeKeyCmd(user: String) extends Command
case object ListUsersCmd extends Command
final case class ShowPermissionsCmd(user: String) extends Command
