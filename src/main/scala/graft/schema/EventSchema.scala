package graft.schema

import org.apache.spark.sql.types._
import graft.time.TimeParser

/** Schema of one event type — the reference's `MiniSchema`
  * (sneldb `src/engine/schema/registry.rs`). Flat field map; core fields
  * (`context_id`, `event_type`, `timestamp`, `event_id`) are implicit and
  * always present on every event.
  */
final case class EventSchema(
    eventType: String,
    version: Int,
    fields: Vector[(String, FieldType)]
) {
  def fieldMap: Map[String, FieldType] = fields.toMap

  /** Payload-only Spark schema (declared field order). Fields shadowed by a
    * core name are stored under their internal column name (see
    * [[EventSchema.columnName]]). */
  def payloadStruct: StructType =
    StructType(fields.map { case (n, t) =>
      StructField(EventSchema.columnName(n), t.sparkType, t.nullable) })

  /** Full event schema: core columns + payload columns.
    * Time-typed fields are epoch-second longs (see [[FieldType]]). */
  def fullStruct: StructType = StructType(
    Seq(
      StructField(EventSchema.ContextId, StringType, nullable = false),
      StructField(EventSchema.EventType, StringType, nullable = false),
      StructField(EventSchema.Timestamp, LongType, nullable = false),
      StructField(EventSchema.EventId, LongType, nullable = false)
    ) ++ payloadStruct.fields
  )

  /** Validate + normalize one payload (parsed JSON as Map[String, Any]).
    * Enforces the reference's STORE rules (`handlers/store.rs:22`,
    * `schema/normalization.rs:14-51`): missing / extra fields and type
    * mismatches are rejected; enum values must be declared variants
    * (case-sensitive); datetime/date values are normalized to epoch seconds.
    * Returns the normalized payload in schema field order. */
  def validate(payload: Map[String, Any]): Either[String, Vector[Any]] = {
    val extra = payload.keySet -- fields.map(_._1).toSet
    if (extra.nonEmpty) // reference handlers/store.rs:258-261
      return Left(s"Payload contains fields not defined in schema: ${extra.toSeq.sorted.mkString(", ")}")
    val out = Vector.newBuilder[Any]
    for ((name, t) <- fields) {
      payload.get(name) match {
        case None | Some(null) =>
          if (t.nullable) out += null
          else return Left(s"Missing field '$name' in payload")
        case Some(v) =>
          normalizeValue(name, v, t) match {
            case Right(n)  => out += n
            case Left(err) => return Left(err)
          }
      }
    }
    Right(out.result())
  }

  /** Reference error text — `handlers/store.rs:243`. */
  private def mismatch(name: String): String = s"Field '$name' does not match expected type"

  private def normalizeValue(name: String, v: Any, t: FieldType): Either[String, Any] = t match {
    case FieldType.OptionalT(inner) => normalizeValue(name, v, inner)
    case FieldType.StringT =>
      v match { case s: String => Right(s); case _ => Left(mismatch(name)) }
    case FieldType.I64T =>
      v match {
        case n: Long   => Right(n)
        case n: Int    => Right(n.toLong)
        case n: Double if n.isWhole => Right(n.toLong)
        case _         => Left(mismatch(name))
      }
    case FieldType.U64T =>
      v match {
        case n: Long if n >= 0 => Right(n)
        case n: Int if n >= 0  => Right(n.toLong)
        case n: Double if n.isWhole && n >= 0 => Right(n.toLong)
        case _                 => Left(mismatch(name))
      }
    case FieldType.F64T =>
      v match {
        case n: Double => Right(n)
        case n: Long   => Right(n.toDouble)
        case n: Int    => Right(n.toDouble)
        case _         => Left(mismatch(name))
      }
    case FieldType.BoolT =>
      v match { case b: Boolean => Right(b); case _ => Left(mismatch(name)) }
    case FieldType.TimestampT | FieldType.DateT =>
      v match {
        case s: String =>
          TimeParser.parseToEpochSeconds(s).toRight(s"Invalid time string: '$s' (field '$name')")
        case n: Long   => TimeParser.normalizeIntegerEpoch(BigInt(n)).toRight(mismatch(name))
        case n: Int    => TimeParser.normalizeIntegerEpoch(BigInt(n)).toRight(mismatch(name))
        case n: Double => Right(math.floor(n).toLong)
        case _         => Left(mismatch(name))
      }
    case FieldType.EnumT(variants) =>
      v match {
        case s: String if variants.contains(s) => Right(s)
        case _         => Left(mismatch(name))
      }
  }
}

object EventSchema {
  // Core column names (reference `event.rs:50-58`).
  val ContextId = "context_id"
  val EventType = "event_type"
  val Timestamp = "timestamp"
  val EventId = "event_id"
  val CoreFields: Seq[String] = Seq(ContextId, EventType, Timestamp)
  val AllCoreFields: Seq[String] = Seq(ContextId, EventType, Timestamp, EventId)

  /** Payload fields may SHADOW core names (the reference stores payload in a
    * separate map, so `DEFINE t FIELDS { "timestamp": "int" }` is legal —
    * scenarios `sequence_followed_by_with_common_where` et al. rely on it).
    * Our events are ONE flat frame, so a shadowed field is stored under this
    * prefixed internal column name; reads resolve core-first exactly like
    * the reference's `get_field_scalar` (`event.rs:50-58` matches core names
    * before the payload map), and the prefix is stripped again at the
    * response-rendering boundary ([[graft.store.Responses]]). */
  val ShadowPrefix = "p$"

  /** Internal storage column for a declared payload field name. */
  def columnName(declared: String): String =
    if (AllCoreFields.contains(declared)) ShadowPrefix + declared else declared

  /** Resolve a RETURN-listed field name to its internal storage column.
    * The internal `p$<core>` spelling itself is NOT addressable from the
    * query surface (None — the field is then "unknown" and ignored, the
    * same fence [[fromSpecs]] enforces at DEFINE time); everything else
    * maps through [[columnName]]. */
  def resolveReturn(declared: String): Option[String] =
    if (declared.startsWith(ShadowPrefix) &&
        AllCoreFields.contains(declared.substring(ShadowPrefix.length))) None
    else Some(columnName(declared))

  /** Declared (user-facing) name for an internal payload column. */
  def displayName(column: String): String =
    if (column.startsWith(ShadowPrefix) &&
        AllCoreFields.contains(column.substring(ShadowPrefix.length)))
      column.substring(ShadowPrefix.length)
    else column

  def fromSpecs(eventType: String, version: Int, specs: Seq[(String, String)]): Either[String, EventSchema] = {
    if (specs.isEmpty) return Left("schema must declare at least one field")
    val names = specs.map(_._1)
    if (names.distinct.size != names.size) return Left("duplicate field names in schema")
    // declared names must not collide with the internal shadow columns
    val spoofed = names.filter(n => n.startsWith(ShadowPrefix) &&
      AllCoreFields.contains(n.substring(ShadowPrefix.length)))
    if (spoofed.nonEmpty) return Left(s"invalid field names: ${spoofed.mkString(", ")}")
    val parsed = Vector.newBuilder[(String, FieldType)]
    for ((n, spec) <- specs)
      FieldType.fromString(spec) match {
        case Right(t)  => parsed += ((n, t))
        case Left(err) => return Left(err)
      }
    Right(EventSchema(eventType, version, parsed.result()))
  }
}
