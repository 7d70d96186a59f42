package graft.schema

import org.apache.spark.sql.types._

/** User-facing field types of the event schema language.
  *
  * Mirrors the reference type system (sneldb `src/engine/schema/types.rs:32-60`):
  * primitives `string | int | u64 | float | bool | datetime | date`, enums as a
  * list of variants, and `T | null` optionality. Schemas are flat — nested
  * objects are rejected at DEFINE time.
  *
  * Spark mapping follows SURVEY.md §1.4: `datetime`/`date` are stored as
  * epoch-second `LongType` for bit-exact semantics with the reference, which
  * normalizes all time inputs to epoch seconds.
  */
sealed trait FieldType {
  /** Physical Spark type used for storage and query execution. */
  def sparkType: DataType
  def nullable: Boolean = false
  /** Render back to the DEFINE-language spelling. */
  def render: String
}

object FieldType {
  case object StringT extends FieldType {
    val sparkType: DataType = StringType; val render = "string"
  }
  case object I64T extends FieldType {
    val sparkType: DataType = LongType; val render = "int"
  }
  /** u64 in the reference; Spark has no unsigned long — LongType + ingest range check. */
  case object U64T extends FieldType {
    val sparkType: DataType = LongType; val render = "u64"
  }
  case object F64T extends FieldType {
    val sparkType: DataType = DoubleType; val render = "float"
  }
  case object BoolT extends FieldType {
    val sparkType: DataType = BooleanType; val render = "bool"
  }
  /** Epoch seconds (UTC), truncated — reference `src/shared/time.rs:13-83`. */
  case object TimestampT extends FieldType {
    val sparkType: DataType = LongType; val render = "datetime"
  }
  /** Midnight-UTC epoch seconds — reference `TimeKind::Date`. */
  case object DateT extends FieldType {
    val sparkType: DataType = LongType; val render = "date"
  }
  /** `T | null` — nullable wrapper. */
  final case class OptionalT(inner: FieldType) extends FieldType {
    def sparkType: DataType = inner.sparkType
    override def nullable: Boolean = true
    def render: String = inner.render + " | null"
  }
  /** Enum of ≤256 case-sensitive variants (reference `types.rs:13-25`). */
  final case class EnumT(variants: Seq[String]) extends FieldType {
    require(variants.nonEmpty && variants.size <= 256, "enum must have 1..256 variants")
    require(variants.distinct.size == variants.size, "duplicate enum variants")
    val sparkType: DataType = StringType
    def render: String = variants.mkString("[", ", ", "]")
  }

  /** Strip optionality — the underlying value type. */
  def base(t: FieldType): FieldType = t match {
    case OptionalT(inner) => base(inner)
    case other            => other
  }

  /** Primitive-name aliases — reference `types.rs:48-60` (`from_primitive_str`). */
  private val aliases: Map[String, FieldType] = Map(
    "string" -> StringT, "str" -> StringT, "text" -> StringT, "varchar" -> StringT,
    "int" -> I64T, "integer" -> I64T, "i64" -> I64T,
    "u64" -> U64T, "uint" -> U64T,
    "float" -> F64T, "double" -> F64T, "number" -> F64T, "f64" -> F64T,
    "bool" -> BoolT, "boolean" -> BoolT,
    "datetime" -> TimestampT, "timestamp" -> TimestampT,
    "date" -> DateT
  )

  /** Parse a DEFINE-language type spelling, e.g. `"int"`, `"string | null"`,
    * or an enum variant list `"[pro, basic]"`. */
  def fromString(spec: String): Either[String, FieldType] = {
    val s = spec.trim
    if (s.startsWith("[") && s.endsWith("]")) {
      val variants = s.substring(1, s.length - 1).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      if (variants.isEmpty) Left("enum must have at least one variant")
      else if (variants.size > 256) Left("enum must have at most 256 variants")
      else if (variants.distinct.size != variants.size) Left("duplicate enum variants")
      else Right(EnumT(variants))
    } else if (s.contains("|")) {
      val parts = s.split("\\|").map(_.trim)
      if (parts.length == 2 && parts(1).equalsIgnoreCase("null"))
        fromString(parts(0)).map(OptionalT)
      else Left(s"invalid optional type spec: '$spec' (expected 'T | null')")
    } else
      aliases.get(s.toLowerCase) match {
        case Some(t) => Right(t)
        case None    => Left(s"unknown field type: '$spec'")
      }
  }
}
