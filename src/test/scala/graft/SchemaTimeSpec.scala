package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.schema.{EventSchema, FieldType}
import graft.time.TimeParser

class SchemaTimeSpec extends AnyFunSuite {
  import FieldType._

  test("type aliases resolve (reference types.rs:48-60)") {
    assert(FieldType.fromString("integer") == Right(I64T))
    assert(FieldType.fromString("double") == Right(F64T))
    assert(FieldType.fromString("varchar") == Right(StringT))
    assert(FieldType.fromString("boolean") == Right(BoolT))
    assert(FieldType.fromString("timestamp") == Right(TimestampT))
    assert(FieldType.fromString("date") == Right(DateT))
    assert(FieldType.fromString("string | null") == Right(OptionalT(StringT)))
    assert(FieldType.fromString("wibble").isLeft)
  }

  test("schema rejects dup fields and reserved names") {
    assert(EventSchema.fromSpecs("t", 1, Seq("a" -> "int", "a" -> "int")).isLeft)
    assert(EventSchema.fromSpecs("t", 1, Seq("timestamp" -> "int")).isLeft)
    assert(EventSchema.fromSpecs("t", 1, Nil).isLeft)
  }

  test("payload validation: missing, extra, type mismatch, enum") {
    val s = EventSchema.fromSpecs("sub", 1,
      Seq("plan" -> "[pro, basic]", "n" -> "int", "note" -> "string | null")).toOption.get
    assert(s.validate(Map("plan" -> "pro", "n" -> 3L)).isRight)
    assert(s.validate(Map("plan" -> "pro", "n" -> 3L, "zzz" -> 1L)).isLeft)  // extra
    assert(s.validate(Map("plan" -> "pro")).isLeft)                          // missing n
    assert(s.validate(Map("plan" -> "Pro", "n" -> 3L)).isLeft)               // case-sensitive enum
    assert(s.validate(Map("plan" -> "pro", "n" -> "x")).isLeft)              // type mismatch
    assert(s.validate(Map("plan" -> "basic", "n" -> 1L, "note" -> null)) ==
      Right(Vector("basic", 1L, null)))
  }

  test("datetime normalization in payloads") {
    val s = EventSchema.fromSpecs("t", 1, Seq("at" -> "datetime")).toOption.get
    assert(s.validate(Map("at" -> "2024-01-15T00:00:00Z")) == Right(Vector(1705276800L)))
    assert(s.validate(Map("at" -> 1705276800123L)) == Right(Vector(1705276800L)))
  }

  test("TimeParser unit inference (reference time.rs:83-101)") {
    assert(TimeParser.parseToEpochSeconds("1705276800").contains(1705276800L))          // s
    assert(TimeParser.parseToEpochSeconds("1705276800123").contains(1705276800L))       // ms
    assert(TimeParser.parseToEpochSeconds("1705276800123456").contains(1705276800L))    // µs
    assert(TimeParser.parseToEpochSeconds("1705276800123456789").contains(1705276800L)) // ns
    assert(TimeParser.parseToEpochSeconds("42").contains(42L))
  }

  test("TimeParser ISO offsets and fractions truncate") {
    assert(TimeParser.parseToEpochSeconds("2024-01-15T01:00:00+01:00").contains(1705276800L))
    assert(TimeParser.parseToEpochSeconds("2024-01-15T00:00:00.999Z").contains(1705276800L))
    assert(TimeParser.parseToEpochSeconds("2024-01-15").contains(1705276800L))
    assert(TimeParser.parseToEpochSeconds("not-a-time").isEmpty)
  }
}
