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

  test("schema rejects dup/spoofed fields; core names may be shadowed") {
    assert(EventSchema.fromSpecs("t", 1, Seq("a" -> "int", "a" -> "int")).isLeft)
    assert(EventSchema.fromSpecs("t", 1, Nil).isLeft)
    // payload may shadow a core name (reference stores payload separately —
    // DIVERGENCES.md #6, resolved r6): stored under the internal p$ column
    val s = EventSchema.fromSpecs("t", 1, Seq("timestamp" -> "int")).toOption.get
    assert(s.payloadStruct.fieldNames.toSeq == Seq("p$timestamp"))
    assert(EventSchema.displayName("p$timestamp") == "timestamp")
    assert(EventSchema.columnName("tag") == "tag") // identity off core names
    // declared names that collide with the internal shadow columns refuse
    assert(EventSchema.fromSpecs("t", 1, Seq("p$timestamp" -> "int")).isLeft)
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

  test("[time] config: timezone + week start bucketing (reference time_bucketing.rs)") {
    import org.apache.spark.sql.functions._
    import graft.ast.TimeGranularity
    import graft.time.TimeBucketing
    val spark = SparkTestSession.spark
    import spark.implicits._
    def bucket(ts: Long, g: TimeGranularity, zone: String = "UTC", weekStart: Int = 0): Long =
      Seq(ts).toDF("ts")
        .select(TimeBucketing.calendarBucket(col("ts"), g, zone, weekStart).as("b"))
        .head().getLong(0)

    // UTC defaults unchanged (the oracle-checked q_agg_per_* behavior)
    assert(bucket(1710331200L, TimeGranularity.Day) == 1710288000L)  // 2024-03-13 12:00Z → 00:00Z
    assert(bucket(1710331200L, TimeGranularity.Week) == 1710115200L) // → Mon 2024-03-11

    // day bucket aligns to LOCAL midnight: 2024-03-10 06:00Z is 01:00 EST;
    // the New York day starts 2024-03-10 00:00 EST = 05:00Z
    assert(bucket(1710050400L, TimeGranularity.Day, "America/New_York") == 1710046800L)

    // reference calendar_bucketing_dst_transition: hour buckets straddling
    // the 2024-03-10 spring-forward differ and align to local hour starts
    val beforeDst = bucket(1710050400L, TimeGranularity.Hour, "America/New_York") // 01:00 EST
    val afterDst = bucket(1710054000L, TimeGranularity.Hour, "America/New_York")  // 03:00 EDT
    assert(beforeDst == 1710050400L && afterDst == 1710054000L && beforeDst != afterDst)

    // configurable week start (reference week_start config): Wed 2024-03-13
    // belongs to the week starting Sun 2024-03-10 when weeks start Sunday
    assert(bucket(1710331200L, TimeGranularity.Week, "UTC", TimeBucketing.parseWeekStart("sunday")) == 1710028800L)
    // Sunday itself is the bucket start
    assert(bucket(1710028800L + 3600L, TimeGranularity.Week, "UTC", 6) == 1710028800L)
    // Saturday start: Wed 2024-03-13 → Sat 2024-03-09
    assert(bucket(1710331200L, TimeGranularity.Week, "UTC", 5) == 1709942400L)

    assert(TimeBucketing.parseWeekStart("Mon") == 0)
    intercept[IllegalArgumentException] { TimeBucketing.parseWeekStart("noday") }

    // end-to-end: PER DAY honors spark.graft.time.zone via the query path
    val dir = java.nio.file.Files.createTempDirectory("graft_tz_").toString
    val s = new graft.store.EventStore(spark, dir)
    s.execute("""DEFINE e FIELDS { at: "datetime", v: "int" }""")
    // 01:30Z and 23:30Z on 2024-03-10: same UTC day, different NY days
    s.execute("""STORE e FOR c PAYLOAD {"at": "2024-03-10T01:30:00Z", "v": 1}""")
    s.execute("""STORE e FOR c PAYLOAD {"at": "2024-03-10T23:30:00Z", "v": 1}""")
    s.execute("FLUSH")
    def countBuckets(): Long = s.execute("QUERY e COUNT PER DAY USING at") match {
      case graft.store.ExecResult.Frame(df) => df.count()
      case other                            => fail(other.toString)
    }
    assert(countBuckets() == 1L) // UTC: one day
    spark.conf.set("spark.graft.time.zone", "America/New_York")
    try assert(countBuckets() == 2L) // NY: 2024-03-09 20:30 EST vs 03-10 19:30 EDT
    finally spark.conf.unset("spark.graft.time.zone")
  }
}
