package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.ast._
import graft.engine.{EventSource, QueryCompiler}
import graft.parser.CommandParser
import graft.time.TimeBucketing

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same engine config as Bench/Verify: no-fork local fs — and running
      // the WHOLE suite through it is its integration coverage
      .config("spark.hadoop.fs.file.impl", classOf[graft.fs.NioLocalFileSystem].getName)
      // same engine config as Bench/Verify: suite-sized codegen class cache
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    graft.functions.Md5Long.register(s)
    graft.functions.DotLong.register(s)
    s
  }
}

class EngineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // synthetic event source: logins (bool field), payments (amount), views
  private def src: EventSource = new EventSource {
    def eventTypes = Seq("login", "payment")
    def frame(t: String): DataFrame = t match {
      case "login" =>
        Seq(("u1", "login", 100L, 1L, true, "mobile"),
            ("u1", "login", 200L, 2L, false, "web"),
            ("u2", "login", 150L, 3L, true, "web"))
          .toDF("context_id", "event_type", "timestamp", "event_id", "ok", "device")
      case "payment" =>
        Seq(("u1", "payment", 150L, 10L, 50L),
            ("u1", "payment", 250L, 11L, 75L),
            ("u2", "payment", 100L, 12L, 20L))
          .toDF("context_id", "event_type", "timestamp", "event_id", "amount")
    }
  }

  private def run(cmd: String): DataFrame =
    QueryCompiler.compile(CommandParser.parse(cmd).asInstanceOf[QueryCmd], src)

  test("bare field WHERE means = true") {
    val rows = run("QUERY login WHERE ok").collect()
    assert(rows.map(_.getAs[Long]("timestamp")).sorted.toSeq == Seq(100L, 150L))
  }

  test("wildcard scope unions differing schemas with nulls") {
    val df = QueryCompiler.compile(
      CommandParser.parse("QUERY * FOR u1 LIMIT 10").asInstanceOf[QueryCmd].copy(eventType = "*"), src)
    val rows = df.collect()
    assert(rows.length == 4)
    assert(df.columns.toSet == Set("context_id", "event_type", "timestamp", "ok", "device", "amount"))
  }

  test("REPLAY ordering is (timestamp, event_id)") {
    val r = CommandParser.parse("REPLAY FOR u1 LIMIT 10").asInstanceOf[ReplayCmd]
    val rows = QueryCompiler.compile(r.toQuery, src).collect()
    assert(rows.map(_.getAs[Long]("timestamp")).toSeq == Seq(100L, 150L, 200L, 250L))
  }

  test("aggregate output naming and values") {
    val rows = run("QUERY payment COUNT, TOTAL amount, AVG amount, MIN amount, MAX amount BY context_id").collect()
    val byCtx = rows.map(r => r.getAs[String]("context_id") -> r).toMap
    assert(byCtx("u1").getAs[Long]("count") == 2L)
    assert(byCtx("u1").getAs[Long]("total_amount") == 125L)
    assert(byCtx("u1").getAs[Double]("avg_amount") == 62.5)
    assert(byCtx("u2").getAs[Long]("min_amount") == 20L)
  }

  test("sequence FOLLOWED BY picks first b with ts >= a") {
    val rows = run("QUERY login FOLLOWED BY payment LINKED BY context_id").collect()
    // u1: login@100 → payment@150; login@200 → payment@250; u2: login@150 → none
    assert(rows.length == 2)
    val pairs = rows.map(r => (r.getAs[Long]("login_timestamp"), r.getAs[Long]("payment_timestamp"))).sorted
    assert(pairs.toSeq == Seq((100L, 150L), (200L, 250L)))
  }

  test("sequence PRECEDED BY picks latest b with ts < a") {
    val rows = run("QUERY login PRECEDED BY payment LINKED BY context_id").collect()
    // u1: login@200 ← payment@150; u2: login@150 ← payment@100; u1 login@100 ← none
    assert(rows.length == 2)
    val pairs = rows.map(r => (r.getAs[Long]("login_timestamp"), r.getAs[Long]("payment_timestamp"))).sorted
    assert(pairs.toSeq == Seq((150L, 100L), (200L, 150L)))
  }

  test("sequence per-side WHERE with prefix; ambiguity error for shared fields") {
    val rows = run("QUERY login FOLLOWED BY payment LINKED BY context_id WHERE payment.amount > 60").collect()
    // u1 login@100: first payment >= 100 with amount>60 is payment@250 (75)
    assert(rows.map(_.getAs[Long]("payment_timestamp")).toSet == Set(250L))
    // ambiguity: un-prefixed field present in BOTH side schemas → error
    val shared: EventSource = new EventSource {
      def eventTypes = Seq("a", "b")
      def frame(t: String): DataFrame =
        Seq(("u1", t, 100L, 1L, "x")).toDF("context_id", "event_type", "timestamp", "event_id", "status")
    }
    val ex = intercept[Exception] {
      QueryCompiler.compile(
        CommandParser.parse("QUERY a FOLLOWED BY b LINKED BY context_id WHERE status = web")
          .asInstanceOf[QueryCmd], shared).collect()
    }
    assert(ex.getMessage.contains("ambiguous"))
  }

  test("naiveBuckets flag switches PER to fixed-width mode") {
    // month bucket of 2024-01-16T06:00 — calendar: Jan 1; naive: epoch//2592000
    val srcT: EventSource = new EventSource {
      import spark.implicits._
      def eventTypes = Seq("e")
      def frame(t: String) =
        Seq(("u", "e", 1705384800L, 1L)).toDF("context_id", "event_type", "timestamp", "event_id")
    }
    def bucketOf(): Long =
      QueryCompiler.compile(CommandParser.parse("QUERY e COUNT PER MONTH").asInstanceOf[QueryCmd], srcT)
        .head().getAs[Long]("bucket")
    assert(bucketOf() == 1704067200L) // calendar Jan 1
    spark.conf.set("spark.graft.time.naiveBuckets", "true")
    try assert(bucketOf() == (1705384800L / 2592000L) * 2592000L)
    finally spark.conf.unset("spark.graft.time.naiveBuckets")
  }

  test("naive vs calendar bucketing") {
    import org.apache.spark.sql.functions.col
    val df = Seq(1705276800L + 3600 * 30).toDF("t") // 2024-01-16T06:00:00Z
    val naive = df.select(TimeBucketing.naiveBucket(col("t"), TimeGranularity.Month).as("b")).head.getLong(0)
    val cal = df.select(TimeBucketing.calendarBucket(col("t"), TimeGranularity.Month).as("b")).head.getLong(0)
    assert(naive == (1705384800L / 2592000L) * 2592000L)
    assert(cal == 1704067200L) // 2024-01-01T00:00:00Z
  }

  test("COUNT UNIQUE approx flag switches to HLL") {
    spark.conf.set("spark.graft.countUnique.approx", "true")
    try {
      val rows = run("QUERY payment COUNT UNIQUE amount").collect()
      // HLL on 3 distinct values is exact in practice
      assert(rows.head.getAs[Long]("count_unique_amount") == 3L)
    } finally spark.conf.unset("spark.graft.countUnique.approx")
    val exact = run("QUERY payment COUNT UNIQUE amount").collect()
    assert(exact.head.getAs[Long]("count_unique_amount") == 3L)
  }

  test("IN over numeric column and string column coercion") {
    val rows = run("QUERY payment WHERE amount IN (20, 75)").collect()
    assert(rows.map(_.getAs[Long]("amount")).sorted.toSeq == Seq(20L, 75L))
  }

  // reference ScalarValue::compare ladder (types/mod.rs:245-270): numeric
  // when both sides parse, then boolish, then lexicographic — PER ROW
  test("dynamic-compare ladder on string columns: numeric, bool, lexicographic rungs") {
    val ladderSrc: EventSource = new EventSource {
      def eventTypes = Seq("tag")
      def frame(t: String): DataFrame =
        Seq(("u1", "tag", 1L, 1L, "10"),    // numeric string
            ("u2", "tag", 2L, 2L, "9"),     // numeric string
            ("u3", "tag", 3L, 3L, "banana"),// plain string
            ("u4", "tag", 4L, 4L, "true"),  // boolish string
            ("u5", "tag", 5L, 5L, "0"))     // numeric (also boolish — numeric wins)
          .toDF("context_id", "event_type", "timestamp", "event_id", "label")
    }
    def ids(cmd: String): Seq[String] =
      QueryCompiler.compile(CommandParser.parse(cmd).asInstanceOf[QueryCmd], ladderSrc)
        .collect().map(_.getAs[String]("context_id")).sorted.toSeq
    // numeric rung: "10" > 9 numerically (lexicographic would say "10" < "9");
    // "true" hits the BOOL rung (as_bool(9)=true, true > true is false);
    // "banana" falls through to lexicographic vs "9" ('b' > '9' in ASCII)
    assert(ids("QUERY tag WHERE label > 9") == Seq("u1", "u3"))
    // equality through the numeric rung — PLUS the reference's bool-rung
    // quirk: "true" equals ANY non-zero int literal (both coerce to true
    // when the numeric rungs can't engage)
    assert(ids("QUERY tag WHERE label = 10") == Seq("u1", "u4"))
    // bool rung: int literal coerces via as_bool (non-zero = true), matching
    // the "true" string; "0" is numeric so the numeric rung catches it first
    assert(ids("QUERY tag WHERE label = 1") == Seq("u4"))
    // boolish string literal: "true" has no numeric parse, bool rung matches
    assert(ids("""QUERY tag WHERE label = "true"""") == Seq("u4"))
    // plain string literal: pure lexicographic, pushdown-friendly
    assert(ids("""QUERY tag WHERE label = "banana"""") == Seq("u3"))
    // IN mixes rungs per value ("true" rides the bool rung of `= 10`)
    assert(ids("QUERY tag WHERE label IN (10, 0)") == Seq("u1", "u4", "u5"))
  }

  test("NOT over a null-filled column keeps the row (no 3VL drop under * scope)") {
    // payment rows have NO 'device' column: the * union fills nulls, and a
    // NOT over the null comparison used to drop them (SQL three-valued
    // logic) while the single-type missing-field rung kept them
    val rows = run("""QUERY * WHERE NOT device = "web"""").collect()
    val types = rows.map(_.getAs[String]("event_type")).toSeq
    assert(types.count(_ == "payment") == 3,
      s"null-filled rows must survive NOT like missing-field rows: ${types.toSeq}")
    assert(rows.count(_.getAs[String]("event_type") == "login") == 1) // mobile
  }

  test("NaN equals-everything matches only non-null cells (3VL under NOT)") {
    // 'amount' exists only on payment: * scope null-fills the login rows.
    // NaN compares Ordering::Equal to every VALUE in the reference, but a
    // NULL cell still compares FALSE — eqLike's old lit(true) matched the
    // null-filled rows too and wrongly dropped them under NOT (ADVICE r15).
    val eq = run("""QUERY * WHERE amount = "NaN"""").collect()
    assert(eq.length == 3 && eq.forall(_.getAs[String]("event_type") == "payment"),
      s"NaN-eq must match exactly the non-null payment rows: ${eq.toSeq}")
    val not = run("""QUERY * WHERE NOT amount = "NaN"""").collect()
    assert(not.length == 3 && not.forall(_.getAs[String]("event_type") == "login"),
      s"NOT NaN-eq must keep exactly the null-filled login rows: ${not.toSeq}")
  }

  test("fractional and oversized literals compare numerically against integral columns") {
    def amounts(cmd: String) =
      run(cmd).collect().map(_.getAs[Long]("amount")).sorted.toSeq
    // amount in {50, 75, 20}; 3.7-style literals used to TRUNCATE to long
    assert(amounts("QUERY payment WHERE amount = 50.5") == Seq())
    assert(amounts("QUERY payment WHERE amount >= 50.5") == Seq(75L))
    assert(amounts("QUERY payment WHERE amount > 19.5") == Seq(20L, 50L, 75L))
    // numeric STRING with a fraction: the reference's f64 rung, not
    // lexicographic ("20" > "19.5" lexicographically is false)
    assert(amounts("""QUERY payment WHERE amount > "19.5"""") == Seq(20L, 50L, 75L))
    // bool columns accept the reference's as_bool string set ("1"/"0")
    assert(run("""QUERY login WHERE ok = "1"""").count() == 2)
    assert(run("QUERY login WHERE ok = 1").count() == 2)
  }

  test("sequence over an unknown event type is empty, not an error") {
    assert(run("QUERY nosuch FOLLOWED BY payment LINKED BY context_id").count() == 0)
    assert(run("QUERY login FOLLOWED BY nosuch LINKED BY context_id").count() == 0)
  }

  test("LINKED BY a field missing from one side is empty, not an analysis error") {
    // 'amount' exists only on payment: login rows get a null link and drop,
    // so no group ever holds both sides
    assert(run("QUERY login FOLLOWED BY payment LINKED BY amount").count() == 0)
  }

  test("SINCE USING an unknown payload field is empty, not an analysis error") {
    assert(run("QUERY payment SINCE 100 USING no_such_field").count() == 0)
  }

  test("sequence LIMIT with OFFSET pages instead of repeating page one") {
    val all = run("QUERY login FOLLOWED BY payment LINKED BY context_id")
      .collect().map(_.toSeq).toSeq
    assert(all.size == 2) // u1: (100->150) and (200->250)
    val p1 = run("QUERY login FOLLOWED BY payment LINKED BY context_id LIMIT 1")
      .collect().map(_.toSeq).toSeq
    val p2 = run("QUERY login FOLLOWED BY payment LINKED BY context_id LIMIT 1 OFFSET 1")
      .collect().map(_.toSeq).toSeq
    assert(p1.size == 1 && p2.size == 1)
    assert(p1 != p2, s"page 2 repeated page 1: $p1")
    assert((p1 ++ p2).toSet == all.toSet)
  }
}
