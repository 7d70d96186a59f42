package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{EventStore, ExecResult}

/** Behavior parity with the reference's end-to-end scenario corpus
  * (`tests/integration/scenarios.json`, 256 scenarios — see FIXTURES.md for
  * the schema survey). These re-express the corpus' semantic checks against
  * our engine: store validation, flush boundaries, limit edges, projection
  * rules, enum case-sensitivity, time normalization, and sequence-link
  * variants. Commands are authored fresh against the documented grammar —
  * nothing is copied from the reference.
  */
class ScenarioParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def newStore(): EventStore = {
    val dir = Files.createTempDirectory("graft_scen_").toString
    var t = 1000L
    new EventStore(spark, dir, clock = () => { t += 1; t })
  }
  private def frame(r: ExecResult) = r match {
    case ExecResult.Frame(df) => df
    case other                => fail(s"expected frame, got $other")
  }
  private def err(r: ExecResult): String = r match {
    case ExecResult.Error(e, _) => e
    case other               => fail(s"expected error, got $other")
  }

  test("limit edges: LIMIT 0, LIMIT beyond total, OFFSET beyond total") {
    val s = newStore()
    s.execute("""DEFINE le FIELDS { status: "string" }""")
    (1 to 5).foreach(i => s.execute(s"""STORE le FOR c$i PAYLOAD {"status": "s$i"}"""))
    s.execute("FLUSH")
    assert(frame(s.execute("QUERY le LIMIT 0")).count() == 0)
    assert(frame(s.execute("QUERY le LIMIT 100")).count() == 5)
    assert(frame(s.execute("QUERY le LIMIT 10 OFFSET 99")).count() == 0)
    assert(frame(s.execute("QUERY le LIMIT 2 OFFSET 4")).count() == 1)
  }

  test("memtable vs segment boundary: query across FLUSH sees both") {
    val s = newStore()
    s.execute("""DEFINE cart FIELDS { sku: "string", qty: "int" }""")
    s.execute("""STORE cart FOR u1 PAYLOAD {"sku": "a", "qty": 1}""")
    s.execute("FLUSH")
    s.execute("""STORE cart FOR u1 PAYLOAD {"sku": "b", "qty": 2}""")
    val rows = frame(s.execute("QUERY cart FOR u1")).collect()
    assert(rows.map(_.getAs[String]("sku")).toSet == Set("a", "b"))
    // aggregation also spans the boundary
    assert(frame(s.execute("QUERY cart TOTAL qty")).head().getAs[Long]("total_qty") == 3L)
  }

  test("RETURN projection: empty list = all fields; unknown fields ignored; core always present") {
    val s = newStore()
    s.execute("""DEFINE product FIELDS { name: "string", price: "int", color: "string" }""")
    s.execute("""STORE product FOR c PAYLOAD {"name": "x", "price": 5, "color": "red"}""")
    val all = frame(s.execute("QUERY product RETURN []"))
    assert(all.columns.toSet == Set("context_id", "event_type", "timestamp", "name", "price", "color"))
    val some = frame(s.execute("QUERY product RETURN [price, nosuch]"))
    assert(some.columns.toSet == Set("context_id", "event_type", "timestamp", "price"))
  }

  test("enum: case-sensitive variants, neq filtering") {
    val s = newStore()
    s.execute("""DEFINE sub FIELDS { plan: ["pro", "basic"] }""")
    assert(err(s.execute("""STORE sub FOR u PAYLOAD {"plan": "PRO"}""")).contains("does not match expected type"))
    s.execute("""STORE sub FOR u1 PAYLOAD {"plan": "pro"}""")
    s.execute("""STORE sub FOR u2 PAYLOAD {"plan": "basic"}""")
    val rows = frame(s.execute("""QUERY sub WHERE plan != "pro"""")).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("plan") == "basic")
  }

  test("datetime payload: ISO equality and range in WHERE, epoch-ms normalization") {
    val s = newStore()
    s.execute("""DEFINE evt FIELDS { created_at: "datetime", id: "int" }""")
    s.execute("""STORE evt FOR c PAYLOAD {"created_at": "2024-01-15T00:00:00Z", "id": 1}""")
    s.execute("""STORE evt FOR c PAYLOAD {"created_at": 1705363200000, "id": 2}""") // 2024-01-16 in ms
    val eq = frame(s.execute("""QUERY evt WHERE created_at = "2024-01-15T00:00:00Z"""")).collect()
    assert(eq.map(_.getAs[Long]("id")).toSeq == Seq(1L))
    val range = frame(s.execute("""QUERY evt WHERE created_at > "2024-01-15T12:00:00Z"""")).collect()
    assert(range.map(_.getAs[Long]("id")).toSeq == Seq(2L))
    // date-only strings hit midnight UTC
    val eq2 = frame(s.execute("""QUERY evt WHERE created_at = "2024-01-16"""")).collect()
    assert(eq2.map(_.getAs[Long]("id")).toSeq == Seq(2L))
  }

  test("bool payloads: bare-field WHERE and explicit comparison") {
    val s = newStore()
    s.execute("""DEFINE review FIELDS { rating: "int", verified: "bool" }""")
    s.execute("""STORE review FOR a PAYLOAD {"rating": 5, "verified": true}""")
    s.execute("""STORE review FOR b PAYLOAD {"rating": 2, "verified": false}""")
    assert(frame(s.execute("QUERY review WHERE verified")).count() == 1)
    assert(frame(s.execute("QUERY review WHERE verified = false")).count() == 1)
    assert(frame(s.execute("QUERY review WHERE NOT verified")).count() == 1)
  }

  test("sequence LINKED BY payload field with per-type WHERE prefixes") {
    val s = newStore()
    s.execute("""DEFINE order_created FIELDS { order_id: "int", status: "string" }""")
    s.execute("""DEFINE order_cancelled FIELDS { order_id: "int", reason: "string" }""")
    s.execute("""STORE order_created FOR u1 PAYLOAD {"order_id": 1, "status": "new"}""")
    s.execute("""STORE order_created FOR u1 PAYLOAD {"order_id": 2, "status": "new"}""")
    s.execute("""STORE order_cancelled FOR u1 PAYLOAD {"order_id": 1, "reason": "oops"}""")
    s.execute("FLUSH")
    val rows = frame(s.execute(
      "QUERY order_created FOLLOWED BY order_cancelled LINKED BY order_id")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("link_value") == "1")
    // prefixed WHERE restricts the cancel side only
    val none = frame(s.execute(
      """QUERY order_created FOLLOWED BY order_cancelled LINKED BY order_id WHERE order_cancelled.reason = "other"""")).collect()
    assert(none.isEmpty)
  }

  test("PRECEDED BY is strictly earlier (equal timestamps do not match)") {
    import spark.implicits._
    import graft.engine.{EventSource, QueryCompiler}
    import graft.ast.QueryCmd
    import org.apache.spark.sql.DataFrame
    val src = new EventSource {
      def eventTypes = Seq("a", "b")
      def frame(t: String): DataFrame = t match {
        case "a" => Seq(("u", "a", 100L, 1L)).toDF("context_id", "event_type", "timestamp", "event_id")
        case "b" => Seq(("u", "b", 100L, 2L)).toDF("context_id", "event_type", "timestamp", "event_id")
      }
    }
    val preceded = QueryCompiler.compile(
      graft.parser.CommandParser.parse("QUERY a PRECEDED BY b LINKED BY context_id").asInstanceOf[QueryCmd], src)
    assert(preceded.count() == 0) // ts_b must be < ts_a
    val followed = QueryCompiler.compile(
      graft.parser.CommandParser.parse("QUERY a FOLLOWED BY b LINKED BY context_id").asInstanceOf[QueryCmd], src)
    assert(followed.count() == 1) // ts_b >= ts_a matches
  }

  test("numeric strings compare numerically against numeric columns") {
    val s = newStore()
    s.execute("""DEFINE m FIELDS { v: "int" }""")
    s.execute("""STORE m FOR c PAYLOAD {"v": 10}""")
    s.execute("""STORE m FOR c PAYLOAD {"v": 9}""")
    // "9" as a quoted string against an int column → numeric comparison
    val rows = frame(s.execute("""QUERY m WHERE v > "9"""")).collect()
    assert(rows.map(_.getAs[Long]("v")).toSeq == Seq(10L))
  }

  test("multiple aggregations in one query with group limit determinism") {
    val s = newStore()
    s.execute("""DEFINE o FIELDS { amount: "int", country: "string" }""")
    Seq(("NL", 10), ("NL", 20), ("BE", 5), ("DE", 7), ("DE", 1)).zipWithIndex.foreach {
      case ((ctry, amt), i) =>
        s.execute(s"""STORE o FOR u$i PAYLOAD {"amount": $amt, "country": "$ctry"}""")
    }
    val rows = frame(s.execute(
      "QUERY o COUNT, TOTAL amount, AVG amount, MIN amount, MAX amount BY country ORDER BY total_amount DESC LIMIT 2")).collect()
    assert(rows.map(_.getAs[String]("country")).toSeq == Seq("NL", "DE"))
    assert(rows.head.getAs[Long]("total_amount") == 30L)
    assert(rows.head.getAs[Double]("avg_amount") == 15.0)
  }

  test("store validation errors: unknown type, type mismatch, missing/extra fields, bad time") {
    val s = newStore()
    s.execute("""DEFINE ord FIELDS { order_id: "int", created_at: "datetime" }""")
    assert(err(s.execute("""STORE nosuch FOR c PAYLOAD {"x": 1}""")).contains("No schema defined"))
    assert(err(s.execute("""STORE ord FOR c PAYLOAD {"order_id": "a string", "created_at": "2025-01-01T00:00:00Z"}"""))
      .contains("order_id"))
    assert(err(s.execute("""STORE ord FOR c PAYLOAD {"order_id": 1}""")).contains("created_at"))
    assert(err(s.execute("""STORE ord FOR c PAYLOAD {"order_id": 1, "created_at": "2025-01-01T00:00:00Z", "zz": 2}"""))
      .contains("zz"))
    assert(err(s.execute("""STORE ord FOR c PAYLOAD {"order_id": 1, "created_at": "not-a-time"}"""))
      .contains("Invalid time string"))
  }

  test("optional field: present and absent rows both store and match") {
    val s = newStore()
    s.execute("""DEFINE oc FIELDS { order_id: "int", note: "string | null" }""")
    s.execute("""STORE oc FOR c1 PAYLOAD {"order_id": 123, "note": "hi"}""")
    s.execute("""STORE oc FOR c1 PAYLOAD {"order_id": 124}""")
    val rows = frame(s.execute("""QUERY oc WHERE order_id > 0""")).collect()
    assert(rows.map(_.getAs[Long]("order_id")).toSet == Set(123L, 124L))
    assert(rows.find(_.getAs[Long]("order_id") == 124L).get.isNullAt(rows.head.fieldIndex("note")))
  }

  test("unparsable SINCE is ignored (includes all rows), reference scenario parity") {
    val s = newStore()
    s.execute("""DEFINE eb FIELDS { id: "int", created_at: "datetime" }""")
    s.execute("""STORE eb FOR c PAYLOAD {"id": 1, "created_at": "2025-01-01T00:00:01Z"}""")
    s.execute("""STORE eb FOR c PAYLOAD {"id": 2, "created_at": "2025-01-02T00:00:00Z"}""")
    s.execute("FLUSH")
    assert(frame(s.execute("""QUERY eb FOR c SINCE "bogus" USING created_at""")).count() == 2)
  }

  test("SINCE on optional datetime skips null values") {
    val s = newStore()
    s.execute("""DEFINE eo FIELDS { id: "int", created_at: "datetime | null" }""")
    s.execute("""STORE eo FOR c PAYLOAD {"id": 1, "created_at": null}""")
    s.execute("""STORE eo FOR c PAYLOAD {"id": 2, "created_at": "2025-01-02T00:00:00Z"}""")
    val rows = frame(s.execute("""QUERY eo FOR c SINCE "2025-01-01T00:00:00Z" USING created_at""")).collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(2L))
  }

  test("unparsable literal against a typed column falls back to string compare (0 rows, no error)") {
    val s = newStore()
    s.execute("""DEFINE eq FIELDS { id: "int", created_at: "datetime" }""")
    s.execute("""STORE eq FOR c PAYLOAD {"id": 1, "created_at": "2025-01-01T00:00:00Z"}""")
    assert(frame(s.execute("""QUERY eq WHERE created_at = "not-a-time"""")).count() == 0)
    assert(frame(s.execute("""QUERY eq WHERE id = "not-a-number"""")).count() == 0)
  }

  test("OFFSET without LIMIT is rejected") {
    val s = newStore()
    s.execute("""DEFINE ol FIELDS { v: "int" }""")
    s.execute("""STORE ol FOR a PAYLOAD {"v": 1}""")
    assert(err(s.execute("QUERY ol ORDER BY v ASC OFFSET 1")).contains("OFFSET requires LIMIT"))
  }

  test("date field equals full-ISO midnight timestamp") {
    val s = newStore()
    s.execute("""DEFINE pq FIELDS { id: "int", on: "date" }""")
    s.execute("""STORE pq FOR pa PAYLOAD {"id": 1, "on": "2025-09-06"}""")
    s.execute("""STORE pq FOR pb PAYLOAD {"id": 2, "on": "2025-09-07"}""")
    val rows = frame(s.execute("""QUERY pq WHERE on = "2025-09-06T00:00:00Z"""")).collect()
    assert(rows.map(_.getAs[String]("context_id")).toSeq == Seq("pa"))
  }

  test("IN with negative numbers; double negation normalizes") {
    val s = newStore()
    s.execute("""DEFINE ng FIELDS { id: "int" }""")
    Seq(-5, -3, 0, 2).zipWithIndex.foreach { case (v, i) =>
      s.execute(s"""STORE ng FOR n$i PAYLOAD {"id": $v}""")
    }
    val in = frame(s.execute("QUERY ng WHERE id IN (-3, -1, 0, 2)")).collect()
    assert(in.map(_.getAs[Long]("id")).toSet == Set(-3L, 0L, 2L))
    val dn = frame(s.execute("QUERY ng WHERE NOT NOT id = 0")).collect()
    assert(dn.map(_.getAs[Long]("id")).toSeq == Seq(0L))
  }

  test("sequence LIMIT caps matched pairs deterministically (first link values kept)") {
    val s = newStore()
    s.execute("""DEFINE pv FIELDS { page: "string", user_id: "string" }""")
    s.execute("""DEFINE oc FIELDS { order_id: "int", user_id: "string" }""")
    (1 to 3).foreach { u =>
      s.execute(s"""STORE pv FOR u$u PAYLOAD {"page": "/checkout", "user_id": "u$u"}""")
      s.execute(s"""STORE oc FOR u$u PAYLOAD {"order_id": $u, "user_id": "u$u"}""")
    }
    val rows = frame(s.execute(
      """QUERY pv FOLLOWED BY oc LINKED BY user_id WHERE pv.page = "/checkout" LIMIT 2""")).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("link_value")).toSeq == Seq("u1", "u2"))
  }

  test("FOLLOWED BY matches equal timestamps (>=) under USING TIME") {
    val s = newStore()
    s.execute("""DEFINE a2 FIELDS { user_id: "string", created_at: "datetime" }""")
    s.execute("""DEFINE b2 FIELDS { user_id: "string", created_at: "datetime" }""")
    s.execute("""STORE a2 FOR u1 PAYLOAD {"user_id": "u1", "created_at": "2025-01-01T10:00:00Z"}""")
    s.execute("""STORE b2 FOR u1 PAYLOAD {"user_id": "u1", "created_at": "2025-01-01T10:00:00Z"}""")
    assert(frame(s.execute("QUERY a2 FOLLOWED BY b2 LINKED BY user_id USING TIME created_at")).count() == 1)
  }

  test("replay of a nonexistent context is empty, not an error; unparsable replay SINCE ignored") {
    val s = newStore()
    s.execute("""DEFINE rp FIELDS { id: "int", created_at: "datetime" }""")
    s.execute("""STORE rp FOR c PAYLOAD {"id": 1, "created_at": "2025-01-01T00:00:00Z"}""")
    assert(frame(s.execute("REPLAY FOR ghost-user")).count() == 0)
    assert(frame(s.execute("""REPLAY rp FOR c SINCE "bogus" USING created_at""")).count() == 1)
  }

  test("REMEMBER duplicate name errors; SHOW of unknown materialization errors") {
    val s = newStore()
    s.execute("""DEFINE td FIELDS { id: "int" }""")
    s.execute("""STORE td FOR t1 PAYLOAD {"id": 1}""")
    s.execute("REMEMBER QUERY td AS dup_test")
    assert(err(s.execute("REMEMBER QUERY td AS dup_test")).contains("already exists"))
    assert(err(s.execute("SHOW nonexistent_mat")).toLowerCase.contains("not found"))
  }

  test("wildcard replay interleaves event types in append order") {
    val s = newStore()
    s.execute("""DEFINE login FIELDS { device: "string" }""")
    s.execute("""DEFINE logout FIELDS { device: "string" }""")
    s.execute("""STORE login FOR u PAYLOAD {"device": "a"}""")
    s.execute("""STORE logout FOR u PAYLOAD {"device": "a"}""")
    s.execute("""STORE login FOR u PAYLOAD {"device": "b"}""")
    val rows = frame(s.execute("REPLAY FOR u LIMIT 10")).collect()
    assert(rows.map(_.getAs[String]("event_type")).toSeq == Seq("login", "logout", "login"))
  }
}
