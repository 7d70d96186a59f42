package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import Proto.{assertExcludes, assertIncludes}

/** Protocol-level behavior parity with the reference's core scenario corpus
  * tranches: `since_*` (12), `store_*` (10), `created_at_*`/`date_*` (6),
  * `enum_*`/`ebm_*` (6), `order_*` (3), `streaming_*` (4), `bucket_*` (4),
  * `wal_*` (8 of 9 — the fsync-buffering data-loss case maps to
  * wal-disabled), `simple_*`/`multi_*`/`segment_*`/`projection_*` (5).
  * Fixtures are authored fresh; covered scenario ids are listed per test.
  */
class CoreScenariosSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private def open() = new Proto(spark, authEnabled = false)

  // ---- shadowed core names (DIVERGENCES.md #6, resolved r6) ----

  test("payload fields may shadow core names; reads resolve core-first") {
    val p = open()
    p.send("""DEFINE shdw FIELDS { "timestamp": "int", "event_id": "int", "tag": "string" }""")
    p.send("""STORE shdw FOR sh1 PAYLOAD {"timestamp":1000,"event_id":7,"tag":"a"}""")
    p.sleep(5000)
    p.send("""STORE shdw FOR sh2 PAYLOAD {"timestamp":2000,"event_id":8,"tag":"b"}""")
    p.send("FLUSH")
    // the payload values are stored and rendered under their declared names
    val all = p.send("QUERY shdw")
    assertIncludes(all, "\"timestamp\"", "\"event_id\"", "1000", "2000", "\"row_count\":2")
    assertExcludes(all, "p$")
    // WHERE timestamp resolves to the CORE (ingest-clock) column, exactly
    // like the reference's get_field_scalar — payload 1000/2000 would match
    // nothing against a > 1500s boundary if it shadowed the other way.
    // (ORDER BY pins row order — unordered results surface either row
    // first, and t0 must be sh1's core ts, the smaller one.)
    val ordered = p.send("QUERY shdw ORDER BY timestamp")
    val t0 = ordered.split("\"rows\":\\[\\[")(1).split(",")(2) // core ts of first row
    val later = p.send(s"QUERY shdw WHERE timestamp > ${t0.trim.toLong + 1}")
    assertIncludes(later, "sh2", "\"row_count\":1")
    assertExcludes(later.split("\"row_count\"")(0), "sh1")
    // RETURN with a shadowed name projects the payload field — the schema
    // frame carries "timestamp" twice (core + payload under its declared name)
    val ret = p.send("""QUERY shdw RETURN [timestamp]""")
    assertIncludes(ret, "1000", "2000")
    def tsCols(out: String): Int = {
      val cols = out.split("\"columns\":\\[")(1).split("\\]")(0)
      cols.sliding("\"timestamp\"".length).count(_ == "\"timestamp\"")
    }
    assert(tsCols(ret) == 2, s"core + shadowed payload column expected:\n$ret")
    // the INTERNAL p$ spelling is not addressable from the query surface
    // (same fence DEFINE enforces) — unknown field, ignored; only the core
    // timestamp column remains. (No value-substring exclusion here: the
    // core wall-clock ts can contain any digit run.)
    val spoof = p.send("""QUERY shdw RETURN [p$timestamp, tag]""")
    assertIncludes(spoof, "\"tag\"")
    assertExcludes(spoof, "p$")
    assert(tsCols(spoof) == 1, s"only the core timestamp column expected:\n$spoof")
  }

  test("sequence queries resolve shadowed RETURN names and render them clean") {
    val p = open()
    p.send("""DEFINE sq_a FIELDS { "timestamp": "int", "v": "int" }""")
    p.send("""DEFINE sq_b FIELDS { "w": "int" }""")
    p.send("""STORE sq_a FOR u1 PAYLOAD {"timestamp": 111, "v": 5}""")
    p.sleep(3000)
    p.send("""STORE sq_b FOR u1 PAYLOAD {"w": 6}""")
    p.send("FLUSH")
    // RETURN with the shadowed declared name: projected (maps to p$) and
    // rendered under the DECLARED name with the step prefix — no p$ leak
    val ret = p.send("QUERY sq_a FOLLOWED BY sq_b RETURN [sq_a.timestamp, sq_b.w]")
    assertIncludes(ret, "\"sq_a_timestamp\"", "111", "\"sq_b_w\"", "\"row_count\":1")
    assertExcludes(ret, "p$")
    // RETURN omitted = all payload fields; the shadowed one still renders
    // under its declared name
    val all2 = p.send("QUERY sq_a FOLLOWED BY sq_b")
    assertIncludes(all2, "\"sq_a_timestamp\"", "\"sq_a_v\"", "\"sq_b_w\"")
    assertExcludes(all2, "p$")
    // LIMIT forces the deterministic orderBy: with the duplicate
    // '<prefix>_timestamp' columns in the schema, a name-based orderBy
    // threw an ambiguous-reference AnalysisException — ordering must
    // resolve by POSITION (SequenceCompiler renames to unique internal
    // names around the sort)
    val lim = p.send("QUERY sq_a FOLLOWED BY sq_b RETURN [sq_a.timestamp, sq_b.w] LIMIT 5")
    assertIncludes(lim, "\"sq_a_timestamp\"", "111", "\"sq_b_w\"", "\"row_count\":1")
    assertExcludes(lim, "p$", "AnalysisException", "ambiguous")
    val limAll = p.send("QUERY sq_a FOLLOWED BY sq_b LIMIT 5")
    assertIncludes(limAll, "\"sq_a_timestamp\"", "\"sq_a_v\"", "\"sq_b_w\"", "\"row_count\":1")
    assertExcludes(limAll, "p$", "ambiguous")
  }

  // ---- since_* ----

  // since_using_created_at_equal_boundary_included, _iso8601_selection
  test("SINCE boundary is inclusive on the USING field") {
    val p = open()
    p.send("""DEFINE visits FIELDS { n: "int", seen_at: "datetime" }""")
    p.send("""STORE visits FOR va PAYLOAD {"n":1,"seen_at":"2024-12-31T23:59:59Z"}""")
    p.send("""STORE visits FOR vb PAYLOAD {"n":2,"seen_at":"2025-01-01T00:00:00Z"}""")
    p.send("FLUSH")
    val out = p.send("""QUERY visits SINCE "2025-01-01T00:00:00Z" USING seen_at""")
    assertIncludes(out, "vb", "\"row_count\":1")
    assertExcludes(out.split("\"row_count\"")(0), "va")
  }

  // since_using_created_at_ms_input, _ns_input_excludes_first,
  // _us_input_inclusive, _numeric_units_selection
  test("SINCE numeric inputs: seconds, ms, us, ns unit inference") {
    val p = open()
    p.send("""DEFINE beats FIELDS { n: "int", at: "datetime" }""")
    p.send("""STORE beats FOR bea1 PAYLOAD {"n":1,"at":"2025-01-01T00:00:00Z"}""")
    p.send("""STORE beats FOR bea2 PAYLOAD {"n":2,"at":"2025-01-01T00:00:01Z"}""")
    p.send("FLUSH")
    // ms at the boundary: both included
    val ms = p.send("""QUERY beats SINCE "1735689600000" USING at""")
    assertIncludes(ms, "bea1", "bea2", "\"row_count\":2")
    // ns one second later: first excluded
    val ns = p.send("""QUERY beats SINCE "1735689601000000000" USING at""")
    assertIncludes(ns, "bea2", "\"row_count\":1")
    assertExcludes(ns.split("\"row_count\"")(0), "bea1")
    // us at the boundary is inclusive of the equal event
    val us = p.send("""QUERY beats SINCE "1735689600000000" USING at""")
    assertIncludes(us, "bea1", "\"row_count\":2")
    // bare seconds accepted
    val p2 = open()
    p2.send("""DEFINE pulses FIELDS { n: "int", at: "datetime" }""")
    p2.send("""STORE pulses FOR pa PAYLOAD {"n":1,"at":1600000000000}""")
    p2.send("""STORE pulses FOR pb PAYLOAD {"n":2,"at":1600000100000}""")
    p2.send("FLUSH")
    assertIncludes(p2.send("""QUERY pulses SINCE "1600000000" USING at"""),
      "pa", "pb", "\"row_count\":2")
  }

  // since_using_created_at_with_offset, _minus_offset_boundary,
  // created_at_tz_plus00_equivalent_to_z
  test("SINCE and equality respect timezone offsets in stored values") {
    val p = open()
    p.send("""DEFINE spans FIELDS { n: "int", at: "datetime" }""")
    // +02:00: 01:59:59+02 = 23:59:59Z prior day; 02:00:01+02 = 00:00:01Z
    p.send("""STORE spans FOR s1 PAYLOAD {"n":1,"at":"2025-01-01T01:59:59+02:00"}""")
    p.send("""STORE spans FOR s2 PAYLOAD {"n":2,"at":"2025-01-01T02:00:01+02:00"}""")
    // -05:00: 18:59:59-05 = 23:59:59Z; 19:00:00-05 = 00:00:00Z
    p.send("""STORE spans FOR s3 PAYLOAD {"n":3,"at":"2024-12-31T18:59:59-05:00"}""")
    p.send("""STORE spans FOR s4 PAYLOAD {"n":4,"at":"2024-12-31T19:00:00-05:00"}""")
    p.send("FLUSH")
    val out = p.send("""QUERY spans SINCE "2025-01-01T00:00:00Z" USING at""")
    assertIncludes(out, "s2", "s4", "\"row_count\":2")
    assertExcludes(out.split("\"row_count\"")(0), "s1\"", "s3\"")
    // +00:00 stores identically to Z
    p.send("""DEFINE zeq FIELDS { n: "int", at: "datetime" }""")
    p.send("""STORE zeq FOR z1 PAYLOAD {"n":1,"at":"2025-01-01T00:00:00+00:00"}""")
    assertIncludes(p.send("""QUERY zeq WHERE at = "2025-01-01T00:00:00Z""""), "z1")
  }

  // since_using_date_field, since_on_date_field_and_where_on_datetime
  test("SINCE over a date field; mixed date SINCE with datetime WHERE") {
    val p = open()
    p.send("""DEFINE stamps FIELDS { n: "int", on: "date" }""")
    p.send("""STORE stamps FOR d1 PAYLOAD {"n":1,"on":"2025-09-06"}""")
    p.send("""STORE stamps FOR d2 PAYLOAD {"n":2,"on":"2025-09-07"}""")
    p.send("FLUSH")
    val out = p.send("""QUERY stamps SINCE "2025-09-07T00:00:00Z" USING on""")
    assertIncludes(out, "d2", "\"row_count\":1")
    assertExcludes(out.split("\"row_count\"")(0), "d1\"")

    p.send("""DEFINE mixed FIELDS { n: "int", on: "date", at: "datetime" }""")
    p.send("""STORE mixed FOR m1 PAYLOAD {"n":1,"on":"2025-01-01","at":"2025-01-01T00:00:00Z"}""")
    p.send("""STORE mixed FOR m2 PAYLOAD {"n":2,"on":"2025-01-02","at":"2025-01-02T00:00:01Z"}""")
    p.send("FLUSH")
    assertIncludes(
      p.send("""QUERY mixed SINCE "2025-01-02T00:00:00Z" USING on WHERE at = "2025-01-02T00:00:01Z""""),
      "m2")
  }

  // since_unparsable_ignored_includes_all, since_using_optional_datetime_skips_nulls
  test("unparsable SINCE ignored; optional datetime nulls skipped") {
    val p = open()
    p.send("""DEFINE opts FIELDS { n: "int", at: "datetime | null" }""")
    p.send("""STORE opts FOR oa PAYLOAD {"n":1,"at":null}""")
    p.send("""STORE opts FOR ob PAYLOAD {"n":2,"at":"2025-01-02T00:00:00Z"}""")
    p.send("FLUSH")
    val bog = p.send("""QUERY opts SINCE "gibberish" USING at""")
    assertIncludes(bog, "oa", "ob", "\"row_count\":2") // unparsable SINCE includes everything
    val strict = p.send("""QUERY opts SINCE "2025-01-01T00:00:00Z" USING at""")
    assertIncludes(strict, "ob", "\"row_count\":1")
    assertExcludes(strict.split("\"row_count\"")(0), "oa")
  }

  // ---- store_* / created_at_* ----

  // store_without_definition, store_with_invalid_payload, store_with_missing_field,
  // store_with_invalid_field_type, store_invalid_time_string_rejected,
  // store_with_invalid_enum_value, enum_store_wrong_case_rejected
  test("store validation errors use reference messages") {
    val p = open()
    assertIncludes(p.send("""STORE ghosts FOR c PAYLOAD {"x":1}"""),
      "No schema defined")
    p.send("""DEFINE parcels FIELDS { weight: "int", label: "string" }""")
    assertIncludes(p.send("""STORE parcels FOR c PAYLOAD {"weight":"heavy","label":"a"}"""),
      "Field 'weight' does not match expected type")
    assertIncludes(p.send("""STORE parcels FOR c PAYLOAD {"weight":1}"""),
      "Missing field 'label' in payload")
    assertIncludes(p.send("""STORE parcels FOR c PAYLOAD {"weight":1,"label":"a","rogue":2}"""),
      "Payload contains fields not defined in schema: rogue")
    p.send("""DEFINE clocks FIELDS { at: "datetime" }""")
    assertIncludes(p.send("""STORE clocks FOR c PAYLOAD {"at":"yesterday-ish"}"""),
      "Invalid time string")
    p.send("""DEFINE tiers FIELDS { tier: ["gold", "silver"] }""")
    assertIncludes(p.send("""STORE tiers FOR c PAYLOAD {"tier":"bronze"}"""),
      "does not match expected type")
    assertIncludes(p.send("""STORE tiers FOR c PAYLOAD {"tier":"Gold"}"""),
      "does not match expected type") // enum variants are case-sensitive
  }

  // store_and_query_enum_eq, store_and_query_enum_neq,
  // enum_query_wrong_case_returns_no_results, store_with_optional_field_present
  test("enum store/query: eq, neq, wrong-case finds nothing; optional fields") {
    val p = open()
    p.send("""DEFINE plans FIELDS { plan: ["pro", "basic"] }""")
    p.send("""STORE plans FOR m1 PAYLOAD {"plan":"pro"}""")
    p.send("""STORE plans FOR m2 PAYLOAD {"plan":"basic"}""")
    val eq = p.send("""QUERY plans WHERE plan = "pro"""")
    assertIncludes(eq, "m1"); assertExcludes(eq, "m2")
    val neq = p.send("""QUERY plans WHERE plan != "basic"""")
    assertIncludes(neq, "m1")
    assert(!neq.split("\"row_count\"")(0).contains("m2"))
    assertIncludes(p.send("""QUERY plans WHERE plan = "Pro""""), "\"row_count\":0")

    p.send("""DEFINE notes FIELDS { n: "int", memo: "string | null" }""")
    p.send("""STORE notes FOR c PAYLOAD {"n":123,"memo":"present"}""")
    p.send("""STORE notes FOR c PAYLOAD {"n":124}""")
    assertIncludes(p.send("QUERY notes WHERE n > 0"), "123", "124")
  }

  // ebm_eq_logs_pruning, ebm_neq_logs_pruning, ebm_unknown_variant_no_results,
  // ebm_eq_across_two_zones
  test("enum pruning semantics: OR of variants, negation, unknown variant, across segments") {
    val p = open()
    p.send("""DEFINE subs FIELDS { plan: ["free", "pro", "premium", "enterprise"] }""")
    val plans = Seq("free", "pro", "premium", "enterprise", "pro", "free", "pro", "premium", "pro")
    plans.zipWithIndex.foreach { case (pl, i) =>
      p.send(s"""STORE subs FOR cx${i + 1} PAYLOAD {"plan":"$pl"}""")
      if (i == 3) p.send("FLUSH") // split across a segment boundary
    }
    p.send("FLUSH")
    val or = p.send("""QUERY subs WHERE plan = "pro" OR plan = "premium"""")
    assertIncludes(or, "cx2", "cx3", "cx5", "cx7", "cx8", "cx9")
    assertExcludes(or.split("\"row_count\"")(0), "cx1\"", "cx4\"", "cx6\"")
    val neq = p.send("""QUERY subs WHERE plan != "pro"""")
    assertIncludes(neq, "cx1", "cx3", "cx4", "cx6", "cx8")
    assertIncludes(p.send("""QUERY subs WHERE plan = "unknown""""), "\"row_count\":0")
  }

  // created_at_between_inclusive_and_exclusive, created_at_seconds_range,
  // created_at_less_than_boundary_excludes_equal, created_at_or_two_values,
  // date_field_leap_day_eq
  test("datetime range semantics: half-open intervals, strict less-than, OR, leap day") {
    val p = open()
    p.send("""DEFINE marks FIELDS { n: "int", at: "datetime" }""")
    p.send("""STORE marks FOR ra PAYLOAD {"n":1,"at":"2025-01-01T00:00:00Z"}""")
    p.send("""STORE marks FOR rb PAYLOAD {"n":2,"at":"2025-01-01T00:00:01Z"}""")
    p.send("FLUSH")
    val lo = p.send("""QUERY marks WHERE at >= "2025-01-01T00:00:00Z" AND at < "2025-01-01T00:00:01Z"""")
    assertIncludes(lo, "ra"); assertExcludes(lo.split("\"row_count\"")(0), "rb")
    val hi = p.send("""QUERY marks WHERE at > "2025-01-01T00:00:00Z" AND at <= "2025-01-01T00:00:01Z"""")
    assertIncludes(hi, "rb"); assertExcludes(hi.split("\"row_count\"")(0), "ra")
    val lt = p.send("""QUERY marks WHERE at < "2025-01-01T00:00:01Z"""")
    assertIncludes(lt, "ra"); assertExcludes(lt.split("\"row_count\"")(0), "rb")
    assertIncludes(
      p.send("""QUERY marks WHERE at = "2025-01-01T00:00:00Z" OR at = "2025-01-01T00:00:01Z""""),
      "ra", "rb")

    p.send("""DEFINE leaps FIELDS { n: "int", on: "date" }""")
    p.send("""STORE leaps FOR lp PAYLOAD {"n":1,"on":"2024-02-29"}""")
    assertIncludes(p.send("""QUERY leaps WHERE on = "2024-02-29T00:00:00Z""""), "lp")
  }

  // store_created_at_ms_number_normalized
  test("numeric ms datetime payloads normalize to epoch seconds") {
    val p = open()
    p.send("""DEFINE ticks FIELDS { n: "int", at: "datetime" }""")
    p.send("""STORE ticks FOR t1 PAYLOAD {"n":1,"at":1735689600000}""")
    p.send("""STORE ticks FOR t2 PAYLOAD {"n":2,"at":1735689601000}""")
    p.send("FLUSH")
    assertIncludes(p.send("""QUERY ticks SINCE "2025-01-01T00:00:00Z" USING at"""),
      "t1", "t2", "\"row_count\":2")
  }

  // ---- simple_* / multi_* / segment_* / projection_* ----

  // simple_query_status_confirmed, simple_query_with_mixed_commands,
  // multi_context_query, segment_memory_hybrid_query
  test("basic query shapes; keywords are case-insensitive; memtable+segment hybrid") {
    val p = open()
    p.send("""define receipts FIELDS { n: "int", state: "string" }""")
    p.send("""Store receipts FoR ca PAYLOAD {"n":123,"state":"confirmed"}""")
    p.send("""STORe receipts For cb PAYLOAD {"n":124,"state":"pending"}""")
    val q = p.send("""query receipts WHERE state = "confirmed"""")
    assertIncludes(q, "123"); assertExcludes(q.split("\"row_count\"")(0), "124")

    p.send("""DEFINE taps2 FIELDS { device: "string" }""")
    Seq("da" -> "android", "db" -> "android", "dc" -> "web", "dd" -> "android").foreach {
      case (c, d) => p.send(s"""STORE taps2 FOR $c PAYLOAD {"device":"$d"}""")
    }
    val mc = p.send("""QUERY taps2 WHERE device = "android"""")
    assertIncludes(mc, "da", "db", "dd")
    assertExcludes(mc.split("\"row_count\"")(0), "\"dc\"")

    // hybrid: some rows flushed to segments, some still in the memtable
    p.send("""DEFINE hybrid FIELDS { n: "int", state: "string" }""")
    (1 to 4).foreach(i => p.send(s"""STORE hybrid FOR h$i PAYLOAD {"n":$i,"state":"confirmed"}"""))
    p.send("FLUSH")
    (5 to 7).foreach(i => p.send(
      s"""STORE hybrid FOR h$i PAYLOAD {"n":$i,"state":"${if (i <= 6) "pending" else "confirmed"}"}"""))
    val hy = p.send("""QUERY hybrid WHERE state = "confirmed"""")
    assertIncludes(hy, "h1", "h2", "h3", "h4", "h7")
    assertExcludes(hy.split("\"row_count\"")(0), "\"h5\"", "\"h6\"")
  }

  // projection_excludes_unreferenced_payload_field,
  // replay_projection_excludes_unreferenced_payload_field
  test("RETURN projection drops unreferenced payload fields from the wire") {
    val p = open()
    p.send("""DEFINE goods FIELDS { name: "string", price: "int", color: "string" }""")
    p.send("""STORE goods FOR g1 PAYLOAD {"name":"Desk","price":25,"color":"red"}""")
    p.send("""STORE goods FOR g1 PAYLOAD {"name":"Chair","price":50,"color":"blue"}""")
    p.send("FLUSH")
    val q = p.send("QUERY goods RETURN [name] WHERE price > 10")
    assertIncludes(q, "Desk", "Chair", "\"type\":\"schema\"", "\"type\":\"batch\"",
      "\"type\":\"end\"", "\"row_count\":2")
    assertExcludes(q, "color", "price", "red", "blue")
    val r = p.send("REPLAY goods FOR g1 RETURN [name]")
    assertIncludes(r, "Desk", "Chair", "\"row_count\":2")
    assertExcludes(r, "color", "red")
  }

  // ---- order_* ----

  // order_by_with_lt_small_limit, order_by_desc_with_gt_bound, order_by_asc_frontier_min
  test("ORDER BY with bounds and LIMIT keeps the right frontier") {
    val p = open()
    p.send("""DEFINE ranks FIELDS { score: "int" }""")
    Seq("qa" -> 0, "qb" -> 1, "qc" -> 2).foreach { case (c, v) =>
      p.send(s"""STORE ranks FOR $c PAYLOAD {"score":$v}""")
    }
    p.send("FLUSH")
    val asc = p.send("QUERY ranks WHERE score < 10 ORDER BY score ASC LIMIT 2")
    assertIncludes(asc, ",0]", ",1]")
    assertExcludes(asc.split("\"row_count\"")(0), ",2]")

    p.send("""DEFINE gains FIELDS { v: "int" }""")
    Seq("g1" -> 100, "g2" -> 200, "g3" -> 300).foreach { case (c, v) =>
      p.send(s"""STORE gains FOR $c PAYLOAD {"v":$v}""")
    }
    p.send("FLUSH")
    val desc = p.send("QUERY gains WHERE v > 150 ORDER BY v DESC LIMIT 2")
    assertIncludes(desc, ",300]", ",200]")
    assertExcludes(desc.split("\"row_count\"")(0), ",100]")

    p.send("""DEFINE peaks FIELDS { score: "int" }""")
    Seq("x1" -> 100000, "x2" -> 200000, "x3" -> 300000).foreach { case (c, v) =>
      p.send(s"""STORE peaks FOR $c PAYLOAD {"score":$v}""")
    }
    p.send("FLUSH")
    assertIncludes(p.send("QUERY peaks ORDER BY score ASC LIMIT 1"), "\"x1\",")
  }

  // ---- streaming_* ----

  // streaming_memtable_basic, streaming_segment_and_memtable
  test("streamed reads see memtable rows and segment+memtable unions") {
    val p = open()
    p.send("""DEFINE live FIELDS { value: "int" }""")
    p.send("""STORE live FOR mem-1 PAYLOAD {"value":1}""")
    p.send("""STORE live FOR mem-2 PAYLOAD {"value":2}""")
    val basic = p.send("QUERY live WHERE value >= 0")
    assertIncludes(basic, "mem-1", "mem-2", "\"type\":\"end\"")

    p.send("""DEFINE mix FIELDS { value: "int" }""")
    p.send("""STORE mix FOR seg-ctx PAYLOAD {"value":1}""")
    p.send("""STORE mix FOR seg-ctx2 PAYLOAD {"value":2}""")
    p.send("FLUSH")
    p.send("""STORE mix FOR mem-ctx PAYLOAD {"value":3}""")
    assertIncludes(p.send("QUERY mix WHERE value >= 0"), "seg-ctx", "seg-ctx2", "mem-ctx")
  }

  // streaming_limit_offset (OFFSET before LIMIT in the grammar),
  // streaming_order_by_limit (ordering across segment + memtable)
  test("OFFSET/LIMIT paginate the stream deterministically; order spans storage tiers") {
    val p = open()
    p.send("""DEFINE pages FIELDS { value: "int" }""")
    (1 to 4).foreach(i => p.send(s"""STORE pages FOR pg-$i PAYLOAD {"value":${i * 10}}"""))
    val out = p.send("QUERY pages WHERE value >= 0 OFFSET 1 LIMIT 2")
    assertIncludes(out, "pg-2", "pg-3", "\"row_count\":2")
    assertExcludes(out.split("\"row_count\"")(0), "pg-1\"", "pg-4\"")

    p.send("""DEFINE tiers2 FIELDS { value: "int" }""")
    p.send("""STORE tiers2 FOR seg-1 PAYLOAD {"value":30}""")
    p.send("""STORE tiers2 FOR seg-2 PAYLOAD {"value":10}""")
    p.send("FLUSH")
    p.send("""STORE tiers2 FOR mem-1 PAYLOAD {"value":20}""")
    p.send("""STORE tiers2 FOR mem-2 PAYLOAD {"value":40}""")
    val ordered = p.send("QUERY tiers2 ORDER BY value ASC LIMIT 3")
    val (i1, i2, i3) = (ordered.indexOf("seg-2"), ordered.indexOf("mem-1"), ordered.indexOf("seg-1"))
    assert(i1 >= 0 && i2 > i1 && i3 > i2, s"expected seg-2 < mem-1 < seg-1 in:\n$ordered")
    assertExcludes(ordered.split("\"row_count\"")(0), "mem-2")
  }

  // ---- bucket_* ----

  // bucket_month_using_created_at_boundary, bucket_week_using_created_at_negative_offset_cross_week,
  // bucket_day_using_date_field_midnight_normalization, bucket_hour_using_created_at_ms_payload
  test("calendar bucketing over payload time fields: month, week, day, hour") {
    val p = open()
    p.send("""DEFINE sales FIELDS { n: "int", at: "datetime", amount: "int" }""")
    p.send("""STORE sales FOR b1 PAYLOAD {"n":1,"at":1736639999,"amount":10}""")
    p.send("""STORE sales FOR b2 PAYLOAD {"n":2,"at":1736640000,"amount":20}""")
    p.send("FLUSH")
    val month = p.send("QUERY sales TOTAL amount PER month USING at")
    assertIncludes(month, "\"bucket\"", "1735689600", "30")

    p.send("""DEFINE visits2 FIELDS { n: "int", at: "datetime" }""")
    p.send("""STORE visits2 FOR s1 PAYLOAD {"n":1,"at":1735171199}""")
    p.send("""STORE visits2 FOR s2 PAYLOAD {"n":2,"at":1735171200}""")
    p.send("FLUSH")
    assertIncludes(p.send("QUERY visits2 COUNT PER week USING at"), "[1734912000,2]")

    p.send("""DEFINE bdays FIELDS { n: "int", on: "date" }""")
    p.send("""STORE bdays FOR d1 PAYLOAD {"n":1,"on":"2025-09-06"}""")
    p.send("""STORE bdays FOR d2 PAYLOAD {"n":2,"on":"2025-09-06"}""")
    p.send("""STORE bdays FOR d3 PAYLOAD {"n":3,"on":"2025-09-07"}""")
    p.send("FLUSH")
    val day = p.send("QUERY bdays COUNT PER day USING on")
    assertIncludes(day, "\"count\"", ",2]", ",1]")

    p.send("""DEFINE clicks2 FIELDS { n: "int", at: "datetime" }""")
    p.send("""STORE clicks2 FOR c1 PAYLOAD {"n":1,"at":1735689600000}""")
    p.send("""STORE clicks2 FOR c2 PAYLOAD {"n":2,"at":1735693199000}""")
    p.send("""STORE clicks2 FOR c3 PAYLOAD {"n":3,"at":1735693200000}""")
    p.send("FLUSH")
    val hour = p.send("QUERY clicks2 COUNT PER hour USING at")
    assertIncludes(hour, "\"count\"", ",2]", ",1]")
  }

  // ---- wal_* ----

  // wal_reload_after_restart, wal_recover_no_flush, wal_recover_during_pending_flush
  test("WAL: unflushed memtable rows survive a restart") {
    val p = new Proto(spark, authEnabled = false, walEnabled = true)
    p.send("""DEFINE logins FIELDS { device: "string" }""")
    p.send("""STORE logins FOR u1 PAYLOAD {"device":"android"}""")
    p.restart()
    assertIncludes(p.send("""QUERY logins WHERE device = "android""""), "u1")
  }

  // wal_multi_log_recovery, wal_recover_multi_shard
  test("WAL: multiple rows and contexts recover with ids intact") {
    val p = new Proto(spark, authEnabled = false, walEnabled = true)
    p.send("""DEFINE evts FIELDS { v: "int" }""")
    p.send("""STORE evts FOR wa PAYLOAD {"v":1}""")
    p.send("""STORE evts FOR wb PAYLOAD {"v":2}""")
    p.send("""STORE evts FOR wc PAYLOAD {"v":3}""")
    p.restart()
    assertIncludes(p.send("QUERY evts WHERE v >= 1"), "wa", "wb", "wc", "\"row_count\":3")
    // new writes after recovery don't collide with recovered ids
    p.send("""STORE evts FOR wd PAYLOAD {"v":4}""")
    assertIncludes(p.send("QUERY evts WHERE v >= 1"), "\"row_count\":4")
  }

  // wal_flush_then_restart_segment_only, wal_durable_flush_each_write
  test("WAL: flushed data comes back from segments; WAL truncates on flush") {
    val p = new Proto(spark, authEnabled = false, walEnabled = true)
    p.send("""DEFINE orders2 FIELDS { id: "int" }""")
    p.send("""STORE orders2 FOR c1 PAYLOAD {"id":1}""")
    p.send("""STORE orders2 FOR c2 PAYLOAD {"id":2}""")
    p.send("FLUSH")
    p.restart()
    assertIncludes(p.send("QUERY orders2 WHERE id >= 1"), "c1", "c2", "\"row_count\":2")
    // post-flush WAL is empty: a restart without new writes recovers nothing extra
    p.restart()
    assertIncludes(p.send("QUERY orders2 WHERE id >= 1"), "\"row_count\":2")
  }

  // wal_disabled_no_recovery (also stands in for
  // wal_fsync_every_n_without_flush_each_write's buffered-loss expectation)
  test("WAL disabled: unflushed rows are lost on restart") {
    val p = new Proto(spark, authEnabled = false, walEnabled = false)
    p.send("""DEFINE volatile FIELDS { device: "string" }""")
    p.send("""STORE volatile FOR u1 PAYLOAD {"device":"android"}""")
    p.restart()
    assertIncludes(p.send("""QUERY volatile WHERE device = "android""""), "\"row_count\":0")
  }
}
