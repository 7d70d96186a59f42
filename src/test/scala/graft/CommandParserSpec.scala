package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ast._
import graft.parser.{CommandParser, ParseException}

class CommandParserSpec extends AnyFunSuite {
  private def pq(s: String): QueryCmd = CommandParser.parse(s).asInstanceOf[QueryCmd]

  test("basic query with comparison") {
    val q = pq("""QUERY orders WHERE amount > 10""")
    assert(q.eventType == "orders")
    assert(q.where.contains(Expr.Cmp(FieldRef("amount"), CompareOp.Gt, Lit.I64(10))))
  }

  test("keywords are case-insensitive") {
    val q = pq("query orders where amount >= 5 limit 3 offset 1")
    assert(q.limit.contains(3) && q.offset.contains(1))
  }

  test("precedence NOT > AND > OR") {
    val q = pq("QUERY t WHERE NOT a = 1 AND b = 2 OR c = 3")
    q.where.get match {
      case Expr.Or(Expr.And(Expr.Not(_), _), Expr.Cmp(FieldRef("c", None), CompareOp.Eq, Lit.I64(3))) => ()
      case other => fail(s"wrong tree: $other")
    }
  }

  test("parenthesized expressions") {
    val q = pq("QUERY t WHERE (a = 1 OR b = 2) AND c != 3")
    q.where.get match {
      case Expr.And(Expr.Or(_, _), Expr.Cmp(_, CompareOp.Neq, _)) => ()
      case other => fail(s"wrong tree: $other")
    }
  }

  test("bare field means = true") {
    val q = pq("QUERY reviews WHERE verified")
    assert(q.where.contains(Expr.Cmp(FieldRef("verified"), CompareOp.Eq, Lit.Bool(true))))
  }

  test("IN list with mixed literals") {
    val q = pq("""QUERY t WHERE cat IN (1, "a", b)""")
    assert(q.where.contains(Expr.In(FieldRef("cat"), Seq(Lit.I64(1), Lit.Str("a"), Lit.Str("b")))))
  }

  test("string values: quoted and bare-word") {
    val q = pq("""QUERY t WHERE status = "done" AND plan = pro""")
    q.where.get match {
      case Expr.And(Expr.Cmp(_, _, Lit.Str("done")), Expr.Cmp(_, _, Lit.Str("pro"))) => ()
      case other => fail(s"wrong tree: $other")
    }
  }

  test("aggregations with grouping and bucketing") {
    val q = pq("QUERY orders COUNT, COUNT UNIQUE user, TOTAL amount, AVG amount, MIN amount, MAX amount PER DAY USING created_at BY country, plan LIMIT 5")
    assert(q.aggs == Seq(AggSpec.Count, AggSpec.CountUnique("user"), AggSpec.Total("amount"),
      AggSpec.Avg("amount"), AggSpec.Min("amount"), AggSpec.Max("amount")))
    assert(q.timeBucket.contains(TimeGranularity.Day))
    assert(q.bucketTimeField.contains("created_at"))
    assert(q.groupBy == Seq("country", "plan"))
    assert(q.limit.contains(5))
  }

  test("COUNT field vs COUNT vs COUNT UNIQUE") {
    assert(pq("QUERY t COUNT amount").aggs == Seq(AggSpec.CountField("amount")))
    assert(pq("QUERY t COUNT LIMIT 2").aggs == Seq(AggSpec.Count))
    assert(pq("QUERY t COUNT UNIQUE x").aggs == Seq(AggSpec.CountUnique("x")))
  }

  test("ORDER BY asc default and desc") {
    assert(pq("QUERY t ORDER BY x").orderBy.contains(OrderSpec("x", descending = false)))
    assert(pq("QUERY t ORDER BY x DESC").orderBy.contains(OrderSpec("x", descending = true)))
  }

  test("sequence chain with link") {
    val q = pq("QUERY a FOLLOWED BY b PRECEDED BY c LINKED BY user_id WHERE a.x = 1")
    assert(q.sequence.contains(EventSequence("a",
      Seq((SequenceLink.FollowedBy, "b"), (SequenceLink.PrecededBy, "c")))))
    assert(q.linkField.contains("user_id"))
    assert(q.where.contains(Expr.Cmp(FieldRef("x", Some("a")), CompareOp.Eq, Lit.I64(1))))
  }

  test("SINCE with ISO-8601 and epoch millis") {
    assert(pq("QUERY t SINCE 2024-01-15T00:00:00Z").since.contains(1705276800L))
    assert(pq("QUERY t SINCE 1705276800000").since.contains(1705276800L))
    assert(pq("QUERY t SINCE 2024-01-15").since.contains(1705276800L))
  }

  test("USING TIME vs USING") {
    val q = pq("QUERY a FOLLOWED BY b USING TIME viewed_at USING created_at")
    assert(q.sequenceTimeField.contains("viewed_at"))
    assert(q.timeField.contains("created_at"))
  }

  test("RETURN list forms") {
    assert(pq("QUERY t RETURN [a, b]").returnFields.contains(Seq("a", "b")))
    assert(pq("QUERY t RETURN []").returnFields.contains(Seq()))
  }

  test("REPLAY rewrites to query") {
    val r = CommandParser.parse("REPLAY product FOR ctx42 SINCE 2024-01-01 RETURN [name]").asInstanceOf[ReplayCmd]
    val q = r.toQuery
    assert(q.eventType == "product" && q.contextId.contains("ctx42") && q.returnFields.contains(Seq("name")))
    assert(CommandParser.parse("REPLAY FOR c1").asInstanceOf[ReplayCmd].toQuery.eventType == "*")
  }

  test("DEFINE with enum, optional, version") {
    val d = CommandParser.parse("""DEFINE subscription AS 2 FIELDS { plan: ["pro", "basic"], note: "string | null", n: "int" }""").asInstanceOf[DefineCmd]
    assert(d.eventType == "subscription" && d.version.contains(2))
    assert(d.fields == Seq("plan" -> "[pro, basic]", "note" -> "string | null", "n" -> "int"))
  }

  test("STORE payload raw json") {
    val s = CommandParser.parse("""STORE order_created FOR user9 PAYLOAD {"id": 1, "s": "a}b"}""").asInstanceOf[StoreCmd]
    assert(s.eventType == "order_created" && s.contextId == "user9")
    assert(s.payloadJson == """{"id": 1, "s": "a}b"}""")
  }

  test("REMEMBER wraps a query") {
    val r = CommandParser.parse("REMEMBER QUERY orders WHERE amount > 5 AS big_orders").asInstanceOf[RememberCmd]
    assert(r.name == "big_orders" && r.query.eventType == "orders")
  }

  test("PLOT desugars to aggregation query") {
    val q = CommandParser.parse("PLOT COUNT OF purchase BREAKDOWN BY country OVER DAY TOP 5").asInstanceOf[QueryCmd]
    assert(q.aggs == Seq(AggSpec.Count) && q.groupBy == Seq("country"))
    assert(q.timeBucket.contains(TimeGranularity.Day))
    assert(q.limit.contains(5))
    assert(q.orderBy.contains(OrderSpec("count", descending = true)))
  }

  test("PLOT VS produces compare") {
    val c = CommandParser.parse("PLOT TOTAL(amount) OF orders FILTER country = NL VS TOTAL(amount) OF orders FILTER country = BE").asInstanceOf[CompareCmd]
    assert(c.queries.length == 2)
    assert(c.queries.head.aggs == Seq(AggSpec.Total("amount")))
  }

  test("PLOT EXISTS placeholder parity (reference plotql.rs:171-190)") {
    // EXISTS(f) desugars to the reference's placeholder comparison
    val q = CommandParser.parse("PLOT COUNT OF orders FILTER EXISTS(user_id)").asInstanceOf[QueryCmd]
    assert(q.where.contains(Expr.Cmp(FieldRef("exists(user_id)"), CompareOp.Eq, Lit.Bool(true))))
    // NOT EXISTS(f) — negation wraps the same placeholder
    val qn = CommandParser.parse("PLOT COUNT OF orders FILTER NOT EXISTS(user_id)").asInstanceOf[QueryCmd]
    assert(qn.where.contains(Expr.Not(Expr.Cmp(FieldRef("exists(user_id)"), CompareOp.Eq, Lit.Bool(true)))))
    // bare EXISTS is rejected (plotql_tests.rs rejects_invalid_exists_expression)
    intercept[Exception] { CommandParser.parse("PLOT COUNT OF orders FILTER EXISTS") }
    // combined with other predicates
    val qc = CommandParser.parse("PLOT COUNT OF orders FILTER EXISTS(a) AND x > 3").asInstanceOf[QueryCmd]
    assert(qc.where.exists(_.isInstanceOf[Expr.And]))
  }

  test("PLOT funnel with arrows") {
    val q = CommandParser.parse("PLOT COUNT OF page_view -> purchase").asInstanceOf[QueryCmd]
    assert(q.sequence.contains(EventSequence("page_view", Seq((SequenceLink.FollowedBy, "purchase")))))
  }

  test("adversarial nesting: clean error past the depth bound, never a StackOverflowError") {
    // 20k nested parens previously killed the thread with an Error that
    // execute()'s Exception handler cannot catch
    val deep = "QUERY t WHERE " + ("(" * 20000) + "a = 1" + (")" * 20000)
    val e = intercept[graft.parser.ParseException](CommandParser.parse(deep))
    assert(e.getMessage.contains("nesting"))
    val deepNot = "QUERY t WHERE " + ("NOT " * 20000) + "a = 1"
    assert(intercept[graft.parser.ParseException](CommandParser.parse(deepNot))
      .getMessage.contains("nesting"))
    // depths a real query could plausibly reach still parse
    val ok = "QUERY t WHERE " + ("(" * 100) + "a = 1" + (")" * 100)
    assert(CommandParser.parse(ok).isInstanceOf[graft.ast.QueryCmd])
    // brace-shielded nested BATCH previously recursed once per level AND
    // copied the remainder per level — O(n²) to a driver OOM from ~400 KB
    val n = 20000
    val bomb = "BATCH [ " + ("BATCH { [ " * n) + "PING" + (" ] }" * n) + " ]"
    assert(intercept[graft.parser.ParseException](CommandParser.parse(bomb))
      .getMessage.contains("nesting"))
    assert(CommandParser.parse("BATCH [ PING; FLUSH ]").isInstanceOf[graft.ast.BatchCmd])
  }

  test("fuzz: arbitrary printable garbage parses or raises ParseException, nothing fatal") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = "QUERY SELECT WHERE AND OR NOT IN () [] {} \" ' \\ , . = < > ! 0 1 9 a z _ - \n\t"
    (0 until 2000).foreach { _ =>
      val len = rnd.nextInt(120)
      val s = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      try { CommandParser.parse(s); () } catch {
        case _: graft.parser.ParseException => ()
        case e: Exception => () // any Exception is catchable by execute()
        // Errors (SOE etc.) propagate and fail the test
      }
    }
  }

  test("errors: unknown command, bad agg") {
    assertThrows[ParseException](CommandParser.parse("FROBNICATE x"))
    assertThrows[ParseException](CommandParser.parse("QUERY t PER FORTNIGHT"))
  }
}
