package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.parser.CommandParser

/** Fuzz the command parser: arbitrary input must either parse to a Command
  * or raise an ordinary exception with a message — never a crash
  * (StackOverflow/OOM), never a hang, never a null-message error. Inputs
  * mix pure noise, truncations/mutations of valid commands, and
  * pathological nesting (deep parentheses — the recursive-descent WHERE
  * grammar's stack risk).
  */
class ParserFuzzSpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val valid = Seq(
    "QUERY purchase WHERE value > 100",
    "QUERY a FOLLOWED BY b LINKED BY context_id WHERE a.x = 1 LIMIT 5",
    """DEFINE t FIELDS { a: "int", s: ["x", "y"] }""",
    """STORE t FOR u1 PAYLOAD {"a": 1, "s": "x"}""",
    "QUERY t COUNT, TOTAL v, AVG v BY k PER DAY ORDER BY count DESC LIMIT 3 OFFSET 1",
    "PLOT COUNT OF a VS COUNT OF b BREAKDOWN BY k",
    "REPLAY purchase FOR 7 SINCE 2024-01-10T00:00:00Z",
    "REMEMBER QUERY t WHERE v > 5 AS m",
    "BATCH [ PING; FLUSH ]")

  test("random garbage, mutations, and deep nesting never crash the parser") {
    val noise = Gen.listOfN(40, Gen.frequency(
      (6, Gen.alphaNumChar), (2, Gen.oneOf(' ', '(', ')', '"', '[', ']', '{',
        '}', ',', '.', ';', '>', '<', '=', '!', '-')),
      (1, Gen.choose(32, 1000).map(_.toChar)))).map(_.mkString)
    val mutation = for {
      base <- Gen.oneOf(valid)
      cut <- Gen.choose(0, base.length)
      ins <- Gen.oneOf("", ")", "((", "WHERE", "\"", "\u00a7", " ")
    } yield base.take(cut) + ins + base.drop(cut)
    val cases =
      (1 to 300).map(i => sample(noise, i.toLong)) ++
      (1 to 300).map(i => sample(mutation, 10000L + i)) ++
      Seq("", " ", "(", ")" * 100, "QUERY", "QUERY " + "(" * 500 + "x") ++
      // deep-but-valid nesting: the recursive grammar must handle it
      Seq(s"QUERY t WHERE ${"(" * 200}v > 1${")" * 200}")
    cases.foreach { c =>
      try { CommandParser.parse(c); () }
      catch {
        case e: StackOverflowError => fail(s"stack overflow on <${c.take(120)}>")
        case e: Throwable =>
          assert(e.getMessage != null && e.getMessage.nonEmpty,
            s"null/empty error message on <${c.take(120)}>: ${e.getClass}")
      }
    }
  }

  test("scenario-corpus mutations never crash the parser (r14 verdict #7)") {
    // every input command of every reference integration scenario is a
    // mutation base — far wider grammar coverage than the 9 hand-picked
    // commands above (auth grammar, PlotQL, BATCH frames, enum payloads…)
    val corpusPath = java.nio.file.Paths.get(
      "/root/reference/tests/integration/scenarios.json")
    assume(java.nio.file.Files.isReadable(corpusPath))
    val root = graft.store.EventStore.readTree(
      new String(java.nio.file.Files.readAllBytes(corpusPath), "UTF-8"))
    import scala.jdk.CollectionConverters._
    val corpusCmds = root.elements().asScala.flatMap { s =>
      Option(s.get("input_commands")).toSeq
        .flatMap(_.elements().asScala.map(_.asText()))
    }.toSeq.distinct
    assert(corpusCmds.size > 200, s"corpus shrank? ${corpusCmds.size} commands")
    val mutation = for {
      base <- Gen.oneOf(corpusCmds)
      op <- Gen.choose(0, 3)
      cut <- Gen.choose(0, base.length)
      cut2 <- Gen.choose(0, base.length)
      ins <- Gen.oneOf("", ")", "((", "WHERE", "\"", "§", " ", "{", "[",
        "PER", "BY", "0x", "-", "1e309", "'")
    } yield op match {
      case 0 => base.take(cut) + ins + base.drop(cut)            // insert
      case 1 => base.take(math.min(cut, cut2)) + base.drop(math.max(cut, cut2)) // excise
      case 2 => base.take(cut)                                   // truncate
      case _ => base.take(cut) + base                            // duplicate head
    }
    val cases = corpusCmds ++ (1 to 1500).map(i => sample(mutation, 77000L + i))
    cases.foreach { c =>
      try { CommandParser.parse(c); () }
      catch {
        case e: StackOverflowError => fail(s"stack overflow on <${c.take(120)}>")
        case e: Throwable =>
          assert(e.getMessage != null && e.getMessage.nonEmpty,
            s"null/empty error message on <${c.take(120)}>: ${e.getClass}")
      }
    }
  }
}
