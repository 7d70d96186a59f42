package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.parser.CommandParser

/** Accept/reject sweep over every PlotQL form the reference's parser tests
  * exercise (`src/command/parser/commands/plotql_tests.rs`, extracted to
  * `plotql_forms.json`: 180 inputs across 124 test fns). Asserts OUR parser
  * accepts what the reference accepts and rejects what it rejects — the
  * resulting ASTs are covered by CommandParserSpec and the oracle gate.
  */
class PlotQLSweepSpec extends AnyFunSuite {

  /** input → reason for divergence (each also in DIVERGENCES.md). */
  private val skip: Map[String, String] = Map.empty

  private val forms: Seq[(String, String, String)] = {
    val in = getClass.getResourceAsStream("/plotql_forms.json")
    val root = graft.store.EventStore.readTree(new String(in.readAllBytes(), "UTF-8"))
    root.elements().asScala.map { f =>
      (f.get("test").asText(), f.get("input").asText(), f.get("expect").asText())
    }.toSeq
  }

  test("PlotQL accept/reject parity across the reference parser-test corpus") {
    val failures = forms.flatMap { case (name, input, expect) =>
      if (skip.contains(input)) None
      else {
        val parsed = scala.util.Try(CommandParser.parse(input))
        (expect, parsed.isSuccess) match {
          case ("accept", false) =>
            Some(s"[$name] expected ACCEPT but got: ${parsed.failed.get.getMessage}\n  input: $input")
          case ("reject", true) =>
            Some(s"[$name] expected REJECT but parsed: ${parsed.get}\n  input: $input")
          case _ => None
        }
      }
    }
    assert(failures.isEmpty, s"${failures.size} divergent forms:\n" + failures.mkString("\n"))
  }
}
