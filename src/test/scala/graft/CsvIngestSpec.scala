package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CsvIngest

class CsvIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("parseCsv round-trips RFC-4180 quoting and routes failures") {
    val lines = Seq(
      ("a", "5,\"c:hello, \"\"q5\"\"\",en,42"),   // hostile but valid
      ("b", "6,,en,2"),                         // empty required field
      ("e", "9,\"t\",en"),                       // short row
      ("c", "7,\"x\",en,1,9,9"),              // too many columns
      ("d", "8,plain,de,3")                 // unquoted valid
    ).toDF("tag", "line")
    val out = CsvIngest.parseCsv(lines, "line")
      .select("tag", "doc_id", "text", "status")
      .as[(String, Option[Long], Option[String], String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out("a") == ((Some(5L), Some("c:hello, \"q5\""), "ok")))
    assert(out("b") == ((Some(6L), None, "missing_field")))
    assert(out("e")._3 == "malformed")
    assert(out("c")._3 == "malformed")
    assert(out("d") == ((Some(8L), Some("plain"), "ok")))
  }

  test("syntheticCsv → parseCsv restores the hostile text exactly") {
    val docs = Seq((1L, "alpha, beta", "en", 11L), (13L, "m", "de", 1L),
      (19L, "s", "fr", 1L)).toDF("doc_id", "text", "lang", "n_chars")
    val out = CsvIngest.parseCsv(
      CsvIngest.syntheticCsv(docs, "doc_id", "text", "lang", "n_chars"), "line")
      .select("orig_id", "text", "status")
      .as[(Long, Option[String], String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(1L) == ((Some("c:alpha, beta, \"q1\""), "ok")))
    assert(out(13L)._2 == "malformed")
    assert(out(19L) == ((None, "missing_field")))
  }
}
