package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{EventStore, ExecResult}

/** Skew guard for the sequence matcher (VERDICT r2 #7): one link-key holding
  * ~1M events must flow through `SequenceCompiler`'s single
  * `groupByKey.flatMapGroups` shuffle and complete within executor memory.
  * The per-group state is the row set itself (~100 MB/1M rows at this
  * width) plus binary-search cursors — linear, no pairwise blowup; this test
  * pins that property so a regression to O(group²) or unbounded buffering
  * shows up as a timeout/OOM here.
  */
class SequenceSkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("1M events on a single link key complete through the sequence matcher") {
    val dir = Files.createTempDirectory("graft_skew_").toString
    val s = new EventStore(spark, dir)
    s.execute("""DEFINE sk_click FIELDS { n: "int" }""")
    s.execute("""DEFINE sk_buy FIELDS { n: "int" }""")
    val half = 500000
    // ALL rows share one context — the worst-case hot key
    val clicks = spark.range(half).select(
      lit("hot").as("ctx"), col("id").as("n"), (col("id") * 2).as("at"))
    val buys = spark.range(half).select(
      lit("hot").as("ctx"), col("id").as("n"), (col("id") * 2 + 1).as("at"))
    assert(s.ingestFrame("sk_click", clicks, "ctx", Some("at")).isRight)
    assert(s.ingestFrame("sk_buy", buys, "ctx", Some("at")).isRight)

    val t0 = System.nanoTime()
    val n = s.execute("QUERY sk_click FOLLOWED BY sk_buy LINKED BY context_id") match {
      case ExecResult.Frame(df) => df.count()
      case other                => fail(other.toString)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1M-row hot key matched in $secs%.1f s")
    // every click at ts=2i has a buy at ts=2i+1 following it
    assert(n == half)
    // generous bound: linear matching on 1M rows is seconds, a pairwise
    // regression would be hours
    assert(secs < 300, f"sequence matcher took $secs%.1f s on a 1M-row key")
  }
}
