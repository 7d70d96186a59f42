package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Ranking}

class RankingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("globalRank equals the single-window row_number on a shuffled input") {
    val rows = scala.util.Random.shuffle((0 until 1000).toList)
      .map(i => (i.toLong, s"k${i % 37}"))
    val df = rows.toDF("id", "key")
    val out = Ranking.globalRank(df, Seq("key", "id"), nPartitions = 8)
      .select("key", "id", "_rank").as[(String, Long, Long)]
      .collect().sortBy(_._3)
    // ranks are 1..n with no gaps, and follow (key, id) order exactly
    assert(out.map(_._3).toSeq == (1L to 1000L))
    val expected = rows.map { case (i, k) => (k, i) }.sorted
    assert(out.map(t => (t._1, t._2)).toSeq == expected)
  }

  test("globalRank offsets survive empty partitions") {
    // 3 distinct keys range-partitioned into 8 → most partitions empty
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "key")
    val out = Ranking.globalRank(df, Seq("key", "id"), nPartitions = 8)
      .select("id", "_rank").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("sortedNeighborhoodDups finds prefix-adjacent near-dups only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // adjacent, near-dup
      (3L, "zz yy xx totally different words here now"),
      // shares one shingle with doc 2 — below threshold, sorts between
      (9L, "omega psi chi rho sigma alpha beta gamma")
    ).toDF("doc_id", "text")
    val out = Dedup.sortedNeighborhoodDups(docs, "doc_id", "text",
      windowSize = 2, thetaPpm = 300000L)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }
}
