package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Contamination

/** Test-set decontamination: n-gram collision detection and the anti-join
  * drop path. */
class ContaminationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val bench = Seq(
    (100L, "the capital of france is paris and everyone knows it"))

  test("contamination counts distinct shared n-grams and the fraction") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "i think the capital of france is paris indeed"), // shares grams
      (2L, "unrelated text about gardening and soil quality today"),
      (3L, "the capital of france is paris and everyone knows it") // full copy
    ).toDF("doc_id", "text")
    val rep = Contamination.contamination(corpus, "doc_id", "text",
      bench.toDF("bid", "text"), "text", ngram = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 3: all 8 of its 3-grams are benchmark grams
    assert(rep(3L) == ((8L, 8L, 1.0)))
    // doc 1 shares exactly "the capital of", "capital of france",
    // "of france is", "france is paris" = 4 of its 7 grams
    assert(rep(1L)._2 == 4L && rep(1L)._1 == 7L)
    assert(!rep.contains(2L))
  }

  test("minHits raises the bar; decontaminate drops only flagged docs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "i think the capital of france is paris indeed"),
      (2L, "unrelated text about gardening and soil quality today"),
      (3L, "the capital of france is paris and everyone knows it")
    ).toDF("doc_id", "text")
    val strict = Contamination.contamination(corpus, "doc_id", "text",
      bench.toDF("bid", "text"), "text", ngram = 3, minHits = 5)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(3L))
    val kept = Contamination.decontaminate(corpus, "doc_id", "text",
      bench.toDF("bid", "text"), "text", ngram = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }
}
