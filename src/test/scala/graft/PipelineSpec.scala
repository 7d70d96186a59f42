package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
  private val nearDup = base.replace("runs", "walks") // one word changed
  private val unrelated = "completely different content about spark catalyst optimizer internals and parquet"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated),
    (4L, base), // exact dup of 1
    (5L, base.toUpperCase) // case-variant of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates") {
    val out = Dedup.exactDedup(docs, "doc_id", "text").collect()
    assert(out.length == 3) // {1,4,5} fold together, 2, 3
    val big = out.find(_.getAs[Long]("n_copies") == 3L).get
    assert(big.getAs[Long]("keep_id") == 1L)
  }

  test("minhash near-dups finds the planted pair, not the unrelated doc") {
    val pairs = Dedup.minhashNearDups(docs.filter($"doc_id" <= 3), "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("id_1"), r.getAs[Long]("id_2"))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash of near-dups differs in few bits; unrelated differs in many") {
    val sh = docs.select($"doc_id", Dedup.simhash($"text").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(4L)) // identical text → identical simhash
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
  }

  test("ngram jaccard: identical=1, near-dup high, unrelated 0") {
    val j = docs.as("a").crossJoin(docs.as("b"))
      .filter($"a.doc_id" === 1L)
      .select($"b.doc_id", Dedup.ngramJaccard(col("a.text"), col("b.text"), 3).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(j(4L) == 1.0)
    assert(j(2L) > 0.4 && j(2L) < 1.0)
    assert(j(3L) == 0.0)
  }

  test("quantized cosine matches exact within quantization error") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.8f, 0.6f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(e, e.filter($"vec_id" === 1L), "vec_id", "embedding", 2)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))
    assert(top.head._1 == 2L)
    assert(math.abs(top.head._2 - 0.8) < 1e-3)
    assert(top(1)._1 == 3L && math.abs(top(1)._2) < 1e-3)
  }

  test("language id picks stopword-matching language") {
    val t = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el gato es de la casa y que bien"),
      (3L, "xyzzy plugh frobnicate")).toDF("id", "text")
    val out = t.select($"id", TextAnalysis.languageId($"text").as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "es" && out(3L) == "und")
  }

  test("multimodal feature extraction shape and determinism") {
    val media = Multimodal.packFromText(docs, "doc_id", "text", "image")
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.getLong(0))
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.getLong(0))
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    assert(f1.forall(_.getAs[Seq[Double]]("features").length == 8))
  }
}
