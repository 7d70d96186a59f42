package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.SequencePacking

/** Greedy token-budget sequence packing. */
class SequencePackingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("greedy fill, oversize singletons, exact-boundary fit (single bucket)") {
    import spark.implicits._
    val df = Seq((1L, 300L), (2L, 300L), (3L, 200L), (4L, 600L), (5L, 100L),
      (6L, 412L)).toDF("id", "tok")
    val packed = SequencePacking.packGreedy(df, "id", "tok", budget = 512, buckets = 1)
      .collect().sortBy(_.seq_id)
    assert(packed.map(_.doc_ids).toSeq ==
      Seq(Seq(1L), Seq(2L, 3L), Seq(4L), Seq(5L, 6L))) // 100+412 = 512 fits exactly
    assert(packed.map(_.n_tokens).toSeq == Seq(300L, 500L, 600L, 512L))
    assert(packed.map(_.seq_id).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("multi-bucket: every doc packed exactly once, seq_ids unique, reproducible") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, 50L + i % 200)).toDF("id", "tok")
    val a = SequencePacking.packGreedy(df, "id", "tok", budget = 1000, buckets = 8).collect()
    assert(a.flatMap(_.doc_ids).sorted.toSeq == (0L until 500L))
    assert(a.map(_.seq_id).distinct.length == a.length)
    assert(a.forall(p => p.n_tokens <= 1000 || p.n_docs == 1))
    assert(a.forall(p => p.n_docs == p.doc_ids.size))
    val b = SequencePacking.packGreedy(df, "id", "tok", budget = 1000, buckets = 8).collect()
    assert(a.map(p => p.seq_id -> p.doc_ids).toMap == b.map(p => p.seq_id -> p.doc_ids).toMap)
  }
}
