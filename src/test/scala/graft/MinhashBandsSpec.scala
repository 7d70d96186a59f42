package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** The native per-row band-hash kernel ([[graft.functions.MinhashBands]])
  * must be VALUE-IDENTICAL to the explode+groupBy
  * `bandTable(minhashColumns(...))` spelling it replaced at every
  * band-table build site — the DuckDB oracles replicate that arithmetic
  * literally, so any divergence is an oracle break, not a perf note. */
class MinhashBandsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    val body = "the quick brown fox jumps over the lazy dog and keeps going " * 2
    (0L until 60L).map { i =>
      val text =
        if (i % 19 == 3) "" // shingle-less: must be ABSENT from the band table
        else if (i % 7 == 0) body + s" tail-$i"
        else s"doc $i body ${body.take((i * 13 % 90 + 10).toInt)}"
      (i, text)
    }.toDF("doc_id", "text")
  }

  private def legacy(bands: Int, rpb: Int) = {
    val hashed = corpus.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("sh"))
    Dedup.bandTable(
      Dedup.minhashColumns(hashed, col("id"), col("sh"), bands * rpb), bands, rpb)
  }

  private def native(bands: Int, rpb: Int) = {
    val hashed = corpus.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("sh"))
    Dedup.bandTableFromShingles(hashed, col("id"), col("sh"), bands, rpb)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "band_idx", "band_hash").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("native band table equals the explode+groupBy spelling (r<=2 exact packing)") {
    for ((b, r) <- Seq((32, 2), (8, 1))) {
      val l = rows(legacy(b, r))
      val n = rows(native(b, r))
      assert(l == n, s"scheme ${b}x$r diverged: legacy ${l.size} vs native ${n.size} rows")
      assert(l.nonEmpty)
      // the shingle-less doc is absent from both
      assert(!l.exists(_._1 == 3L) && !n.exists(_._1 == 3L))
    }
  }

  test("native band table equals the legacy spelling (r>2 PackMod folding)") {
    for ((b, r) <- Seq((35, 3), (16, 4))) {
      val l = rows(legacy(b, r))
      val n = rows(native(b, r))
      assert(l == n, s"scheme ${b}x$r diverged")
    }
  }

  test("native matches the streaming per-row HOF spelling too") {
    val hashed = corpus.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("sh"))
    val hof = hashed.select(col("id"),
        posexplode(Dedup.bandHashesExpr(col("sh"), 35, 3)).as(Seq("band_idx", "band_hash")))
      .filter(col("band_hash").isNotNull)
    assert(rows(hof) == rows(native(35, 3)))
  }
}
