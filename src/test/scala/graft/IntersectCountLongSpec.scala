package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** The native intersection-count kernel
  * ([[graft.functions.IntersectCountLong]]) must be VALUE-IDENTICAL to
  * `size(array_intersect(a, b))` at every confirm site it replaced — the
  * DuckDB oracles compute exact set intersections, so any divergence
  * (duplicate handling, null elements, empty arrays) is an oracle break. */
class IntersectCountLongSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def pairs = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // adversarial shapes: empties, singletons, duplicates on either side,
    // disjoint / identical / nested sets, colliding low bits, negatives,
    // Long extremes, and 0 (the open-addressing empty-slot edge)
    val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L), Seq(5L)),
      (Seq(5L), Seq(6L)),
      (Seq(0L, 1L, 2L), Seq(0L, 2L, 4L)),
      (Seq(1L, 1L, 2L, 2L), Seq(2L, 2L, 3L, 1L)),
      (Seq(Long.MaxValue, Long.MinValue, -1L, 0L),
        Seq(0L, -1L, Long.MinValue, Long.MaxValue)),
      (Seq(1L, 65L, 129L), Seq(65L, 193L, 1L)), // same low bits mod 64
      ((1L to 200L).toSeq, (101L to 300L).toSeq),
      ((1L to 64L).toSeq, (1L to 64L).toSeq)
    ) ++ (0 until 30).map { _ =>
      val a = Seq.fill(rnd.nextInt(80))(rnd.nextInt(50).toLong)
      val b = Seq.fill(rnd.nextInt(80))(rnd.nextInt(50).toLong)
      (a, b)
    }
    cases.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
  }

  test("intersect_count equals size(array_intersect) on adversarial long arrays") {
    val df = pairs
      .withColumn("native", Dedup.intersectCount(col("a"), col("b")))
      .withColumn("composed", size(array_intersect(col("a"), col("b"))))
    val bad = df.filter(col("native") =!= col("composed")).collect()
    assert(bad.isEmpty, s"diverged rows: ${bad.mkString("; ")}")
    // sanity: the set is not trivially all-zero
    assert(df.filter(col("composed") > 0).count() > 5)
  }

  test("null elements count once when present on both sides") {
    import spark.implicits._
    val df = Seq(
      (Seq[Option[Long]](Some(1L), None, None), Seq[Option[Long]](None, Some(2L))),
      (Seq[Option[Long]](Some(1L), None), Seq[Option[Long]](Some(1L))),
      (Seq[Option[Long]](Some(3L)), Seq[Option[Long]](None, Some(3L)))
    ).toDF("a", "b")
      .withColumn("native", Dedup.intersectCount(col("a"), col("b")))
      .withColumn("composed", size(array_intersect(col("a"), col("b"))))
    val rows = df.select("native", "composed").collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), s"diverged: $r"))
  }

  test("null array input yields null (both consumed as a rejected row downstream)") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .withColumn("native", Dedup.intersectCount(col("a"), col("b")))
    assert(df.select("native").collect().head.isNullAt(0))
  }

  test("prefix join output is unchanged by the kernel + length filter (oracle shape)") {
    import spark.implicits._
    // small corpus with engineered near-dups at varying length ratios
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = (0L until 40L).map { i =>
      val text =
        if (i % 5 == 0) base + s" suffix-${i / 10}" // clusters of near-dups
        else if (i % 7 == 3) base.split(" ").take(6).mkString(" ") // short doc
        else s"doc $i " + base.split(" ").drop((i % 13).toInt).mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val out = Dedup.prefixJaccardJoin(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute-force truth over the same hashed-shingle similarity
    val toks = docs.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("ts"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
      .filter(_._2.nonEmpty)
    val truth = (for {
      (i1, s1) <- toks; (i2, s2) <- toks if i1 < i2
      inter = (s1 & s2).size.toDouble
      j = inter / (s1.size + s2.size - inter) if j >= 0.5
      // Spark's round() is HALF_UP
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (i1, i2, jr)).toSet
    assert(out == truth, s"prefix join diverged from brute force: " +
      s"only-out=${out -- truth} only-truth=${truth -- out}")
  }
}
