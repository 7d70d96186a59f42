package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Identity

class IdentitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("context_id", "dev", "em")

  test("stitch merges multi-hop chains across different key types") {
    // 1–2 share a device, 2–3 share an email: all three are one identity
    // even though 1 and 3 share nothing directly
    val out = Identity.stitch(
      ev((1L, "dA", "eX"), (2L, "dA", "eY"), (3L, "dB", "eY"),
        (4L, "dC", "eZ"), (4L, "dC", "eZ")),
      "context_id", Seq("dev", "em"))
      .collect().map(r => (r.getAs[String]("context_id"),
        r.getAs[Long]("n_events"), r.getAs[Long]("identity_id"),
        r.getAs[Long]("n_members"), r.getAs[Long]("identity_events"))).toSet
    assert(out == Set(
      ("1", 1L, 1L, 3L, 3L),
      ("2", 1L, 1L, 3L, 3L),
      ("3", 1L, 1L, 3L, 3L),
      ("4", 2L, 4L, 1L, 2L)))
  }

  test("null and empty keys prove nothing") {
    val rows = Seq[(Long, String, String)]((1L, null, ""), (2L, null, ""))
      .toDF("context_id", "dev", "em")
    val out = Identity.stitch(rows, "context_id", Seq("dev", "em"))
      .select("context_id", "identity_id")
      .as[(String, Long)].collect().toSet
    assert(out == Set(("1", 1L), ("2", 2L)))
  }

  test("star edges are linear in observations for a hot key") {
    // 1000 contexts on ONE device: the edge set must be the 999-edge star,
    // never the ~500k pairwise clique
    val hot = spark.range(1000).select(col("id").as("context_id"),
      lit("shared").as("dev"))
    val edges = Identity.identityEdges(hot, "context_id", Seq("dev"))
    assert(edges.count() == 999L)
    assert(edges.agg(max(col("id_2"))).as[Long].head() == 0L)
  }

  test("rekey carries identity_id onto event rows, singletons keep themselves") {
    val out = Identity.rekey(
      ev((5L, "dQ", "e1"), (6L, "dQ", "e2"), (7L, "dR", "e3")),
      "context_id", Seq("dev", "em"))
      .select("context_id", "identity_id").as[(Long, Long)].collect().toSet
    assert(out == Set((5L, 5L), (6L, 5L), (7L, 7L)))
  }
}
