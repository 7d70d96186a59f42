package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.DataMix

/** Deterministic sampling and domain-weighted mixing. */
class DataMixSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"dom${i % 4}", s"text $i")).toDF("id", "dom", "text")
  }

  test("deterministicSample: reproducible, near-rate, salt-sensitive") {
    val df = corpus(2000)
    val a = DataMix.deterministicSample(df, "id", 0.3).select("id").collect().map(_.getLong(0)).toSet
    val b = DataMix.deterministicSample(df, "id", 0.3).select("id").collect().map(_.getLong(0)).toSet
    assert(a == b) // identical across runs — no RNG
    assert(math.abs(a.size - 600) < 60, s"got ${a.size}") // ~30% within 10%
    val salted = DataMix.deterministicSample(df, "id", 0.3, salt = "other")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(salted != a) // a different salt draws a different subset
    // rate monotonicity: the 30% sample nests inside the 60% sample
    val wider = DataMix.deterministicSample(df, "id", 0.6).select("id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))
  }

  test("mixByDomain: integer weights repeat, fractional weights sample, 0 drops") {
    val df = corpus(400) // 100 per domain
    val mixed = DataMix.mixByDomain(df, "id", "dom",
      Map("dom0" -> 3.0, "dom1" -> 1.5, "dom2" -> 0.5), defaultWeight = 0.0)
    val byDom = mixed.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("dom0") == 300L) // exactly 3 copies each
    assert(byDom("dom1") >= 100L && math.abs(byDom("dom1") - 150L) < 25)
    assert(math.abs(byDom("dom2") - 50L) < 25)
    assert(!byDom.contains("dom3")) // default weight 0 drops the domain
    // copy_idx enumerates repeats per doc: dom0 docs carry 0,1,2
    val idxs = mixed.filter(col("dom") === "dom0").groupBy("id")
      .agg(sort_array(collect_list("copy_idx")).as("ix"))
      .select("ix").distinct().collect()
    assert(idxs.length == 1 && idxs.head.getSeq[Long](0) == Seq(0L, 1L, 2L))
    // every row of the original schema survives (plus copy_idx)
    assert(mixed.columns.toSeq == Seq("id", "dom", "text", "copy_idx"))
  }

  test("assignSplits: exhaustive, disjoint, stable under corpus growth") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val got = DataMix.assignSplits(ids, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2000) // every row labeled exactly once
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 1700 && counts("val") > 50 && counts("test") > 50)
    // growth stability: labels of existing ids don't move when rows appear
    val grown = DataMix.assignSplits((0L until 4000L).toDF("id"), "id", splits)
      .filter($"id" < 2000).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(grown == got)
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      DataMix.assignSplits(ids, "id", Seq("a" -> 0.5, "b" -> 0.6))
    }
    intercept[IllegalArgumentException] {
      DataMix.assignSplits(ids, "id", Seq("a" -> (1.0 / 3), "b" -> (2.0 / 3)))
    }
    // null id → null coin → every range test null → LAST split, matching
    // the oracle's `'salt:' || NULL` propagation (concat_ws would have
    // hashed nulls to the constant salt instead)
    val withNull = Seq(Some(1L), None).map(o => Tuple1(o.map(Long.box).orNull))
      .toDF("id")
    val nullSplit = DataMix.assignSplits(withNull, "id", splits)
      .collect().map(r => Option(r.get(0)) -> r.getString(1)).toMap
    assert(nullSplit(None) == "test")
  }

  test("weightedSamplePerGroup: priority order u div w, non-positive weights excluded") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => ("g", i, i)) ++ // weight = id
      Seq(("g", 51L, 0L), ("g", 52L, -3L), // never sampled
        ("h", 60L, 1L)) // small group: all rows survive
    val df = rows.toSeq.toDF("grp", "id", "w")
    val out = DataMix.weightedSamplePerGroup(df, "grp", "id", "w", n = 10)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id"),
        r.getAs[Long]("rk"), r.getAs[Long]("weight")))
    // expected: rank by (md5('wmix:'+id) div w, id), 10 smallest of group g
    val exp = (1L to 50L).map { i =>
      (i, Math.floorMod(graft.pipeline.Hashing.md5LongJvm(s"wmix:$i"),
        1L << 60) / i)
    }.sortBy { case (i, r) => (r, i) }.take(10).zipWithIndex
      .map { case ((i, _), rk) => ("g", i, rk.toLong, i) }
    assert(out.filter(_._1 == "g").sortBy(_._3).toSeq == exp)
    assert(out.filter(_._1 == "h").toSeq == Seq(("h", 60L, 0L, 1L)))
    // determinism: a repartitioned input samples the identical set
    val again = DataMix.weightedSamplePerGroup(df.repartition(7), "grp", "id", "w", n = 10)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id"))).toSet
    assert(again == out.map(t => (t._1, t._2)).toSet)
  }
}
