package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Hashing, Sketches}

/** Properties of the deterministic sketch family ([[pipeline.Sketches]]):
  * partition-invariance (mergeability), exactness below the sketch bound,
  * accuracy within the theoretical error envelope, CMS never-undercounts,
  * bloom never-false-negatives. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("bottom-k sketch is partition-invariant, distinct, ascending, bounded") {
    val vals = (0 until 5000).map(i => s"v${i % 1200}") // duplicates on purpose
    val one = vals.toDF("v").repartition(1)
      .agg(Sketches.bottomK(Hashing.md5Long(col("v")), 64)).head.getSeq[Long](0)
    val many = vals.toDF("v").repartition(37)
      .agg(Sketches.bottomK(Hashing.md5Long(col("v")), 64)).head.getSeq[Long](0)
    assert(one == many, "sketch must not depend on partitioning")
    assert(one.length == 64)
    assert(one == one.distinct.sorted)
  }

  test("KMV estimate is exact when the sketch is exhaustive") {
    val df = (0 until 40).map(i => s"x$i").toDF("v")
    val est = Sketches.kmvDistinct(df.withColumn("g", lit("a")), "g", col("v"), 64)
    val row = est.head
    assert(row.getAs[Long]("sketch_size") == 40)
    assert(row.getAs[Long]("est_distinct") == 40)
  }

  test("KMV estimate lands within the k=256 error envelope on 10k distinct") {
    val df = (0 until 30000).map(i => s"item-${i % 10000}").toDF("v")
      .withColumn("g", lit("a"))
    val est = Sketches.kmvDistinct(df, "g", col("v"), 256).head.getAs[Long]("est_distinct")
    // standard error ~ 1/sqrt(k-2) ≈ 6.3%; assert a lenient 4-sigma band
    assert(math.abs(est - 10000) < 2500, s"est=$est")
  }

  test("KMV overlap of identical sets reports Jaccard 1.0") {
    val df = (0 until 500).map(i => s"t$i").toDF("v")
      .withColumn("a", lit(true)).withColumn("b", lit(true))
    val r = Sketches.kmvOverlap(df, col("a"), col("b"), col("v"), 64).head
    assert(r.getAs[Long]("jaccard_ppm") == 1000000L)
    assert(r.getAs[Long]("matches") == 64)
  }

  test("KMV overlap of disjoint sets reports Jaccard 0") {
    val df = (0 until 1000).map(i => (s"t$i", i % 2 == 0)).toDF("v", "isa")
    val r = Sketches.kmvOverlap(df, col("isa"), !col("isa"), col("v"), 64).head
    assert(r.getAs[Long]("jaccard_ppm") == 0L)
    assert(r.getAs[Long]("inter_est") == 0L)
  }

  test("CMS estimates never undercount and are exact without collisions") {
    val rows = (0 until 2000).map(i => s"w${i % 37}") // 37 values, skewed counts
    val df = rows.toDF("v")
    val counters = Sketches.cmsCounters(df, col("v"), depth = 4, width = 1024)
    val cand = df.distinct()
    val est = Sketches.cmsEstimate(counters, cand, col("v"), depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (v, n) =>
      assert(est(v) >= n, s"CMS undercounted $v")
    }
    // 37 values into 4x1024 buckets: collisions are possible but the MIN
    // across 4 independent rows makes simultaneous collision vanishing
    assert(exact.count { case (v, n) => est(v) == n } >= 35)
  }

  test("sketch rollup is lossless: merged part-sketches equal the direct sketch") {
    // 1000 values split into 13 arbitrary parts: bottom-k(union of
    // bottom-ks) must equal bottom-k(union)
    val df = (0 until 3000).map(i => (i % 13, s"v${i % 1000}")).toDF("part", "v")
    val h = Hashing.md5Long(col("v"))
    val direct = df.agg(Sketches.bottomK(h, 64)).head.getSeq[Long](0)
    val merged = df.groupBy("part").agg(Sketches.bottomK(h, 64).as("sk"))
      .agg(collect_list(col("sk")).as("sks"))
      .select(slice(array_sort(array_distinct(flatten(col("sks")))), 1, 64))
      .head.getSeq[Long](0)
    assert(merged == direct)
  }

  test("histogram quantiles: exact bin-edge answers on a uniform distribution") {
    val df = (0 until 1000).map(_.toLong).toDF("v").withColumn("g", lit("a"))
    val r = Sketches.histogramQuantiles(df, "g", col("v"), 0L, 1000L, 10, Seq(50, 90, 99)).head
    assert(r.getAs[Long]("n") == 1000)
    // ceil(1000*q/100) falls exactly on a bin boundary for q=50/90; p99
    // lands inside the last bin whose upper edge is hi
    assert(r.getAs[Long]("p50_est") == 500)
    assert(r.getAs[Long]("p90_est") == 900)
    assert(r.getAs[Long]("p99_est") == 1000)
  }

  test("histogram quantiles clamp out-of-range values into edge bins") {
    val df = Seq(-50L, -1L, 5L, 6L, 2000L).toDF("v").withColumn("g", lit("a"))
    val r = Sketches.histogramQuantiles(df, "g", col("v"), 0L, 100L, 10, Seq(50, 99)).head
    // 3 of 5 values are in/below bin 0 → p50 target 3 reached at bin 0
    assert(r.getAs[Long]("p50_est") == 10)
    // the 2000 clamps into the last bin → p99 = hi
    assert(r.getAs[Long]("p99_est") == 100)
  }

  test("bloom probe has no false negatives and bounded mask") {
    val build = (0 until 100).map(_ * 7L).toDF("key")
    val probe = (0 until 1000).map(_.toLong).toDF("key")
    val stats = Sketches.bloomProbeStats(build, col("key"), probe, col("key"),
      mBits = 4096, nHashes = 3).head
    assert(stats.getAs[Long]("n_probe") == 1000)
    // every true member (multiples of 7 below 700) must pass the bloom
    assert(stats.getAs[Long]("n_true_matches") ==
      (0 until 1000).count(i => i % 7 == 0 && i < 700))
    assert(stats.getAs[Long]("n_candidates") >= stats.getAs[Long]("n_true_matches"))
    assert(stats.getAs[Long]("n_bits_set") <= 300)
  }

  test("bloom mask is deterministic across builds") {
    val build = (0 until 50).map(i => i * 13L).toDF("key")
    val m1 = Sketches.bloomMask(build.repartition(1), col("key"), 512, 3)
    val m2 = Sketches.bloomMask(build.repartition(7), col("key"), 512, 3)
    assert(m1.toSeq == m2.toSeq)
  }
}
