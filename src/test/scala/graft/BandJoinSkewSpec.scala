package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, RangeJoin}

/** Adversarial-skew guard for the banded equi-joins (VERDICT r10 #8), the
  * sibling of [[SequenceSkewSpec]]'s hot-link-key pin.
  *
  * Two different skew shapes, two different defenses:
  *
  *  - [[RangeJoin.bandJoin]]: INPUT skew — one bucket holding ~half the
  *    fact rows concentrates one hash partition. The defense is AQE's
  *    OptimizeSkewedJoin splitting that partition; the test lowers the
  *    skew thresholds to gate-scale and asserts the split actually fired
  *    (`skew=true` in the final adaptive plan), so a future conf or plan
  *    change that silently disables it fails here.
  *
  *  - [[Dedup.minhashNearDups]]: OUTPUT skew — a band bucket holding d
  *    duplicate ids emits d² candidate pairs, while its INPUT rows stay
  *    tiny (24-byte band rows), so partition-size-based skew splitting is
  *    structurally the wrong lever. The defenses are the banding itself
  *    (bucket width bounds d), candidate dedup, and the exact-confirm
  *    rejoin keying on uniform ids; the test pins that a 10%-hot corpus
  *    completes with the exact expected pair count and no cartesian shape.
  */
class BandJoinSkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withSkewConfs[T](f: => T): T = {
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // gate-scale thresholds: production defaults (256 MB) can never fire
      // on test data, and this test exists to prove the mechanism engages
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      // a broadcast would dissolve the join we're trying to stress
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      f
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bandJoin under a hot bucket: AQE skew-split fires and results are exact") {
    withSkewConfs {
      // 200k facts: half pile onto bucket 0 (value 42), half spread evenly
      val facts = spark.range(200000).select(
        when(col("id") % 2 === 0, lit(42L))
          .otherwise((col("id") % 100000L) * 100L + 7L).as("v"),
        col("id").as("fact_id"))
      // 1k bands of width 10k over the value space; band 0 covers the hot value
      val bands = spark.range(1000).select(
        (col("id") * 10000L).as("lo"), ((col("id") + 1) * 10000L).as("hi"),
        col("id").as("band_id"))
      val joined = RangeJoin.bandJoin(facts, col("v"), bands, "lo", "hi",
        bucketWidth = 10000L)
      // collect() executes THIS frame's QueryExecution (count() would plan
      // a separate one and leave joined's adaptive plan unexecuted)
      val n = joined.collect().length
      // every fact falls in exactly one band
      assert(n == 200000, s"expected every fact matched once, got $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew-split did not engage on the hot bucket:\n$plan")
    }
  }

  test("srpPlanesFor scales LSH depth with corpus size and cuts candidates") {
    import graft.pipeline.Similarity
    // the math: one extra plane per corpus doubling, clamped
    assert(Similarity.srpPlanesFor(64) == 2)
    assert(Similarity.srpPlanesFor(2048) == 5)
    assert(Similarity.srpPlanesFor(2049) == 6)
    assert(Similarity.srpPlanesFor(Long.MaxValue) == 20)
    (1 to 30).foreach { k =>
      val n = 1L << k
      assert(Similarity.srpPlanesFor(2 * n) >= Similarity.srpPlanesFor(n),
        s"depth must be monotonic in corpus size (n=$n)")
    }
    // the behavior: on a corpus 8x the default-depth sizing, the sized
    // depth produces strictly fewer candidate pairs than the gate-scale
    // default (4 planes) while both confirm through the same exact check
    import spark.implicits._
    val dims = 8
    val vecs = (0 until 2048).map { i =>
      (i.toLong, Array.tabulate(dims)(j =>
        (math.sin(i * 0.7 + j * 1.3) * 100).toFloat))
    }.toDF("vec_id", "embedding")
    def candCount(planes: Int): Long = {
      val v = vecs.select(col("vec_id").as("id"),
        Similarity.quantize(col("embedding")).as("qv"))
      val banded = v.select(col("id"),
          explode(Similarity.srpBuckets(col("qv"), dims, planes, 4)).as("tb"))
        .select(col("id"), col("tb.tbl"), col("tb.bkt"))
      banded.as("a").join(banded.as("b"), Seq("tbl", "bkt"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
    }
    val shallow = candCount(4)
    val sized = candCount(Similarity.srpPlanesFor(2048, targetPerBucket = 16))
    assert(sized < shallow,
      s"sized depth should prune candidates: sized=$sized shallow=$shallow")
  }

  test("bandingFor picks precision-leaning S-curves within the perms budget") {
    import graft.pipeline.Dedup
    def pCand(j: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(j, r), b)
    // θ=0.5 in a 64-perm budget: midpoint exactly 0.5 at 16×4
    assert(Dedup.bandingFor(0.5, 64) == (16, 4))
    // the chosen curve suppresses the sub-threshold candidates the 32×2
    // default admits (the r11 editdist scale finding) while keeping
    // at-threshold capture ≥ 1/2 and above-threshold capture high
    val (b, r) = Dedup.bandingFor(0.5, 64)
    assert(pCand(0.2, b, r) < 0.05 && pCand(0.2, 32, 2) > 0.7)
    assert(pCand(0.5, b, r) >= 0.5)
    assert(pCand(0.7, b, r) > 0.95)
    // low thresholds need shallow rows (recall), high thresholds deep rows
    // (precision) — midpoint stays at or below θ whenever feasible
    for (t <- Seq(0.1, 0.3, 0.5, 0.7, 0.9); perms <- Seq(16, 64, 128)) {
      val (bb, rr) = Dedup.bandingFor(t, perms)
      assert(bb * rr <= perms, s"budget exceeded for ($t, $perms)")
      assert(math.pow(1.0 / bb, 1.0 / rr) <= t + 1e-9 || bb == perms,
        s"midpoint above threshold for ($t, $perms) -> ($bb, $rr)")
    }
  }

  test("minhash band join under a 10%-duplicate corpus: exact pairs, no cartesian") {
    withSkewConfs {
      import spark.implicits._
      val hot = 60   // identical docs — every band bucket they hash to holds all 60
      val cold = 540 // unique docs
      val docs = ((0 until hot).map(i => (i.toLong, "the same duplicated document body " +
          "with enough tokens to shingle into a stable signature across all bands")) ++
        (0 until cold).map(i => (hot + i.toLong,
          s"unique document $i with its own drifting content token$i word${i * 7} tail${i * 13}")))
        .toDF("doc_id", "text")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      val got = pairs.collect().length.toLong
      // the 60 identical docs form exactly C(60,2) pairs at jaccard 1.0;
      // unique docs contribute none at θ=0.5
      assert(got == 60L * 59 / 2,
        s"expected ${60 * 59 / 2} hot pairs, got $got")
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"banded candidate join degenerated to a cartesian shape:\n$plan")
    }
  }
}
