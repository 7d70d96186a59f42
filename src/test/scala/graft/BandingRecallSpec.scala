package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Clustering, Dedup, Similarity}

/** The r13 scale-safe-defaults contract: every near-dup entry point sizes
  * its LSH scheme by a RECALL-FLOORED rule rather than a gate-scale
  * constant — capture at the confirm threshold is ≥ 0.99 by construction
  * (not dataset luck: the r12 verdict's recall-cliff item), sub-threshold
  * candidate mass shrinks vs the legacy 32×2 scheme, and SRP depth grows
  * with the corpus. These pins are what keep the 100 TB story honest when
  * a fresh round re-touches the defaults. */
class BandingRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def capture(j: Double, b: Int, r: Int): Double =
    Dedup.captureProbability(j, b, r)

  test("bandingForRecall: capture >= 0.99 at the threshold by construction") {
    // θ=0.5 in the default 128-perm budget: deepest r whose minimal band
    // count meets the floor is 3 (r=4 would need 72 bands = 288 perms)
    assert(Dedup.bandingForRecall(0.5) == (35, 3))
    assert(capture(0.5, 35, 3) >= 0.99)
    // the cliff this replaces: bandingFor's midpoint-at-θ 16×4 captures an
    // AT-threshold pair with probability ~0.64 — oracle equality on one
    // dataset, silent misses on the next
    assert(Dedup.bandingFor(0.5, 64) == (16, 4))
    assert(capture(0.5, 16, 4) < 0.7)
    // and the floor holds across the θ grid, inside the budget, while
    // sub-threshold suppression strictly beats the legacy 32×2 default
    for (t <- Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)) {
      val (b, r) = Dedup.bandingForRecall(t)
      assert(b * r <= 128, s"budget exceeded at θ=$t: ($b, $r)")
      assert(capture(t, b, r) >= 0.99, s"floor broken at θ=$t: ($b, $r)")
    }
    // the scale argument, quantified at θ=0.5: the corpus-dominating low-J
    // mass reaches the exact confirm ~8× less often than under 32×2
    assert(capture(0.1, 35, 3) * 7.9 < capture(0.1, 32, 2))
  }

  test("resolveBanding: explicit pins, (0,0) auto-sizes, mixed rejects") {
    assert(Dedup.resolveBanding(32, 2, 0.5) == (32, 2))
    assert(Dedup.resolveBanding(0, 0, 0.5) == Dedup.bandingForRecall(0.5))
    intercept[IllegalArgumentException](Dedup.resolveBanding(32, 0, 0.5))
    intercept[IllegalArgumentException](Dedup.resolveBanding(0, 2, 0.5))
  }

  test("minhashNearDups default == explicit bandingForRecall scheme") {
    import spark.implicits._
    val docs = ((0 until 6).map(i =>
        (i.toLong, "an identical near duplicate body with plenty of shingle words to band on")) ++
      (0 until 30).map(i => (100 + i.toLong,
        s"unique filler document $i token$i word${i * 3} tail${i * 11} more${i * 7} text")))
      .toDF("doc_id", "text")
    val (b, r) = Dedup.bandingForRecall(0.5)
    val auto = Dedup.minhashNearDups(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val pinned = Dedup.minhashNearDups(docs, "doc_id", "text", bands = b, rowsPerBand = r)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(auto == pinned && auto == (for {
      i <- 0 until 6; j <- 0 until 6 if i < j
    } yield (i.toLong, j.toLong)).toSet)
  }

  test("editDistanceNearDups default banding meets the floor and confirms a planted edit") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("river", "rivers")), // one-char edit, well under 10%
      (3L, "completely unrelated content about catalyst plans and parquet footers galore")
    ).toDF("doc_id", "text")
    val out = Dedup.editDistanceNearDups(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("cosineNearDups auto depth == srpPlanesFor(n), and grows with n") {
    import spark.implicits._
    // srpPlanesFor stays integer-exact at the documented anchors
    assert(Similarity.srpPlanesFor(500) == 3)
    assert(Similarity.srpPlanesFor(2000) == 5)
    val dims = 8
    val vecs = (0 until 700).map { i =>
      (i.toLong, Array.tabulate(dims)(j => (math.sin(i * 0.7 + j * 1.3) * 100).toFloat))
    }.toDF("vec_id", "embedding")
    val auto = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
        threshold = 0.8, dims = dims)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val pinned = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
        threshold = 0.8, dims = dims, planes = Similarity.srpPlanesFor(700))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(auto == pinned, "planes=0 must resolve to srpPlanesFor(corpus count)")
  }

  test("semanticDedup / hybridDedup expose and thread the LSH knobs") {
    import spark.implicits._
    val e = Array.tabulate(8)(i => (i + 1).toFloat)
    def jiggle(eps: Float) = e.zipWithIndex.map { case (x, i) => if (i == 0) x + eps else x }
    val embs = Seq((1L, e), (2L, jiggle(0.01f)), (3L, jiggle(-0.01f)),
      (9L, Array.tabulate(8)(i => if (i % 2 == 0) 9.0f else -9.0f)))
      .toDF("vec_id", "embedding")
    // an explicit planes/tables scheme must reach the pair stage: with the
    // bucket space collapsed to 1 plane × 1 table every vector collides,
    // and the exact confirm still yields the same clusters as auto
    val pinned = Clustering.semanticDedup(embs, "vec_id", "embedding",
        threshold = 0.98, dims = 8, planes = 1, tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val auto = Clustering.semanticDedup(embs, "vec_id", "embedding", threshold = 0.98, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(pinned == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)))
    assert(auto == pinned)
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu"), (9L, "nu xi omicron pi")).toDF("doc_id", "text")
    val hybrid = Clustering.hybridDedup(docs, "doc_id", "text",
        embs, "vec_id", "embedding", cosineThreshold = 0.98,
        bands = 35, rowsPerBand = 3, dims = 8, planes = 1, tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(hybrid == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)))
  }

  test("sparse truth enumeration equals driver-side brute force (n_truth exact)") {
    import spark.implicits._
    // overlapping word chains: doc i shares a sliding window with its
    // neighbors, giving a full spectrum of pairwise Jaccards including
    // exact-threshold and zero-overlap pairs
    val words = (0 until 60).map(i => s"w$i")
    val docs = (0 until 30).map { i =>
      (i.toLong, words.slice(i, i + 12).mkString(" "))
    }.toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"),
        graft.pipeline.Dedup.shingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    def j(a: Set[Long], b: Set[Long]): Double =
      if (a.isEmpty || b.isEmpty) 0.0
      else (a & b).size.toDouble / (a | b).size
    val ids = sets.keys.toSeq.sorted
    val brute = ids.combinations(2)
      .count { case Seq(x, y) => j(sets(x), sets(y)) >= 0.5 }.toLong
    val row = graft.pipeline.Dedup.minhashEval(docs, "doc_id", "text").head()
    assert(row.getAs[Long]("n_truth") == brute,
      s"sparse truth ${row.getAs[Long]("n_truth")} != brute $brute")
    // and the sweep's per-theta truth agrees with exact integer-ppm grains
    val sweep = graft.pipeline.Dedup.minhashEvalSweep(docs, "doc_id", "text",
        thetasPpm = Seq(300000L, 500000L, 700000L))
      .collect().map(r => r.getAs[Long]("theta_ppm") -> r.getAs[Long]("n_truth")).toMap
    def jppm(a: Set[Long], b: Set[Long]): Long =
      if (a.isEmpty || b.isEmpty) 0L
      else (a & b).size.toLong * 1000000L / (a | b).size
    for (t <- Seq(300000L, 500000L, 700000L)) {
      val bt = ids.combinations(2)
        .count { case Seq(x, y) => jppm(sets(x), sets(y)) >= t }.toLong
      assert(sweep(t) == bt, s"theta=$t: sweep ${sweep(t)} != brute $bt")
    }
  }

  test("editDistanceNearDups banded-DP static bound is output-identical to exact") {
    import spark.implicits._
    // The confirm tier bounds the DP with kMax = kb(maxLen), a CONSTANT
    // upper bound of the per-row budget kb(mx) (the Scala levenshtein DSL
    // takes a literal Int threshold). Output identity holds because rows
    // with kb(mx) < dist <= kMax carry exact distances and die at the
    // rel_ppm filter. Plant all three regimes on one 118-char base text at
    // maxDistPpm = 10% — kb(118) = (100001·118−1) div 1e6 = 11:
    //  - doc 2: 5 substitutions  → dist 5,  rel 42372 ppm (under budget)
    //  - doc 3: 11 substitutions → dist 11 == kb(118): the EXACT per-row
    //    boundary must survive the banded DP
    //  - doc 4: 12 substitutions → dist 12, rel 101694 ppm: between
    //    kb(118)=11 and kMax=200 — the DP computes it (no -1), the ppm
    //    filter must drop it
    val base = "alpha beta gamma delta epsil zetaa etaaa theta iotaa kappa " +
      "lambd muuuu nuuuu xiiii omicr piiii rhooo sigma tauuu upsil"
    assert(base.length == 118)
    def sub(s: String, at: Int, n: Int): String =
      s.take(at) + ("#" * n) + s.drop(at + n)
    val docs = Seq(
      (1L, base),
      (2L, sub(base, 30, 5)),
      (3L, sub(base, 60, 11)),
      (4L, sub(base, 60, 12))
    ).toDF("doc_id", "text")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = Map(1L -> base, 2L -> sub(base, 30, 5), 3L -> sub(base, 60, 11),
      4L -> sub(base, 60, 12))
    val p = 100000L
    val brute = (for {
      Seq(x, y) <- texts.keys.toSeq.sorted.combinations(2)
      d = lev(texts(x), texts(y)).toLong
      mx = math.max(texts(x).length, texts(y).length).toLong
      if d * 1000000L / mx <= p
    } yield (x, y, d)).toSet
    val out = Dedup.editDistanceNearDups(docs, "doc_id", "text", maxDistPpm = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // soundness: every emitted pair is exactly a qualifying pair with the
    // exact distance (the banded DP never mangles a kept row)
    assert(out.subsetOf(brute), s"unsound rows: ${out -- brute}")
    // the planted boundary pair (dist == per-row kb) and the under-budget
    // pair must both band (deterministic md5 minhash) and survive
    assert(out.contains((1L, 3L, 11L)), s"boundary dist==kb pair lost: $out")
    assert(out.contains((1L, 2L, 5L)), s"under-budget pair lost: $out")
    // the kb < dist <= kMax regime must be filtered by rel_ppm, not kept
    assert(!out.exists(t => t._1 == 1L && t._2 == 4L), s"over-budget pair kept: $out")
  }

  test("artifact banding scheme is recorded, round-trips, and rejects mismatched updates") {
    import spark.implicits._
    val docs = (0 until 20).map(i =>
      (i.toLong, s"corpus document $i with stable words $i and${i * 3} tail${i * 7}"))
      .toDF("doc_id", "text")
    // builder records its RESOLVED scheme — auto and pinned alike
    val auto = Dedup.buildDedupArtifacts(docs, "doc_id", "text")
    assert(auto.banding.contains(Dedup.bandingForRecall(0.5)))
    val pinned = Dedup.buildDedupArtifacts(docs, "doc_id", "text", bands = 17, rowsPerBand = 4)
    assert(pinned.banding.contains((17, 4)))
    // and the scheme survives the parquet + MANIFEST round trip even when
    // the caller passed no explicit band params at write time
    val dir = java.nio.file.Files.createTempDirectory("graft_band_rt_").toString
    pinned.write(s"$dir/art")
    val back = Dedup.readArtifacts(spark, s"$dir/art")
    assert(back.banding.contains((17, 4)),
      s"scheme lost through write/read: ${back.banding}")
    val batch = Seq((1000L, "a brand new never seen document body"))
      .toDF("doc_id", "text")
    val dec = Dedup.incrementalDedup(batch, back, "doc_id", "text", 3, 17, 4, 0.5)
      .localCheckpoint()
    // update under a MISMATCHED explicit scheme fails fast (silently
    // unioning two band spaces means new docs never match later batches)
    val err = intercept[IllegalArgumentException] {
      Dedup.updateDedupArtifacts(back, batch, dec, "doc_id", "text",
        bands = 32, rowsPerBand = 2)
    }
    assert(err.getMessage.contains("17x4"))
    // the auto sentinel and a MATCHING explicit scheme both follow the
    // recorded banding
    val u1 = Dedup.updateDedupArtifacts(back, batch, dec, "doc_id", "text")
    assert(u1.banding.contains((17, 4)))
    val u2 = Dedup.updateDedupArtifacts(back, batch, dec, "doc_id", "text",
      bands = 17, rowsPerBand = 4)
    assert(u2.banding.contains((17, 4)))
    // streaming admission shares the contract: a mismatched explicit
    // scheme is rejected at plan-construction time, before any trigger
    val sErr = intercept[IllegalArgumentException] {
      graft.streaming.StreamingPipeline.admitStreamNear(
        batch.withColumn("ets", lit(86400L)), back, "doc_id", "text", "ets",
        bands = 32, rowsPerBand = 2)
    }
    assert(sErr.getMessage.contains("17x4"))
    // DECIDING a batch shares the contract too (ADVICE r14 medium): a batch
    // banded 32x2 against 17x4 artifact bands can never collide, so every
    // near-dup would be silently admitted — fail fast instead
    val dErr = intercept[IllegalArgumentException] {
      Dedup.incrementalDedup(batch, back, "doc_id", "text", 3, 32, 2, 0.5)
    }
    assert(dErr.getMessage.contains("17x4"))
    // the auto sentinel resolves to the RECORDED scheme, not the
    // threshold-derived default — identical decisions to the explicit call
    val autoDec = Dedup.incrementalDedup(batch, back, "doc_id", "text", 3, 0, 0, 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(autoDec == dec.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
  }

  test("artifact write rejects a half-explicit band scheme (partial manifest hazard)") {
    import spark.implicits._
    val docs = (0 until 8).map(i => (i.toLong, s"short corpus doc $i body words"))
      .toDF("doc_id", "text")
    val art = Dedup.buildDedupArtifacts(docs, "doc_id", "text", bands = 17, rowsPerBand = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_band_half_").toString
    // passing just one of the pair used to write a PARTIAL-scheme manifest:
    // readArtifacts then yielded banding=None, disabling every downstream
    // scheme-mismatch check (ADVICE r14)
    intercept[IllegalArgumentException] {
      art.write(s"$dir/art", Map("bands" -> 32L))
    }
    intercept[IllegalArgumentException] {
      art.write(s"$dir/art", Map("rowsPerBand" -> 2L))
    }
    // neither explicit key: the recorded scheme backfills the manifest
    art.write(s"$dir/art")
    assert(Dedup.readArtifacts(spark, s"$dir/art").banding.contains((17, 4)))
  }

  test("append epochs: interrupted appends degrade safely, completed retries no-op") {
    import spark.implicits._
    val docs = (0 until 10).map(i =>
      (i.toLong, s"corpus doc $i words alpha$i beta${i * 3} gamma${i * 7}"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_append_epoch_").toString
    Dedup.buildDedupArtifacts(docs, "doc_id", "text", bands = 32, rowsPerBand = 2)
      .write(s"$dir/art")
    assert(Dedup.readArtifactEpoch(spark, s"$dir/art") == 0L)
    assert(Dedup.readArtifacts(spark, s"$dir/art").keysDistinct)
    val batch = Seq((100L, "a brand new never seen document body"))
      .toDF("doc_id", "text")
    val dec = Dedup.incrementalDedup(batch, Dedup.readArtifacts(spark, s"$dir/art"),
      "doc_id", "text", 3, 32, 2, 0.5).localCheckpoint()
    // the production shape: read the epoch when the batch is decided, pass
    // it to the append as the idempotency key
    val epochAtDecide = Dedup.readArtifactEpoch(spark, s"$dir/art")
    Dedup.appendDedupDelta(s"$dir/art", batch, dec, "doc_id", "text", Some(epochAtDecide))
    assert(Dedup.readArtifactEpoch(spark, s"$dir/art") == 1L)
    val keysAfter = spark.read.parquet(s"$dir/art/keys").count()
    // an orchestrator-level retry of the COMPLETED append (ADVICE r17:
    // parquet append is not idempotent) sees the bumped epoch and no-ops —
    // no duplicate ck rows, the distinct-by-construction claim holds
    Dedup.appendDedupDelta(s"$dir/art", batch, dec, "doc_id", "text", Some(epochAtDecide))
    assert(spark.read.parquet(s"$dir/art/keys").count() == keysAfter)
    assert(Dedup.readArtifacts(spark, s"$dir/art").keysDistinct)
    // simulate a crash BETWEEN the table appends: manifest left dirty
    val mPath = java.nio.file.Paths.get(s"$dir/art/MANIFEST.json")
    val m = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
    java.nio.file.Files.write(mPath,
      m.replace("\"dirty\":0", "\"dirty\":1").getBytes("UTF-8"))
    // the rewrite bypassed Hadoop's ChecksumFileSystem — drop its sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/art/.MANIFEST.json.crc")): Unit
    // read-back no longer trusts key distinctness (defensive distinct back
    // on) and further appends refuse until the dir is rebuilt
    assert(!Dedup.readArtifacts(spark, s"$dir/art").keysDistinct)
    val e = intercept[IllegalArgumentException] {
      Dedup.appendDedupDelta(s"$dir/art", batch, dec, "doc_id", "text")
    }
    assert(e.getMessage.contains("interrupted append"))
  }

  test("manifest writes are atomic and torn manifests fail closed") {
    import spark.implicits._
    val docs = (0 until 6).map(i => (i.toLong, s"doc $i alpha$i beta${i * 5} gamma"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_torn_").toString
    Dedup.buildDedupArtifacts(docs, "doc_id", "text", bands = 32, rowsPerBand = 2)
      .write(s"$dir/art")
    // the tmp+rename write never leaves its temp name behind
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/art/MANIFEST.json.tmp")))
    val batch = Seq((50L, "a novel unseen document body here")).toDF("doc_id", "text")
    val dec = Dedup.incrementalDedup(batch,
      Dedup.readArtifacts(spark, s"$dir/art"), "doc_id", "text", 3, 32, 2, 0.5)
      .localCheckpoint()
    // simulate the torn manifest the in-place truncate could leave: keys
    // missing entirely. ADVICE r18: the old getOrElse defaults read this as
    // "clean, epoch 0" — a retry with expectedEpoch=0 then re-appended.
    val mPath = java.nio.file.Paths.get(s"$dir/art/MANIFEST.json")
    java.nio.file.Files.write(mPath, """{"version":1}""".getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/art/.MANIFEST.json.crc")): Unit
    // epoch read refuses (no valid idempotency key from a torn file) …
    val eEpoch = intercept[IllegalArgumentException] {
      Dedup.readArtifactEpoch(spark, s"$dir/art")
    }
    assert(eEpoch.getMessage.contains("appends"))
    // … appends refuse (no silent re-append at a phantom epoch 0) …
    val eApp = intercept[IllegalArgumentException] {
      Dedup.appendDedupDelta(s"$dir/art", batch, dec, "doc_id", "text", Some(0L))
    }
    assert(eApp.getMessage.contains("torn or pre-epoch"))
    // … and read-back drops the distinct-by-construction claim
    assert(!Dedup.readArtifacts(spark, s"$dir/art").keysDistinct)
  }

  test("append lock: concurrent appenders refused, rebuild clears a stale lock") {
    import spark.implicits._
    val docs = (0 until 6).map(i => (i.toLong, s"doc $i alpha$i beta${i * 5} gamma"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_append_lock_").toString
    Dedup.buildDedupArtifacts(docs, "doc_id", "text", bands = 32, rowsPerBand = 2)
      .write(s"$dir/art")
    val batch = Seq((60L, "another brand new document body text")).toDF("doc_id", "text")
    val dec = Dedup.incrementalDedup(batch,
      Dedup.readArtifacts(spark, s"$dir/art"), "doc_id", "text", 3, 32, 2, 0.5)
      .localCheckpoint()
    // a live (or crashed) appender's lock blocks a second appender loudly:
    // expectedEpoch only serializes RETRIES, not concurrent writers, and two
    // interleaved appends would double rows then clear each other's evidence
    val lock = java.nio.file.Paths.get(s"$dir/art/_append.lock")
    java.nio.file.Files.createFile(lock)
    val e = intercept[IllegalArgumentException] {
      Dedup.appendDedupDelta(s"$dir/art", batch, dec, "doc_id", "text")
    }
    assert(e.getMessage.contains("locked by another appender"))
    // the refused call must not have deleted the holder's lock
    assert(java.nio.file.Files.exists(lock))
    // a rebuild resets the dir wholesale — stale lock cleared, epoch 0
    Dedup.buildDedupArtifacts(docs, "doc_id", "text", bands = 32, rowsPerBand = 2)
      .write(s"$dir/art")
    assert(!java.nio.file.Files.exists(lock))
    Dedup.appendDedupDelta(s"$dir/art", batch, dec, "doc_id", "text")
    assert(Dedup.readArtifactEpoch(spark, s"$dir/art") == 1L)
    // the lock is released after a successful append
    assert(!java.nio.file.Files.exists(lock))
  }

  test("minhashEval enforces its O(n²) truth bound in-function") {
    import spark.implicits._
    val docs = (0 until 12).map(i =>
      (i.toLong, s"document $i with some words to shingle across the corpus"))
      .toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Dedup.minhashEval(docs, "doc_id", "text", maxTruthRows = 10L).collect()
    }
    assert(err.getMessage.contains("maxTruthRows"))
    // at or under the bound it runs — and the sweep shares the contract
    assert(Dedup.minhashEval(docs, "doc_id", "text", maxTruthRows = 12L).count() == 1L)
    intercept[IllegalArgumentException] {
      Dedup.minhashEvalSweep(docs, "doc_id", "text", maxTruthRows = 10L).collect()
    }
  }
}
