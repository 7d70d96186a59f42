package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — times every SparkEntry query at the configured scale
  * factor and prints ONE JSON line for the driver.
  *
  * A warmup pass (flagship entry + one trivial job) separates JVM/session
  * startup and parquet footer reads from the per-query numbers, which is
  * what a long-running engine would amortize anyway.
  *
  * `calibration_s` is a fixed-work single-thread CPU measurement (a
  * deterministic spin) emitted with every run: on an idle host it is ~flat,
  * so a contended run — which has distorted the recorded totals in BOTH
  * prior rounds (660s/756s recorded vs 33s/54s clean re-runs) — is
  * machine-detectable by comparing calibration values across runs.
  */
object Bench {

  /** Fixed-work spin: ~0.2-0.4 s single-threaded on an idle core. The value
    * is data-dependent enough that the JIT can't elide the loop. */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var acc = 1469598103934665603L
    var i = 0
    while (i < 200000000) { acc = (acc ^ i) * 1099511628211L; i += 1 }
    if (acc == 42L) println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /** The same spin on `n` threads at once — the per-core rate under full
    * subscription, reported as (MEDIAN, max) thread seconds. The gate
    * statistic is the MEDIAN (r18): the max-of-n used through r17 has a
    * structural one-sided noise tail — a single thread of 32 delayed by a
    * G1 background cycle or an OS scheduling hiccup inflates it with no
    * host contention at all. Measured on this host: inside a working
    * Spark JVM the max reads 1.18–1.33× the 1-thread probe between clean
    * query runs while the median holds 1.00–1.02×; under a genuine
    * 12-core-stealing neighbor the median jumps to 1.47–1.70× (the OS
    * time-slices ALL threads, so real core theft cannot hide from the
    * median) while the 1-thread probe stays flat. Median separation is
    * therefore clean ≤1.04× vs theft ≥1.47× — the drift the r17 close
    * chased (a 1.4× composite at flat 1-thread calibration) is caught
    * with margin, and the max's GC tail no longer flags clean runs. The
    * max is still recorded per probe for audit. */
  private def calibrateMT(n: Int): (Double, Double) = {
    val times = new Array[Long](n)
    val ts = (0 until n).map { me =>
      val t = new Thread(() => {
        val s = System.nanoTime()
        var acc = 1469598103934665603L
        var i = 0
        while (i < 200000000) { acc = (acc ^ i) * 1099511628211L; i += 1 }
        if (acc == 42L) println("")
        times(me) = System.nanoTime() - s
      })
      t.start(); t
    }
    ts.foreach(_.join())
    val sorted = times.sorted
    (sorted(n / 2) / 1e9, sorted(n - 1) / 1e9)
  }

  /** Checkpoint/artifact-writing gates: their cost is n_fsync × host fsync
    * latency on top of CPU, and that latency is the one axis no CPU probe
    * sees (VERDICT r18: same code, same day — q_remember_show_seq 5.6 s
    * pristine vs 11–19 s degraded-IO). Each gets an [[ioProbe]] bracket
    * around its run in BOTH passes, emitted as `io_brackets` for the
    * watchline tools. */
  private val IoGates = Set(
    "q_stream_admit", "q_stream_admit_near", "q_stream_av_admit",
    "q_stream_audio_admit", "q_stream_embed_admit",
    "q_remember_show", "q_remember_show_agg",
    "q_remember_show_seq", "q_remember_show_seq_delta",
    "q_dedup_incremental", "q_dedup_incr_update")

  /** Fixed-work IO probe: 32 small files, each create+write(16 KB)+fsync+
    * atomic-rename — the exact per-file discipline Structured Streaming
    * checkpoints and the Materializer/dedup-artifact writers pay — into a
    * fresh temp dir on the same filesystem the gates write
    * (java.io.tmpdir; this host mounts one ext4 for everything). Returns
    * the MEDIAN per-file latency in MILLISECONDS (median, not total, for
    * the same reason as calibrateMT: a single journal-flush tail must not
    * flag a clean window). Measured on this host (r19): 0.38–0.94 ms
    * inside a working Spark JVM in windows where q_stream_admit ran
    * 3.5–4.4 s; ≥2 ms in the windows where it ran 4.8–5.7 s; idle-shell
    * drift reaches 17 ms within a single minute — which is why brackets
    * are per-GATE, not per-pass (the axis moves faster than a 6-minute
    * pass). Cost: ~16 ms clean, ~0.6 s in the degraded windows it exists
    * to flag. */
  private[graft] def ioProbe(): Double = {
    val dir = java.nio.file.Files.createTempDirectory("graft_io_probe_")
    val payload = Array.tabulate[Byte](16384)(i => (i * 31).toByte)
    val lats = new Array[Long](32)
    var f = 0
    while (f < 32) {
      val tmp = dir.resolve(s"p$f.tmp")
      val t0 = System.nanoTime()
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      try { ch.write(java.nio.ByteBuffer.wrap(payload)); ch.force(true) }
      finally ch.close()
      java.nio.file.Files.move(tmp, dir.resolve(s"p$f"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      lats(f) = System.nanoTime() - t0
      f += 1
    }
    var i = 0
    while (i < 32) { java.nio.file.Files.delete(dir.resolve(s"p$i")); i += 1 }
    java.nio.file.Files.delete(dir)
    val sorted = lats.sorted
    sorted(16) / 1e6
  }

  /** Write `content` to `<base>.json` with CREATE_NEW semantics — never
    * truncates an existing file; on collision falls to `<base>-1.json`,
    * `<base>-2.json`, … Returns the path actually written (or the intended
    * one if even the guarded write failed — callers treat the name as a
    * pointer, not a promise). Recorded bench tables are append-only
    * history; nothing in this process may destroy one (VERDICT r15 #5). */
  private[graft] def writeOnce(base: String, content: String): String = {
    var path = s"$base.json"
    var i = 0
    var done = false
    while (!done && i < 1000) {
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(path),
          (content + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        done = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          i += 1; path = s"$base-$i.json"
        case _: java.io.IOException => done = true // unwritable dir: keep benching
      }
    }
    path
  }

  /** Overwrite `path` via tmp + ATOMIC_MOVE — never an in-place open: an
    * outside harness was found replacing BENCH_FULL_LATEST.json with a
    * SYMLINK to a stamped artifact, and a direct PrintWriter write
    * followed the link and clobbered the recorded table (the r15
    * clobber's actual mechanism, diagnosed r16). A move replaces the link
    * ITSELF with a regular file; the link's former target is untouchable
    * by this path. The TMP write is equally guarded (ADVICE r16): its name
    * is predictable, so the same adversary could plant `…json.tmp` as a
    * symlink to a stamped artifact and a default-options write would
    * clobber THROUGH the link. `deleteIfExists` removes a link without
    * following it, and CREATE_NEW then refuses to open anything that still
    * exists — no code path here ever writes through a pre-existing name.
    * The tmp is deleted on any failure (it used to leak when the move
    * failed). Failures are swallowed (Try) — an unwritable pointer must
    * not fail the bench. Returns true when the write landed. */
  private[graft] def atomicReplace(path: String, content: String): Boolean = {
    val p = java.nio.file.Paths.get(path)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    val ok = scala.util.Try {
      java.nio.file.Files.deleteIfExists(tmp): Unit
      java.nio.file.Files.write(tmp, (content + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }.isSuccess
    if (!ok) scala.util.Try(java.nio.file.Files.deleteIfExists(tmp)): Unit
    ok
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // no-fork local fs: without libhadoop every created file/dir shells
      // out a chmod (fork+exec of this 16 GB JVM) — see
      // graft.fs.NioLocalFileSystem; scheme-scoped, identical semantics
      .config("spark.hadoop.fs.file.impl", classOf[graft.fs.NioLocalFileSystem].getName)
      // whole-stage-codegen class cache sized for the suite: the default
      // 100-entry LRU thrashes under 266 distinct queries (~15 codegen
      // units each), so every repeat execution re-runs Janino on every
      // unit — measured 430 recompiles per 30-query pass at ~15 ms each,
      // ~0.25 s/query of pure driver compile on EVERY pass. 8192 entries
      // hold the full suite (one driver-side cache; scale-independent).
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM + codegen + file index (also primes the calibration JIT)
    calibrate()
    try { SparkEntry.entry(spark).count(); () } catch { case _: Throwable => () }

    // Contention defenses, layered (r1-r4 recorded totals were distorted
    // 2-10× by host contention the judge's clean re-runs did not see):
    //  1. Interleaved calibration probes localize BURSTY contention — when
    //     the probe after a query exceeds 1.5× the best probe seen, the
    //     query re-runs once and the better time is kept.
    //  2. TWO full passes with per-query MINIMA defeat UNIFORM contention
    //     (every probe elevated, so burst detection never fires — the r5
    //     failure mode): a query's minimum over passes run minutes apart is
    //     far more robust than any single lap.
    //  3. REPLACEMENT passes (r20, VERDICT r19 #1): a pass whose bracketing
    //     probes flag it dirty no longer refuses the whole run — up to two
    //     extra passes run until TWO clean passes exist, and the composite
    //     is the per-query minimum over the CLEAN passes only. The refusal
    //     (`contended_do_not_compare`) now fires only when four passes
    //     cannot produce two clean ones: three consecutive driver runs
    //     (r18 32c, r19 32c, r19 8c) were refused outright and left PERF
    //     empty two rounds running — an honest flag, but a failed contract.
    // `calibration` reports probe min/max/mean, the retry count, and all
    // pass totals, so a run where even the minima are contended stays
    // machine-detectable.
    val cals = scala.collection.mutable.ArrayBuffer(calibrate())
    var baseCal = cals.head
    var retried = 0
    // full-subscription probes bracket every pass (start / between / end;
    // ~0.35 s each — cheap enough per pass, too costly to interleave per
    // query); probe i and probe i+1 bracket pass i
    val nCores = cpus.toInt
    val calsMT = scala.collection.mutable.ArrayBuffer(calibrateMT(nCores))
    // Run-level fsync-latency probes bracket the passes like the mt
    // probes do (start / between / end) — audit record of the run's
    // overall IO weather. The per-GATE brackets below are the actual
    // certification instrument: the IO axis was measured drifting
    // 0.4→17 ms within one minute on an idle host, faster than any
    // pass-level bracket can certify.
    val iosRun = scala.collection.mutable.ArrayBuffer(ioProbe())
    // io_brackets: gate -> per-pass (before, after) median-ms pairs
    val ioBrackets = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[(Double, Double)]]()
    // 1-thread probes recorded DURING each pass, so a probe spike can be
    // attributed to the pass it happened in (dirty-pass marker, not a
    // run-wide refusal)
    val calsByPass = scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.ArrayBuffer[Double]]()
    def pass(): Seq[(String, Double)] = {
      val myCals = scala.collection.mutable.ArrayBuffer[Double]()
      calsByPass += myCals
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val ioBefore = if (IoGates(name)) ioProbe() else -1.0
        def run(): Double = {
          val t0 = System.nanoTime()
          // a FAILED query must never record a (deceptively fast) wall
          // time: a mid-run environment fault once poisoned the per-query
          // minima with near-zero "timings" of exception paths. Infinity
          // loses every min() against a real measurement and is reported
          // as failed if no pass succeeded.
          val t = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
            catch { case _: Throwable => Double.PositiveInfinity }
          // the Projections caller contract: the query's result is fully
          // consumed, so release its pinned projections OUTSIDE the timed
          // window. 532 query runs in one JVM otherwise accumulate every
          // persisted projection (strong refs by design); the r16 sweep
          // measured late-suite queries degrading up to 10× under the
          // resulting storage-memory pressure (pass2 of q_video_scenes
          // 1.3 → 11.1 s in a 24-gate JVM).
          // COMPARABILITY BREAK (judge r16 A/B, same JVM, interleaved
          // modes: no-release 26.2 s vs with-release 34–35 s on the 8
          // most-affected gates): rebuilt plans DO re-hit CacheManager's
          // plan-equality cache, so before this release() landed (≤ r15),
          // projection-sharing families (dedup shingles, streaming admit,
          // media decode) were flattered ~1.3–2× by cross-query/cross-pass
          // cache reuse. Releasing is the intended regime — each query
          // pays its honest standalone cost — but r16+ composites are NOT
          // comparable with ≤ r15 history on those families, and the
          // watchlines are derived from the honest regime only
          // (tools/watchlines.json, docs/PLANS.md "Bench regimes").
          graft.pipeline.Projections.release(): Unit
          t
        }
        var t = run()
        val c = calibrate()
        cals += c; myCals += c
        baseCal = math.min(baseCal, c)
        if (c > baseCal * 1.5) { // host was busy while this query ran
          retried += 1
          t = math.min(t, run())
          val c2 = calibrate(); cals += c2; myCals += c2
          baseCal = math.min(baseCal, c2)
        }
        if (IoGates(name)) {
          // the after-probe closes the bracket AROUND everything that
          // could have produced this pass's recorded value (including a
          // contention retry) — a clean bracket certifies the whole window
          ioBrackets.getOrElseUpdate(name,
            scala.collection.mutable.ArrayBuffer()) += ((ioBefore, ioProbe()))
        }
        name -> t
      }
    }
    val passes = scala.collection.mutable.ArrayBuffer[Seq[(String, Double)]]()
    var mtRetried = 0
    // boundary mt probe with one retry: a SINGLE probe is noisy (the first
    // r20 4-pass run read 0.531 right after a 449 s contended pass1 —
    // tainting the clean 180 s pass2 — and 0.370 vs a 0.369 threshold after
    // a clean 178 s pass4), and one transient spike at a boundary dirties
    // TWO passes. A second probe ~1 s later separates a transient (clean on
    // retry → keep the better reading) from a genuine epoch (elevated on
    // both). Mirrors the per-query burst retry.
    def mtProbe(): (Double, Double) = {
      val p1 = calibrateMT(nCores)
      if (p1._1 <= 1.35 * cals.min) p1
      else {
        mtRetried += 1
        Thread.sleep(1000)
        val p2 = calibrateMT(nCores)
        if (p2._1 < p1._1) p2 else p1
      }
    }
    def runPass(): Unit = {
      passes += pass()
      iosRun += ioProbe()
      calsMT += mtProbe()
    }
    // Pass-level cleanliness (r18, extended r20): mt probes bracket every
    // pass, so pass i is clean when BOTH its bracketing median probes are
    // within 1.35× the best single-thread probe (see calibrateMT: clean
    // ≤1.04×, 12-core theft ≥1.47× on this host) AND no single-thread
    // probe recorded during the pass spiked past 3× the run's probe mean
    // (the r10 burst signature, previously a run-wide refusal, now
    // attributed to the pass it happened in). On a host that throws a
    // transient epoch most runs, a fully clean multi-pass run is rare but
    // a clean single pass is common; replacement passes + clean-pass
    // minima turn that into a comparable composite instead of a refusal.
    def mtBracketClean(i: Int): Boolean =
      calsMT(i)._1 <= 1.35 * cals.min && calsMT(i + 1)._1 <= 1.35 * cals.min
    def spiked(i: Int): Boolean = {
      val m = cals.sum / cals.size
      calsByPass(i).nonEmpty && calsByPass(i).max > 3.0 * m
    }
    def cleanNow: IndexedSeq[Boolean] =
      passes.indices.map(i => mtBracketClean(i) && !spiked(i))
    runPass(); runPass()
    val maxPasses = 4
    while (passes.size < maxPasses && cleanNow.count(identity) < 2) runPass()
    val passClean = cleanNow
    val cleanIdx = passClean.zipWithIndex.collect { case (true, i) => i }
    // the composite's inputs: clean passes when two or more exist (the
    // normal case, possibly via replacement passes); otherwise every pass,
    // with the run refused as contended below
    val useIdx: IndexedSeq[Int] =
      if (cleanIdx.size >= 2) cleanIdx.toIndexedSeq else passes.indices
    val qNames = passes.head.map(_._1)
    val perPass: IndexedSeq[IndexedSeq[Double]] =
      passes.map(_.map(_._2).toIndexedSeq).toIndexedSeq
    // per-query minimum over the used passes; a query that failed in every
    // used pass falls back to its minimum over ALL passes (an inflated but
    // real measurement beats a -1), and only an all-pass failure counts as
    // failed
    val rawResults = qNames.zipWithIndex.map { case (k, qi) =>
      val used = useIdx.map(pi => perPass(pi)(qi)).min
      k -> (if (used.isInfinite) passes.indices.map(pi => perPass(pi)(qi)).min
            else used)
    }
    // provenance: 1-based index of the pass each recorded minimum came from
    val passSrcIdx = qNames.zipWithIndex.map { case (k, qi) =>
      val v = rawResults(qi)._2
      val src = passes.indices.find(pi => perPass(pi)(qi) == v).getOrElse(0)
      k -> (src + 1)
    }
    val failed = rawResults.collect { case (k, v) if v.isInfinite => k }
    val results = rawResults.map { case (k, v) => k -> (if (v.isInfinite) -1.0 else v) }
    // `value` is a best-of composite (sum of per-query minima across the
    // clean passes) — it corresponds to no single measured run.
    // `best_pass_total` is the fastest single pass as actually measured;
    // `total_kind` labels the composite so a reader of `value` alone is not
    // misled.
    def finiteSum(xs: Seq[(String, Double)]): Double =
      xs.collect { case (_, v) if !v.isInfinite && v >= 0 => v }.sum
    val total = finiteSum(results)
    val bestPass = passes.map(p => finiteSum(p)).min
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // the mean used for host-rate normalization (tools/check_watchlines.py
    // divides by it) comes from the probes of the passes that PRODUCED the
    // composite: averaging in a dirty replaced pass's inflated probes would
    // shrink every normalized value and launder regressions. `mean_all`
    // keeps the whole-run mean for audit.
    val calMeanAll = cals.sum / cals.size
    val cleanCals =
      if (cleanIdx.size >= 2) cleanIdx.flatMap(calsByPass(_)) else cals.toSeq
    val calMean = if (cleanCals.nonEmpty) cleanCals.sum / cleanCals.size else calMeanAll
    val mtMeds = calsMT.map(_._1)
    val mtMaxes = calsMT.map(_._2)
    val mtMedMean = mtMeds.sum / mtMeds.size
    // epoch flag (VERDICT r17 #5): any probe past the bracket threshold —
    // audit signal that at least one pass window was dirty (with ≥2 clean
    // passes the composite is still full-sample; tools judge via
    // pass_clean)
    val mtEpoch = mtMeds.exists(_ > 1.35 * cals.min)
    val calStats = s"""{"min":${r3(cals.min)},"max":${r3(cals.max)},""" +
      s""""mean":${r3(calMean)},"mean_all":${r3(calMeanAll)},""" +
      s""""retried":$retried,"mt_retried":$mtRetried,""" +
      s""""mt_med":[${mtMeds.map(r3).mkString(",")}],""" +
      s""""mt_med_mean":${r3(mtMedMean)},""" +
      s""""mt":[${mtMaxes.map(r3).mkString(",")}],""" +
      s""""mt_mean":${r3(mtMaxes.sum / mtMaxes.size)},""" +
      s""""mt_max":${r3(mtMaxes.max)},"mt_epoch":$mtEpoch,""" +
      s""""io_med_ms":[${iosRun.map(r3).mkString(",")}],""" +
      s""""pass_totals":[${passes.map(p => r3(p.map(_._2).sum)).mkString(",")}]}"""
    // Contention refusal, r20 semantics: refused ONLY when four passes
    // could not produce two clean ones. The former run-wide triggers (probe
    // spike > 3× mean, r10; mt-median drift > 1.4×, r17) are now per-pass
    // dirty markers feeding the replacement loop — their evidence is
    // recorded (calibration stats, pass_clean) but a run with two
    // probe-certified clean passes is comparable regardless of what
    // happened in the passes that were replaced.
    val contended = cleanIdx.size < 2
    val totalKind =
      if (contended) "contended_do_not_compare" else "per_query_min_composite"

    // Full-precision line: printed FIRST (it survives in full logs) and
    // persisted to BENCH_FULL.json in the working directory, because the
    // driver records only the last 2000 chars of stdout — every prior
    // round's full line exceeded that cap and arrived truncated mid-JSON
    // (BENCH_r01–r07 all have parsed:null).
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query pass provenance (VERDICT r17 #5): which pass each recorded
    // minimum came from (1-based over ALL passes run), so the composite is
    // auditable query by query against pass_clean
    val passSrc = passSrcIdx.map { case (k, i) => "\"" + k + "\":" + i }
      .mkString("{", ",", "}")
    def passJson(p: Seq[(String, Double)]): String =
      p.map { case (k, v) =>
        "\"" + k + "\":" + (if (v.isInfinite) -1.0 else v) }
        .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-gate fsync-latency brackets (median ms before/after the gate, per
    // pass): the IO-axis certification record. tools/check_watchlines.py
    // judges an IO gate against its TIGHT line only when the bracket around
    // the pass that contributed the recorded minimum (per pass_src) is
    // clean (max side ≤ IO_CLEAN_MS), and derive_watchlines.py seeds tight
    // lines from certified brackets only. pass1_queries/pass2_queries stay
    // AUDIT-ONLY for derivation: cold pass-1 values are systematically
    // higher, so consuming them as threshold inputs would loosen lines.
    val ioJson = ioBrackets.map { case (k, bs) =>
      "\"" + k + "\":" + bs.map { case (b, a) => s"[${r3(b)},${r3(a)}]" }
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""total_kind":"$totalKind","contended":$contended,""" +
      s""""best_pass_total":$bestPass,""" +
      s""""n_passes":${passes.size},""" +
      s""""clean_passes":[${cleanIdx.map(_ + 1).mkString(",")}],""" +
      s""""failed_queries":$failedJson,"queries":$fullQs,""" +
      s""""pass_src":$passSrc,""" +
      s""""pass_clean":[${passClean.mkString(",")}],""" +
      s""""io_brackets":$ioJson,""" +
      s""""pass1_queries":${passJson(passes(0))},""" +
      s""""pass2_queries":${passJson(passes(1))},""" +
      s""""pass_queries":[${passes.map(passJson).mkString(",")}],""" +
      s""""calibration_s":${cals.max},"calibration":$calStats,"sf":"$sfDir"}"""
    println(fullLine)
    // Never clobber a previously recorded full table: every run writes a
    // timestamp-stamped file under bench/ (kept out of the repo root), and
    // the unstamped BENCH_FULL.json convenience name is only created when
    // absent (a judge's believability re-run must not destroy the round's
    // recorded data — it did in r8). Stamped names are WRITE-ONCE with
    // CREATE_NEW semantics (VERDICT r15 #5: an outside harness clobbered a
    // recorded table; now even a same-second or same-name collision lands
    // in a fresh -N file and an existing artifact can never be truncated).
    new java.io.File("bench").mkdirs()
    val stamped = writeOnce(
      s"bench/BENCH_FULL_${System.currentTimeMillis / 1000}", fullLine)
    def writeFull(path: String): Unit =
      { atomicReplace(path, fullLine): Unit }
    if (!new java.io.File("bench/BENCH_FULL.json").exists()) writeFull("bench/BENCH_FULL.json")
    // deterministic "latest" pointer, overwritten each run — ONE JSON
    // document (the r14 sprawl had a hand-concatenated LATEST that broke
    // naive json.load; the stamped history files remain the archive)
    writeFull("bench/BENCH_FULL_LATEST.json")

    // Compact FINAL line, kept under the 2000-char tail budget so the driver
    // can actually parse it: summary stats plus per-query timings (3 dp,
    // slowest first — the queries that matter for drift tracking) until the
    // budget is reached; the remainder is counted, not silently dropped, and
    // lives in full in BENCH_FULL.json / the earlier stdout line.
    val budget = 1880
    val head = s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""total_kind":"$totalKind","contended":$contended,""" +
      s""""best_pass_total":${r3(bestPass)},""" +
      s""""n_passes":${passes.size},""" +
      s""""clean_passes":[${cleanIdx.map(_ + 1).mkString(",")}],""" +
      s""""n_queries":${results.size},"n_failed":${failed.size},""" +
      s""""calibration_s":${r3(cals.max)},""" +
      s""""calibration":$calStats,"sf":"$sfDir",""" +
      s""""queries_full":"$stamped","queries":{"""
    val entries = results.sortBy(-_._2).map { case (k, v) => "\"" + k + "\":" + r3(v) }
    val kept = new StringBuilder(head)
    var nKept = 0
    val tailReserve = 40 // "},"queries_omitted":NNN}" + slack
    entries.foreach { e =>
      val sep = if (nKept == 0) 0 else 1
      if (kept.length + sep + e.length + tailReserve <= budget) {
        if (nKept > 0) kept.append(',')
        kept.append(e); nKept += 1
      }
    }
    kept.append(s"""},"queries_omitted":${results.size - nKept}}""")
    println(kept.toString)
    spark.stop()
  }
}
