package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data sketches — the approximate siblings of the engine's
  * exact aggregates, for the cardinalities where exact is no longer an
  * option at 100 TB:
  *
  *  - KMV (k-minimum-values / bottom-k): distinct-count estimation and
  *    set-overlap (Jaccard / intersection) estimation between corpora.
  *    The approximate sibling of `COUNT UNIQUE` (reference
  *    sneldb `src/command/handlers/query/aggregation.rs` — exact
  *    distinct), and the corpus-overlap question ("how much of crawl
  *    snapshot B is already in A") that no exact operator answers without
  *    a corpus×corpus join.
  *  - Count-Min: frequency estimation / heavy hitters from a bounded
  *    (depth × width) counter table, mergeable map-side.
  *  - Bloom-filter probe: build-side key set folded to an m-bit bitmask,
  *    broadcast as a literal, probe side filtered by a pure codegen'd
  *    bit test — the manual spelling of Spark's own runtime bloom-join
  *    pruning, with deterministic hashes.
  *
  * Every hash is md5-based ([[Hashing]]) so an independent SQL engine
  * reproduces each sketch BIT-FOR-BIT: the estimates are deterministic
  * functions of the input set, not of partitioning, row order, or RNG —
  * the DuckDB oracles replicate the exact estimator formulas.
  *
  * 100 TB design: KMV partial state is ≤ k longs per (group, partition)
  * ([[graft.functions.BottomKLongs]]); Count-Min counters collapse to
  * depth×width rows under ordinary partial aggregation; the bloom mask is
  * bounded by m bits regardless of build cardinality (the one driver
  * collect is ≤ m distinct positions — the same bounded-broadcast shape
  * as Spark's InSubquery/bloom runtime filters).
  */
object Sketches {
  import Hashing.md5Long
  import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}

  /** Hash space of [[Hashing.md5Long]]: [0, 2^60). */
  val HashSpace: Long = 1L << 60

  /** Bounded "k smallest distinct hashes" aggregate column (ascending
    * `array<bigint>`, length ≤ k). */
  def bottomK(c: Column, k: Int): Column =
    columnOf(graft.functions.BottomKLongs(expressionOf(c), k).toAggregateExpression())

  /** Integral floor division returning BIGINT (Spark's `div`). */
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** KMV distinct-count estimate from a bottom-k sketch array: exact size
    * when the sketch is exhaustive (|sketch| < k), else
    * `floor((k-1) * 2^60 / kth_smallest_hash)` — computed in decimal so the
    * (k-1)·2^60 numerator cannot overflow an i64. */
  def kmvEstimate(sk: Column, k: Int): Column = {
    val num = lit(new java.math.BigDecimal(
      java.math.BigInteger.valueOf(k - 1).multiply(java.math.BigInteger.valueOf(HashSpace))))
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(idiv(num, greatest(element_at(sk, k), lit(1L))))
  }

  /** The same estimator as a DuckDB SQL fragment over a sorted-distinct
    * list column `skExpr` (HUGEINT keeps the numerator exact). */
  def duckKmvEstimate(skExpr: String, k: Int): String = {
    val num = (BigInt(k - 1) * BigInt(HashSpace)).toString
    s"""CASE WHEN len($skExpr) < $k THEN CAST(len($skExpr) AS BIGINT)
       |ELSE CAST((CAST('$num' AS HUGEINT)) // greatest(($skExpr)[$k], 1) AS BIGINT) END""".stripMargin
  }

  /** Per-group approximate distinct count of `value` via a k-minimum-values
    * sketch. ONE hash-partial aggregation; the exchange carries ≤ k longs
    * per (group, partition) — never the distinct values themselves (the
    * exact spelling's expand + regrouping).
    *
    * Output: group, `sketch_size`, `kth_hash` (the sketch's threshold; 0
    * for an empty group), `est_distinct`.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column, k: Int): DataFrame =
    df.groupBy(groupCol)
      .agg(bottomK(md5Long(value), k).as("sk"))
      .select(col(groupCol),
        size(col("sk")).cast("long").as("sketch_size"),
        when(size(col("sk")) === 0, 0L)
          .otherwise(element_at(col("sk"), least(size(col("sk")), lit(k)))).as("kth_hash"),
        kmvEstimate(col("sk"), k).as("est_distinct"))

  /** Set-overlap estimation between two value sets A and B (rows where
    * `isA` / `isB`; a row may belong to both) from their KMV sketches:
    * the bottom-k of A∪B is derivable from the two sketches alone, and the
    * fraction of those union-survivors present in BOTH sketches estimates
    * the Jaccard similarity (Beyer et al., "On Synopses for Distinct-Value
    * Estimation Under Multiset Operations", SIGMOD'07).
    *
    * ONE global aggregation over one scan (both sketches built
    * side-by-side via null-ignoring conditional inputs — no self-join, no
    * second pass); the overlap math is a pure projection over two k-sized
    * arrays.
    *
    * Output (single row, all BIGINT): `sketch_a`, `sketch_b` (sketch
    * sizes), `matches` (union-survivors in both), `union_est`,
    * `jaccard_ppm`, `inter_est`.
    */
  def kmvOverlap(df: DataFrame, isA: Column, isB: Column, value: Column, k: Int): DataFrame = {
    val h = md5Long(value)
    val merged = slice(array_sort(array_union(col("ska"), col("skb"))), 1, k)
    df.agg(
        bottomK(when(isA, h), k).as("ska"),
        bottomK(when(isB, h), k).as("skb"))
      .select(col("ska"), col("skb"), merged.as("mk"))
      .select(col("ska"), col("skb"), col("mk"),
        size(filter(col("mk"),
          x => array_contains(col("ska"), x) && array_contains(col("skb"), x)))
          .cast("long").as("matches"),
        kmvEstimate(col("mk"), k).as("union_est"),
        greatest(size(col("mk")).cast("long"), lit(1L)).as("kp"))
      .select(
        size(col("ska")).cast("long").as("sketch_a"),
        size(col("skb")).cast("long").as("sketch_b"),
        col("matches"),
        col("union_est"),
        idiv(col("matches") * lit(1000000L), col("kp")).as("jaccard_ppm"),
        idiv(col("matches") * col("union_est"), col("kp")).as("inter_est"))
  }

  /** Estimate from a MERGED set of bottom-k sketches (an
    * `array<array<bigint>>` column) — the sketch ROLLUP property: the k
    * smallest hashes of a union are all among each part's k smallest, so
    * bottom-k(union of bottom-ks) EQUALS bottom-k(union) and a weekly
    * distinct count derived from persisted daily sketches is EXACTLY the
    * directly-computed weekly sketch. Pre-aggregate once, roll up to any
    * coarser grain without rescanning — the entire point of sketch
    * storage at 100 TB. */
  def kmvMergeEstimate(skArrays: Column, k: Int): Column =
    kmvEstimate(slice(array_sort(array_distinct(flatten(skArrays))), 1, k), k)

  // ---------------- histogram quantiles ----------------

  /** Fixed-bin histogram quantile estimation — the mergeable bounded-state
    * sibling of [[EventAnalytics.valuePercentiles]]' exact interpolation:
    * at 100 TB an exact per-group percentile needs the group's full sorted
    * value set somewhere; the histogram needs `bins` counters, merged by
    * addition (= ordinary partial aggregation), at the cost of quantizing
    * each estimate to a bin edge.
    *
    * `value` must already be an integral column; values are clamped into
    * `[lo, hi)` and binned equi-width. The q-th percentile estimate is the
    * UPPER EDGE of the first bin whose cumulative count reaches
    * `ceil(n·q/100)` — all-integer, so the oracle reproduces it exactly.
    *
    * Two bounded aggregations: (group, bin) counts (≤ bins rows per group
    * exchanged), then a per-group fold over the ≤ bins-entry histogram
    * array — the cumulative walk is a codegen'd `aggregate` lambda, never
    * a window over data rows.
    *
    * Output: group, `n`, and one `p{q}_est` column per requested q.
    */
  def histogramQuantiles(df: DataFrame, groupCol: String, value: Column,
      lo: Long, hi: Long, bins: Int, qs: Seq[Int]): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(bins > 0 && bins <= 4096, s"bins must be in 1..4096, got $bins")
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100), s"quantiles must be in 1..100: $qs")
    val width = hi - lo
    val bin = least(lit(bins - 1L),
      greatest(lit(0L), idiv((value.cast("long") - lit(lo)) * lit(bins.toLong), lit(width))))
    val hist = df.groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(groupCol)
      .agg(sort_array(collect_list(struct(col("bin"), col("cnt")))).as("h"),
        sum(col("cnt")).as("n"))
    val qCols = qs.map { q =>
      // first bin whose cumulative count reaches ceil(n*q/100), as a fold
      // over the ≤ bins histogram entries; -1 can only remain if n = 0
      val target = s"(n * $q + 99) div 100"
      val found = expr(
        s"""aggregate(h, named_struct('c', 0L, 'f', -1L),
           |  (acc, s) -> named_struct(
           |    'c', acc.c + s.cnt,
           |    'f', CASE WHEN acc.f >= 0 THEN acc.f
           |              WHEN acc.c + s.cnt >= $target THEN s.bin
           |              ELSE -1L END)).f""".stripMargin)
      (lit(lo) + idiv((found + 1) * lit(width), lit(bins.toLong))).as(s"p${q}_est")
    }
    hist.select(col(groupCol) +: col("n") +: qCols: _*)
  }

  // ---------------- Count-Min ----------------

  /** Count-Min counter table over `value` occurrences: `depth` salted
    * md5 hashes into `width` buckets. The explode(j) multiplies map work
    * ×depth but ordinary partial aggregation collapses the exchange to at
    * most depth×width counter rows — the sketch IS the aggregation state.
    * Output: (j, bucket, c). */
  def cmsCounters(df: DataFrame, value: Column, depth: Int, width: Int): DataFrame =
    df.select(value.as("_v"),
        explode(array((0 until depth).map(lit): _*)).as("j"))
      .select(col("j"),
        pmod(md5Long(concat(lit("cms"), col("j").cast("string"), lit("|"), col("_v"))),
          lit(width.toLong)).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))

  /** Point-estimate the frequency of each candidate value from a Count-Min
    * counter table: `min` over the candidate's depth buckets. The counter
    * table (≤ depth×width rows) broadcasts to the candidate side. Output:
    * (value, cms_est) — cms_est ≥ true count, with overestimation only
    * from bucket collisions. */
  def cmsEstimate(counters: DataFrame, candidates: DataFrame, value: Column,
      depth: Int, width: Int): DataFrame =
    candidates.select(value.as("_v"),
        explode(array((0 until depth).map(lit): _*)).as("j"))
      .select(col("_v"), col("j"),
        pmod(md5Long(concat(lit("cms"), col("j").cast("string"), lit("|"), col("_v"))),
          lit(width.toLong)).as("bucket"))
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col("_v")).agg(min(col("c")).as("cms_est"))

  // ---------------- Bloom probe ----------------

  /** Build an m-bit bloom bitmask (as packed longs) from the build side's
    * keys — the ONE driver collect is the ≤ m distinct bit positions
    * (bounded by the filter's size parameter, NOT by build cardinality;
    * the same bounded shape as Spark's own runtime bloom filters). */
  def bloomMask(build: DataFrame, key: Column, mBits: Int, nHashes: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    val posCols = (0 until nHashes).map { j =>
      pmod(md5Long(concat(lit(s"bloom$j|"), key.cast("string"))), lit(mBits.toLong))
    }
    val positions = build.select(explode(array(posCols: _*)).as("pos"))
      .distinct().collect().map(_.getLong(0))
    val mask = new Array[Long](mBits / 64)
    positions.foreach(p => mask(p.toInt / 64) |= 1L << (p.toInt % 64))
    mask
  }

  /** Bloom membership test as a pure codegen'd projection over a literal
    * bitmask — no join, no shuffle, no broadcast exchange on the probe
    * side (the mask rides in the plan like Spark's pushed runtime
    * filters). */
  def bloomTest(mask: Array[Long], key: Column, mBits: Int, nHashes: Int): Column = {
    val maskCol = typedLit(mask.toSeq)
    (0 until nHashes).map { j =>
      val pos = pmod(md5Long(concat(lit(s"bloom$j|"), key.cast("string"))), lit(mBits.toLong))
      val word = element_at(maskCol, idiv(pos, lit(64L)).cast("int") + 1)
      val bit = pmod(pos, lit(64L)).cast("int")
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** End-to-end bloom-probe report: filter `probe` keys through a bloom of
    * `build` keys and tally candidates vs true members vs false positives
    * (truth via a broadcast membership join against the build side — small
    * by assumption, it IS the bloom's build side).
    *
    * Output (single row, all BIGINT): `n_probe`, `n_candidates`,
    * `n_true_matches`, `n_false_pos`, `n_bits_set`.
    */
  def bloomProbeStats(build: DataFrame, buildKey: Column, probe: DataFrame, probeKey: Column,
      mBits: Int, nHashes: Int): DataFrame = {
    val mask = bloomMask(build, buildKey, mBits, nHashes)
    val nBits = mask.map(java.lang.Long.bitCount).sum.toLong
    val members = build.select(buildKey.cast("long").as("_k")).distinct()
      .withColumn("_in", lit(1))
    probe.select(probeKey.cast("long").as("_k"))
      .withColumn("_cand", bloomTest(mask, col("_k"), mBits, nHashes))
      .join(broadcast(members), Seq("_k"), "left_outer")
      .agg(
        count(lit(1)).as("n_probe"),
        sum(when(col("_cand"), 1L).otherwise(0L)).as("n_candidates"),
        sum(when(col("_cand") && col("_in").isNotNull, 1L).otherwise(0L)).as("n_true_matches"))
      .select(col("n_probe"), col("n_candidates"), col("n_true_matches"),
        (col("n_candidates") - col("n_true_matches")).as("n_false_pos"),
        lit(nBits).as("n_bits_set"))
  }
}
