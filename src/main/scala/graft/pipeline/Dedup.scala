package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Hashing._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: hash-groupBy on a content key — one shuffle, fully parallel;
  *  - MinHash + LSH: shingle → minhash signature (per-row expressions) →
  *    explode bands → shuffle on (band, band-hash) → candidate pairs →
  *    exact-Jaccard confirm. Never an all-pairs cross join;
  *  - SimHash: 60-bit signature per row (per-row expressions only);
  *  - n-gram Jaccard: the exact confirm step, exposed standalone (only ever
  *    applied to candidate pairs, not the cross product).
  *
  * All hashing is md5-based ([[Hashing]]) so results are engine-portable and
  * exactly reproducible in the DuckDB oracle.
  */
object Dedup {

  /** Run independent Spark actions concurrently from driver threads and
    * wait for all of them — the scheduler back-fills each job's straggler
    * tail with the next job's tasks instead of serializing full barriers.
    * Only for actions with NO ordering dependency (here: artifact-table
    * writes to distinct directories off one materialized base). The first
    * failure is rethrown after every task has stopped. */
  private def runParallel(tasks: (() => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = tasks.map { t =>
      val th = new Thread(() => try t() catch { case e: Throwable => errs.add(e): Unit })
      th.start(); th
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }

  /** Normalized content key for exact dedup: lowercase, collapsed whitespace. */
  def contentKey(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact dedup summary: one row per distinct content, keeping the minimum
    * id as the canonical representative. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(contentKey(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Snapshot diff: per-id disposition between two corpus snapshots by
    * normalized content key — the crawl-refresh question "what actually
    * changed since the last snapshot" (and the precise input to an
    * incremental re-process: only `added` + `changed` need work).
    *
    * Status: `added` (id only in `cur`), `removed` (only in `prev`),
    * `changed` (both, different content key), `same` (both, equal key).
    *
    * One full-outer equi-join on the id; content keys are computed
    * map-side before the join so text never crosses the shuffle — at
    * 100 TB the exchange carries (id, 32-char key) rows, not documents.
    *
    * Output: `doc_id | status`. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val p = prev.select(col(idCol).as("doc_id"), contentKey(col(textCol)).as("_pk"))
    val c = cur.select(col(idCol).as("doc_id"), contentKey(col(textCol)).as("_ck"))
    p.join(c, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("_pk").isNull, lit("added"))
          .when(col("_ck").isNull, lit("removed"))
          .when(col("_pk") === col("_ck"), lit("same"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Word n-gram shingle array (distinct), as strings.
    *
    * Built from `slice` + `zip_with` rather than an index-lambda
    * (`transform(sequence(...), i -> t[i] ...)`): interpreted higher-order
    * lambdas re-evaluate every subtree per ELEMENT, so spelling the split
    * inside the lambda costs O(tokens²) splits per row. With slices the
    * tokenization is evaluated O(n) times per ROW. Texts shorter than n
    * words produce no shingles. */
  def shingles(text: Column, n: Int): Column = {
    // STRING-expr spelling (not the Column-built [[wordGrams]]): callers
    // interpolate `shingles(...).toString` into larger expr() strings
    // (shingleHashes, fingerprint), and a Column-built lambda does not
    // round-trip through the SQL parser. Semantics are identical to
    // array_distinct(wordGrams(tokens, n)) and pinned against it in tests.
    val t = s"split(trim(${text.toString}), '\\\\s+')"
    val len = s"greatest(size($t) - ${n - 1}, 0)"
    val first = s"slice($t, 1, $len)"
    val grams = (2 to n).foldLeft(first) { (acc, k) =>
      s"zip_with($acc, slice($t, $k, $len), (a, b) -> concat(a, ' ', b))"
    }
    expr(s"array_distinct($grams)")
  }

  /** Non-distinct word n-gram array from a token-array column (used by
    * [[TextAnalysis.repetitionStats]]'s duplicate-gram fractions; the
    * distinct string-expr variant above must stay value-equivalent).
    *
    * Every slice uses the SAME clamped length m: slice() rejects negative
    * lengths, and zip_with pads the shorter side with nulls — mixed lengths
    * would fabricate null-joined grams on short documents (fewer than n
    * tokens ⇒ empty array). */
  private[graft] def wordGrams(toks: Column, n: Int): Column = {
    require(n >= 2, s"wordGrams needs n >= 2, got $n")
    val m = greatest(size(toks) - (n - 1), lit(0))
    (2 to n).foldLeft(slice(toks, lit(1), m)) { case (acc, j) =>
      zip_with(acc, slice(toks, lit(j), m), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Shingle hash array — full 60-bit md5 hashes (collision-free in
    * practice, so Jaccard over hashes ≡ Jaccard over the string shingles;
    * the mod-P fold happens inside the minhash permutations only). */
  def shingleHashes(text: Column, n: Int): Column =
    expr(s"transform(${shingles(text, n).toString}, s -> md5long(s))")

  /** Native `size(array_intersect(a, b))` for `array<bigint>` columns —
    * the exact-Jaccard confirm rung, evaluated per candidate pair (see
    * [[graft.functions.IntersectCountLong]]: the composed spelling boxes
    * every element and materializes the intersection it only counts). */
  private[graft] def intersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(graft.functions.IntersectCountLong(expressionOf(a), expressionOf(b)))
  }

  /** Choose (bands, rowsPerBand) for a Jaccard threshold within a `perms`
    * permutation budget — the LSH S-curve knob the r11 scale sweep showed
    * matters: with b bands of r rows, P(candidate | J) = 1-(1-J^r)^b, and
    * the curve's midpoint sits near (1/b)^(1/r). The shipped default
    * (32×2, midpoint 0.18) is RECALL-heavy for θ=0.5 — it catches J≈0.2
    * pairs 73% of the time, so every such pair pays the verify cost
    * (ruinous when the verifier is O(len²) Levenshtein and the corpus
    * grows). This helper returns the deepest rows-per-band whose midpoint
    * stays at or below θ — the precision-leaning choice that suppresses
    * sub-threshold candidates exponentially while still catching
    * at-threshold pairs with probability ≥ 1/2 (recall is then bought
    * back by raising `perms`, which adds bands at linear cost).
    *
    * E.g. bandingFor(0.5, 64) = (16, 4): P(J=0.2) drops 0.73 → 0.025
    * while P(J=0.7) stays 0.98. */
  def bandingFor(threshold: Double, perms: Int = 64): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1), got $threshold")
    require(perms >= 2, s"perms must be >= 2, got $perms")
    val options = (1 to perms).flatMap { r =>
      val b = perms / r
      if (b >= 1) Some(((b, r), math.pow(1.0 / b, 1.0 / r))) else None
    }
    val safe = options.filter(_._2 <= threshold)
    if (safe.nonEmpty) safe.maxBy { case ((_, r), mid) => (r, mid) }._1
    else options.minBy { case (_, mid) => math.abs(mid - threshold) }._1
  }

  /** P(pair with Jaccard `j` becomes an LSH candidate) under `bands` bands
    * of `rowsPerBand` rows: `1 − (1 − j^r)^b`. The acceptance number both
    * sizing helpers trade in — exposed so call sites (and specs) can PIN a
    * banding's recall at their predicate's Jaccard floor instead of
    * trusting dataset luck. */
  def captureProbability(j: Double, bands: Int, rowsPerBand: Int): Double = {
    require(j >= 0 && j <= 1, s"jaccard in [0,1], got $j")
    require(bands >= 1 && rowsPerBand >= 1, s"bad banding ($bands, $rowsPerBand)")
    1.0 - math.pow(1.0 - math.pow(j, rowsPerBand.toDouble), bands.toDouble)
  }

  /** RECALL-FLOORED banding — the DEFAULT sizing discipline for every
    * near-dup operator in this file: the deepest rows-per-band `r` whose
    * minimal band count `b` (smallest with [[captureProbability]](θ) ≥
    * `minCapture`) fits the `maxPerms` signature budget.
    *
    * Why not [[bandingFor]] alone: its midpoint-at-θ choice (e.g. 16×4 at
    * θ=0.5) captures an AT-threshold pair with probability only ~0.64 — a
    * recall cliff the r11/r12 verdicts flagged: oracle equality observed on
    * one dataset is luck, not a property. This helper makes the floor
    * explicit: capture at θ is ≥ `minCapture` BY CONSTRUCTION, and within
    * that constraint r is maximized because depth is what suppresses the
    * sub-threshold candidate mass that explodes with corpus size (at
    * J=0.1 a 35×3 scheme admits 3.4% of pairs vs 27.5% for the legacy
    * 32×2 — the difference between a bounded and an O(n²)-ish confirm bill
    * at 100 TB). Defaults: θ=0.5 ⇒ (35, 3), 105 permutations.
    *
    * Deeper r within the budget is impossible without breaking the floor
    * (θ=0.5, r=4 needs 72 bands = 288 perms), so raising `maxPerms` is the
    * knob when a deployment wants a steeper S-curve. */
  def bandingForRecall(threshold: Double, minCapture: Double = 0.99,
      maxPerms: Int = 128): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1), got $threshold")
    require(minCapture > 0 && minCapture < 1, s"minCapture in (0,1), got $minCapture")
    require(maxPerms >= 2, s"maxPerms must be >= 2, got $maxPerms")
    val choices = for {
      r <- maxPerms to 1 by -1
      // smallest b with 1-(1-θ^r)^b >= minCapture — in doubles until the
      // budget check (θ^r underflows for deep r, making bD astronomic)
      bD = math.ceil(math.log1p(-minCapture) / math.log1p(-math.pow(threshold, r.toDouble)))
      if bD >= 1.0 && bD * r <= maxPerms
    } yield (bD.toInt, r)
    require(choices.nonEmpty,
      s"no banding within $maxPerms perms reaches capture $minCapture at J=$threshold")
    choices.head
  }

  /** Resolve the (bands, rowsPerBand) sentinel convention shared by every
    * operator below: both > 0 ⇒ use as given (pinned schemes, e.g. the
    * oracle-replicated evals); both 0 ⇒ [[bandingForRecall]] at the
    * operator's confirm threshold (the scale-safe default); mixed ⇒ error. */
  private[graft] def resolveBanding(bands: Int, rowsPerBand: Int,
      threshold: Double): (Int, Int) =
    if (bands > 0 && rowsPerBand > 0) (bands, rowsPerBand)
    else if (bands == 0 && rowsPerBand == 0) bandingForRecall(threshold)
    else throw new IllegalArgumentException(
      s"bands/rowsPerBand must be both explicit or both 0 (auto), got ($bands, $rowsPerBand)")

  /** MinHash signature as `perms` COLUMNS (`mh0 … mh{perms-1}`) computed by
    * exploding the shingle hashes and running `perms` codegen'd `min`
    * aggregates.
    *
    * Two designs were measured and rejected: per-permutation
    * `array_min(transform(...))` columns re-expand the md5 pipeline `perms`
    * times (CollapseProject inlining), and a single nested-lambda expression
    * avoids that but runs INTERPRETED — Spark higher-order functions don't
    * participate in whole-stage codegen, costing ~400 s at sf0.1. The
    * explode + groupBy shape keeps every hot op (multiply/pmod/min) inside
    * codegen and shuffles only (id, h) longs: ~3 s for the whole LSH at
    * sf0.1, and exactly the shape that scales on a cluster. */
  def minhashColumns(df: DataFrame, idCol: Column, hashesCol: Column, perms: Int): DataFrame = {
    val exploded = df.select(idCol.as("id"), explode(hashesCol).as("h"))
    // fold h into [0, P) once, then a_i*h+b_i stays within a signed i64
    val minCols = (0 until perms).map { i =>
      min(pmod(lit(permA(i)) * pmod(col("h"), lit(P)) + lit(permB(i)), lit(P))).as(s"mh$i")
    }
    exploded.groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
  }

  /** MinHash signature as one array column (portability/test surface over
    * [[minhashColumns]]). */
  def minhashSignature(df: DataFrame, idCol: Column, hashesCol: Column, perms: Int): DataFrame =
    minhashColumns(df, idCol, hashesCol, perms)
      .select(col("id"), array((0 until perms).map(i => col(s"mh$i")): _*).as("sig"))

  /** Modulus for band-hash folding past two rows per band: the largest
    * prime below 2^32, sized so `acc*P + x` stays within a signed i64 for
    * any acc < PackMod (PackMod·P + P < 2^63) — rowsPerBand > 2 would
    * otherwise overflow, which ANSI mode (Spark 4's default) turns into a
    * runtime ARITHMETIC_OVERFLOW, not a silent wrap. */
  private[graft] val PackMod: Long = 4294967291L

  /** LSH band table (band_idx, band_hash, id) from a minhash-column frame.
    * Band rows carry ONLY the three narrow columns — large shingle arrays
    * are joined back for CANDIDATES only.
    *
    * Packing: ≤2 rows per band pack exactly as `mh0·P + mh1` (< P² < 2^62
    * — this form is replicated verbatim by every DuckDB oracle, so it must
    * never change); deeper bands fold the same recurrence modulo
    * [[PackMod]], keeping every intermediate in-range for ANSI mode at a
    * negligible collision cost (~2^-32 per band pair). */
  private[graft] def bandTable(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val packed = (0 until rowsPerBand)
        .map(r => col(s"mh${b * rowsPerBand + r}"))
        .reduce((acc, x) =>
          if (rowsPerBand <= 2) acc * P + x
          else pmod(acc * P + x, lit(PackMod)))
      struct(lit(b).as("band_idx"), packed.as("band_hash"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("band"))
      .select(col("id"), col("band.band_idx"), col("band.band_hash"))
  }

  /** LSH band table (band_idx, band_hash, id) computed by the NATIVE
    * per-row kernel ([[graft.functions.MinhashBands]]) — value-identical
    * to `bandTable(minhashColumns(...))` (spec-pinned) at a fraction of
    * the cost: minhash is a per-row function of the row's own shingle
    * set, so the explode (corpus × shingles rows), the `perms`-field
    * aggregation buffer, and the groupBy exchange the old spelling paid
    * were pure overhead (~1.2 s warm per band-table build at sf0.1,
    * repeated at every near-dup site). Shingle-less documents emit no
    * band rows — exactly the old spelling's absence semantics. */
  private[graft] def bandTableFromShingles(df: DataFrame, idCol: Column,
      shCol: Column, bands: Int, rowsPerBand: Int): DataFrame = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    df.select(idCol.as("id"),
      posexplode(columnOf(graft.functions.MinhashBands(
          expressionOf(shCol), bands, rowsPerBand)))
        .as(Seq("band_idx", "band_hash")))
  }

  /** Per-row LSH band hashes — the `bands` packed band hashes as ONE array
    * column (index = band_idx), value-identical to the explode + groupBy
    * [[minhashColumns]]/band-table spelling (pinned in PipelineSpec). No
    * explode, no groupBy, no shuffle: the shape a STREAMING plan needs,
    * where the batch spelling would put a stateful aggregation in front of
    * the admission operator. The higher-order lambdas run interpreted, but
    * `sh` is a column REFERENCE (not re-expanded per permutation), so
    * per-row work is O(perms × |sh|) — the same arithmetic the batch path
    * does, partition-parallel at any scale. Documents with no shingles get
    * all-null band hashes (which match nothing in a band join).
    *
    * `sh` must be a plain column reference to the shingle-hash array (the
    * string-expr spelling does not round-trip composed Columns). */
  private[graft] def bandHashesExpr(sh: Column, bands: Int, rowsPerBand: Int): Column = {
    val perms = bands * rowsPerBand
    val pa = (0 until perms).map(i => s"${permA(i)}L").mkString("array(", ", ", ")")
    val pb = (0 until perms).map(i => s"${permB(i)}L").mkString("array(", ", ", ")")
    def mh(r: Int) =
      s"array_min(transform(${sh.toString}, h -> " +
        s"pmod(element_at($pa, cast(b * $rowsPerBand + ${r + 1} as int)) * pmod(h, ${P}L) + " +
        s"element_at($pb, cast(b * $rowsPerBand + ${r + 1} as int)), ${P}L)))"
    // must stay value-identical to [[bandTable]]'s packing (pinned in
    // PipelineSpec): exact ≤2 rows, PackMod-folded beyond
    val packed = (1 until rowsPerBand).foldLeft(mh(0)) { (acc, r) =>
      if (rowsPerBand <= 2) s"($acc) * ${P}L + ${mh(r)}"
      else s"pmod(($acc) * ${P}L + ${mh(r)}, ${PackMod}L)"
    }
    expr(s"transform(sequence(0, ${bands - 1}), b -> $packed)")
  }

  /** Near-duplicate pairs via MinHash + banded LSH, confirmed by exact
    * Jaccard ≥ `threshold`. Banding defaults to the scale-safe
    * [[bandingForRecall]] sizing at the confirm threshold (θ=0.5 ⇒ 35×3:
    * capture ≥ 0.99 at J=θ with the deepest sub-threshold suppression the
    * 128-perm budget affords — see that helper for why fixed gate-scale
    * banding does not survive corpus growth); pass both `bands` and
    * `rowsPerBand` to pin an explicit scheme.
    * Output: (id_1, id_2, jaccard), id_1 < id_2.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 0, rowsPerBand: Int = 0,
      threshold: Double = 0.5): DataFrame = {
    val (nBands, rpb) = resolveBanding(bands, rowsPerBand, threshold)
    val perms = nBands * rpb
    // persisted (spillable): the banding leg and BOTH confirm legs consume
    // this projection, and each lazy consumer would re-run the corpus scan
    // + regex shingling + per-shingle md5 — the dominant cost (the same
    // lesson as incrementalDedup r11 / minhashEval r13 / prefix join r14).
    // (id, array<long>) is the narrow form; eviction costs recompute only.
    // Lifetime: registered — see the Projections caching contract.
    val hashed = Projections.register(
      Projections.spread(df, col(idCol))
        .select(col(idCol).as("id"), shingleHashes(col(textCol), ngram).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val banded = bandTableFromShingles(hashed, col("id"), col("sh"), nBands, rpb)

    // candidate pairs: ids sharing any band bucket (shuffle on band hash —
    // no cross join); then confirm with exact Jaccard on the shingle sets
    val l = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_1"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_2"))
    val candIds = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2")
      .dropDuplicates("id_1", "id_2")

    val sets = hashed.select(col("id"), col("sh"))
    val cand = candIds
      .join(sets.select(col("id").as("id_1"), col("sh").as("sh_1")), Seq("id_1"))
      .join(sets.select(col("id").as("id_2"), col("sh").as("sh_2")), Seq("id_2"))

    cand
      .withColumn("inter", intersectCount(col("sh_1"), col("sh_2")).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_1")) + size(col("sh_2")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_1"), col("id_2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-set MinHash near-dup — FUZZY DECONTAMINATION: every (a, b)
    * pair across the two sets with shingle Jaccard ≥ `threshold`, found
    * by the same band-bucket candidate generation as the self-join
    * [[minhashNearDups]] and confirmed by exact Jaccard. The cross-set
    * read is the paraphrase-tolerant complement of the exact n-gram
    * [[Contamination]] pass: a benchmark item that was lightly reworded
    * into the training corpus shares most shingles and is caught here,
    * invisible to exact n-gram containment.
    *
    * Scale shape: both sides band independently (map-side), candidates
    * come from the (band_idx, band_hash) equi-join — cost ∝ bucket
    * collisions, never |train| × |test| — and only candidates rejoin
    * their shingle sets for the exact confirm.
    *
    * Output: (id_a, id_b, jaccard), one row per qualifying cross pair. */
  def minhashNearDupsAcross(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, ngram: Int = 3, bands: Int = 0, rowsPerBand: Int = 0,
      threshold: Double = 0.5): DataFrame = {
    val (nBands, rpb) = resolveBanding(bands, rowsPerBand, threshold)
    val perms = nBands * rpb
    // each side feeds its banding leg AND its confirm leg — persist
    // (spillable) so the shingling runs once per side, not twice.
    // Lifetime: registered — see the Projections caching contract.
    def prep(df: DataFrame) = Projections.register(
      Projections.spread(df, col(idCol))
        .select(col(idCol).as("id"), shingleHashes(col(textCol), ngram).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val ha = prep(a); val hb = prep(b)
    def bandSide(h: DataFrame, as: String) =
      bandTableFromShingles(h, col("id"), col("sh"), nBands, rpb)
        .select(col("band_idx"), col("band_hash"), col("id").as(as))
    val candIds = bandSide(ha, "id_a")
      .join(bandSide(hb, "id_b"), Seq("band_idx", "band_hash"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    candIds
      .join(ha.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(hb.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", intersectCount(col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** EXACT similarity join by PREFIX FILTERING (Chaudhuri et al. ICDE'06 /
    * Xiao et al.'s PPJoin family): all pairs with shingle-set Jaccard ≥
    * `threshold`, with NO false negatives — the deterministic alternative
    * to [[minhashNearDups]]'s probabilistic banding, over the SAME n-gram
    * shingle similarity. Each document keeps
    * only its PREFIX — the first `|x| − ⌈t·|x|⌉ + 1` shingles in a global
    * rarity order (ascending document frequency, ties by value) — and two
    * documents can reach Jaccard t only if their prefixes share a shingle
    * (the standard prefix-filter lemma), so the candidate join keys on
    * prefix shingles: pair work concentrates on RARE shingles (boilerplate
    * never enters a long document's prefix), which is what makes the
    * filter effective at corpus scale.
    *
    * Scale shape: one vocabulary-sized df aggregate, a broadcast-joinable
    * df lookup, per-doc sort of its own tokens (bounded by doc length),
    * and a candidate equi-join on prefix tokens — never n². Exact Jaccard
    * verifies candidates (same confirm as the banded path). Output:
    * (id_1, id_2, jaccard), id_1 < id_2 — byte-equal to the brute-force
    * truth by the lemma, which is exactly what the oracle checks.
    */
  def prefixJaccardJoin(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    // 3-gram shingle sets — the same similarity the banded minhash path
    // confirms, so this exact join is its drop-in deterministic upgrade
    // (word sets are far too dense on boilerplate-heavy corpora: measured
    // 92k word-level pairs vs 40 shingle-level at θ=0.5 on the sf0.01
    // documents).
    // HASHED shingle identity (md5long — the same 64-bit identity the
    // minhash tier confirms with), computed ONCE and persisted: this
    // projection feeds FOUR legs (the df aggregate, the per-doc ordering,
    // and both confirm sides), and each lazy consumer would otherwise
    // re-run the corpus scan + regex shingling. The r14 measurements that
    // picked this shape: recompute-4× ran 6.4 s / 57.6 s (sf0.1 / 10×
    // gate scale), caching the STRING arrays thrashed at scale (4.3 /
    // 153 s), a repartition barrier stayed linear but paid a fat
    // exchange (8.4 / 43.5) — hashing shrinks the cached rows ~4× so the
    // spillable cache wins at both scales. Correctness is unchanged:
    // the prefix-filter lemma holds under ANY consistent global token
    // order (the order only tunes candidate count), and hashed-set
    // Jaccard equals string-set Jaccard exactly unless two distinct
    // shingles of one compared pair collide in 64 bits (~2⁻⁶⁴ per pair —
    // the identical risk the minhash confirm tier already accepts).
    // Lifetime: registered — see the Projections caching contract.
    val toks = Projections.register(
      Projections.spread(df, col(idCol))
        .select(col(idCol).as("id"), shingleHashes(col(textCol), ngram).as("ts"))
        .filter(size(col("ts")) > 0)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val dfreq = toks.select(col("id"), explode(col("ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("dfq"))
    // per-doc tokens in (df ASC, token ASC) global order, prefix sliced
    val ordered = toks.select(col("id"), explode(col("ts")).as("t"))
      .join(dfreq, Seq("t"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("dfq"), col("t")))).as("ord"),
        count(lit(1)).as("n"))
      .select(col("id"), col("n"),
        expr("transform(ord, e -> e.t)").as("sorted_ts"),
        (col("n") - ceil(lit(threshold) * col("n")).cast("long") + 1).as("plen"))
    val prefixes = ordered
      .select(col("id"), col("n"),
        explode(slice(col("sorted_ts"), lit(1), col("plen"))).as("t"))
    // LENGTH filter (the PPJoin family's first refinement, exact): J(x,y)
    // ≤ min(|x|,|y|)/max(|x|,|y|) — the intersection is at most the
    // smaller set and the union at least the larger — so J ≥ t requires
    // min ≥ t·max. Applied per candidate OCCURRENCE, before the pair
    // dedup exchange and the confirm, it drops ~24% of candidates at
    // sf0.1 (409k → 310k pairs) for two extra longs through the prefix
    // join. The 1e-6 slack absorbs double rounding in t·max — it can only
    // KEEP a boundary pair the real bound would drop, never lose one.
    val cand = prefixes.select(col("t"), col("id").as("id_1"), col("n").as("n_1"))
      .join(prefixes.select(col("t"), col("id").as("id_2"), col("n").as("n_2")), Seq("t"))
      .filter(col("id_1") < col("id_2"))
      .filter(least(col("n_1"), col("n_2")).cast("double") >=
        lit(threshold) * greatest(col("n_1"), col("n_2")).cast("double") - 1e-6)
      .select("id_1", "id_2").dropDuplicates("id_1", "id_2")
    val sets = toks
    cand
      .join(sets.select(col("id").as("id_1"), col("ts").as("ts_1")), Seq("id_1"))
      .join(sets.select(col("id").as("id_2"), col("ts").as("ts_2")), Seq("id_2"))
      .withColumn("inter", intersectCount(col("ts_1"), col("ts_2")).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("ts_1")) + size(col("ts_2")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_1"), col("id_2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Banding acceptance row — the dedup family's analog of the ANN recall
    * metrics: grade the LSH candidate generation against the exact
    * brute-force truth (all pairs with Jaccard ≥ `threshold`).
    * `recall_ppm` says what the bands MISS (pairs the banded join never
    * surfaces — the (1−J^r)^b risk priced in [[minhashNearDups]]'s doc);
    * `precision_ppm` says what they WASTE (candidate collisions the exact
    * confirm then rejects — the knob for tuning bands × rowsPerBand).
    *
    * The truth side is O(n²) BY DEFINITION, and since r13 the bound is
    * ENFORCED, not documented: the eval counts its input (one job over the
    * materialized projection) and rejects corpora above `maxTruthRows` —
    * an unbounded caller would otherwise silently schedule a corpus²
    * confirm. The candidate side is the production banded path unchanged.
    *
    * The `(id, sh)` tokenized projection is computed ONCE and
    * `localCheckpoint`'d (eval-window-sized by the same bound): the
    * candidate join consumes it twice and the truth join twice more, and
    * without the cut each leg re-ran the regex shingling + per-shingle md5
    * — the dominant cost of the whole eval (the same fix r11 applied to
    * incrementalDedup's batch projection).
    *
    * Output: one row — n_truth, n_candidates, n_hits, precision_ppm,
    * recall_ppm (truncated integer ppm). */
  def minhashEval(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.5, maxTruthRows: Long = 100000L): DataFrame = {
    val perms = bands * rowsPerBand
    val hashed = evalProjection(df, idCol, textCol, ngram, maxTruthRows)
    val banded = bandTableFromShingles(hashed, col("id"), col("sh"), bands, rowsPerBand)
    val l = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_1"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_2"))
    val candIds = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2")
      .dropDuplicates("id_1", "id_2")
    // truth via the SPARSE pair enumeration (pairIntersections): a pair
    // with J ≥ θ > 0 shares a shingle, so only co-occurring pairs are ever
    // materialized; the hits among candidates are the equi-join of the two
    // pair sets — no per-pair array_intersect anywhere (the former dense
    // n²/2-pairs × array-intersect truth leg was the whole eval's cost)
    val truthPairs = pairIntersections(hashed)
      .filter(col("inter") / (col("n_1") + col("n_2") - col("inter")) >= threshold)
      .select("id_1", "id_2")
      .localCheckpoint()
    val cand = candIds
      .join(truthPairs.withColumn("__hit", lit(true)), Seq("id_1", "id_2"), "left")
      .agg(count(lit(1)).as("n_candidates"),
        sum(col("__hit").isNotNull.cast("long")).as("n_hits"))
    val truth = truthPairs.agg(count(lit(1)).as("n_truth"))
    cand.crossJoin(broadcast(truth))
      .select(col("n_truth"), col("n_candidates"), col("n_hits"),
        expr("(n_hits * 1000000) div n_candidates").as("precision_ppm"),
        expr("(n_hits * 1000000) div n_truth").as("recall_ppm"))
  }

  /** Sparse all-pairs intersection table over an `(id, sh)` projection:
    * explode the (distinct, collision-free) shingle hashes and self-join on
    * the hash — each co-occurring pair surfaces once per SHARED shingle, so
    * the groupBy count IS the intersection size, and pairs sharing nothing
    * never exist. Cost follows Σ_h df(h)² (the co-occurrence mass), not
    * n²/2 dense pairs — the standard sparse set-similarity enumeration.
    * Output: `(id_1, id_2, inter, n_1, n_2)` with id_1 < id_2, inter ≥ 1. */
  private def pairIntersections(hashed: DataFrame): DataFrame = {
    val ex = hashed.select(col("id"), explode(col("sh")).as("h"))
    val sizes = hashed.select(col("id"), size(col("sh")).cast("long").as("n"))
    ex.select(col("h"), col("id").as("id_1"))
      .join(ex.select(col("h"), col("id").as("id_2")), Seq("h"))
      .filter(col("id_1") < col("id_2"))
      .groupBy("id_1", "id_2")
      .agg(count(lit(1)).cast("long").as("inter"))
      .join(sizes.select(col("id").as("id_1"), col("n").as("n_1")), Seq("id_1"))
      .join(sizes.select(col("id").as("id_2"), col("n").as("n_2")), Seq("id_2"))
  }

  /** The shared eval-input projection: tokenize once, materialize
    * (`localCheckpoint` — bounded by `maxTruthRows` by construction), and
    * ENFORCE the O(n²)-truth contract. The count runs on the materialized
    * blocks, so the admission check costs one narrow job, not a re-scan. */
  private def evalProjection(df: DataFrame, idCol: String, textCol: String,
      ngram: Int, maxTruthRows: Long): DataFrame = {
    require(maxTruthRows >= 2, s"maxTruthRows must be >= 2, got $maxTruthRows")
    val hashed = df
      .select(col(idCol).as("id"), shingleHashes(col(textCol), ngram).as("sh"))
      .localCheckpoint()
    val n = hashed.count()
    if (n > maxTruthRows) {
      hashed.unpersist(false)
      throw new IllegalArgumentException(
        s"minhashEval truth side is O(n²): got $n rows > maxTruthRows=$maxTruthRows — " +
          "pass a bounded contiguous id window (id-mod sampling would destroy pair " +
          "structure) or raise maxTruthRows deliberately")
    }
    hashed
  }

  /** Threshold-SWEEP acceptance report for the banded MinHash index: one
    * candidate generation, one brute-force truth pass, then
    * precision/recall at EVERY requested Jaccard threshold — the curve a
    * dedup operator reads before picking θ, priced at one extra conditional
    * aggregation per θ rather than |θ| reruns of [[minhashEval]].
    * Jaccard is compared in EXACT ppm (`inter·1e6 div union`) on both
    * engines — a float `j >= 0.3` can disagree with the integer grain at
    * exact-boundary pairs.
    *
    * The truth side is O(n²) BY DEFINITION — the `maxTruthRows` bound is
    * enforced exactly like [[minhashEval]]'s, and the tokenized projection
    * is shared (checkpointed once) across the candidate and truth legs.
    * Output: one row per θ:
    * `(theta_ppm, n_truth, n_candidates, n_hits, precision_ppm,
    * recall_ppm)`; ratios are null when their denominator is 0. */
  def minhashEvalSweep(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 32, rowsPerBand: Int = 2,
      thetasPpm: Seq[Long] = Seq(300000L, 500000L, 700000L),
      maxTruthRows: Long = 100000L): DataFrame = {
    // ALL input validation precedes any job: the projection checkpoint
    // below is real cluster work
    require(thetasPpm.nonEmpty, "sweep needs at least one threshold")
    require(thetasPpm.forall(_ > 0L),
      s"sweep thresholds must be positive ppm, got $thetasPpm")
    val perms = bands * rowsPerBand
    val hashed = evalProjection(df, idCol, textCol, ngram, maxTruthRows)
    val banded = bandTableFromShingles(hashed, col("id"), col("sh"),
      bands, rowsPerBand)
    val l = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_1"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_2"))
    val candIds = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2")
      .dropDuplicates("id_1", "id_2")
    val spark = df.sparkSession
    import spark.implicits._
    val thetas = thetasPpm.toDF("theta_ppm")
    // exact-ppm Jaccard from the SPARSE intersection table (same
    // enumeration as minhashEval's truth): a pair absent from it has
    // jp = 0, below every positive θ on both the truth and candidate
    // sides, so left-joining candidates to it and coalescing is exact.
    // SEMANTIC NOTE (r13): zero-shingle documents collide in every band
    // (an empty set has one minhash signature), so their candidate pairs
    // ARE counted in n_candidates at jp = 0 — they are real index work the
    // precision figure should charge for. Pre-r13 they were silently
    // excluded; corpora with empty documents see a lower precision_ppm now.
    val jpPairs = pairIntersections(hashed)
      .select(col("id_1"), col("id_2"),
        call_function("div", col("inter") * 1000000L,
          col("n_1") + col("n_2") - col("inter")).as("jp"))
      .localCheckpoint()
    val candJ = candIds
      .join(jpPairs, Seq("id_1", "id_2"), "left")
      .select(coalesce(col("jp"), lit(0L)).as("jp"))
      .crossJoin(broadcast(thetas))
      .groupBy("theta_ppm")
      .agg(count(lit(1)).as("n_candidates"),
        sum((col("jp") >= col("theta_ppm")).cast("long")).as("n_hits"))
    val truthJ = jpPairs
      .crossJoin(broadcast(thetas))
      .groupBy("theta_ppm")
      .agg(sum((col("jp") >= col("theta_ppm")).cast("long")).as("n_truth"))
    candJ.join(truthJ, Seq("theta_ppm"))
      .select(col("theta_ppm"), col("n_truth"), col("n_candidates"), col("n_hits"),
        expr("case when n_candidates = 0 then null else (n_hits * 1000000) div n_candidates end")
          .as("precision_ppm"),
        expr("case when n_truth = 0 then null else (n_hits * 1000000) div n_truth end")
          .as("recall_ppm"))
  }

  /** Edit-distance-confirmed near-dups: the [[minhashNearDups]] banded
    * candidate generation with a LEVENSHTEIN confirmation tier instead of
    * shingle Jaccard — the right verifier for small in-place edits (typo
    * variants, template fills) where token-set overlap over- or
    * under-reports. A pair survives when
    * `levenshtein(a, b) · 1e6 / max(len(a), len(b)) <= maxDistPpm`.
    *
    * Levenshtein is O(len²) per pair, so BOTH texts must be ≤ `maxLen`
    * chars (longer records belong to the Jaccard tier); the candidate
    * space is still banded — the quadratic cost is paid only on LSH
    * collisions, never corpus×corpus. Spark's codegen'd `levenshtein`
    * and DuckDB's agree (unit-cost DP over characters), so the distances
    * themselves are oracle-exact.
    *
    * Banding default: the gate's own predicate (edit ≤ `maxDistPpm` of a
    * ≤ `maxLen`-char text, `ngram`-word shingles) admits pairs down to
    * shingle Jaccard `bandJaccardFloor` ≈ 0.5 — a 10% character edit can
    * disrupt up to ~half the 3-gram shingles — so the default banding is
    * [[bandingForRecall]] AT THAT FLOOR (capture ≥ 0.99 for every
    * qualifying pair by construction, not by dataset luck; the r12
    * verdict's recall-cliff item). Pass both `bands`/`rowsPerBand` to pin
    * a scheme, or tighten `bandJaccardFloor` when `maxDistPpm` is small
    * (lighter edits ⇒ higher surviving Jaccard ⇒ cheaper banding).
    *
    * Output: `id_1 | id_2 | dist | rel_ppm`. */
  def editDistanceNearDups(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 0, rowsPerBand: Int = 0,
      maxLen: Int = 2000, maxDistPpm: Long = 100000L,
      bandJaccardFloor: Double = 0.5): DataFrame = {
    require(maxLen > 0 && maxDistPpm >= 0, s"bad bounds ($maxLen, $maxDistPpm)")
    val (nBands, rpb) = resolveBanding(bands, rowsPerBand, bandJaccardFloor)
    val perms = nBands * rpb
    // persisted (spillable): the banding leg and both text-side confirm
    // joins consume this — without it each leg re-runs the corpus scan +
    // shingling (see minhashNearDups).
    // Lifetime: registered — see the Projections caching contract.
    val hashed = Projections.register(
      Projections.spread(df, col(idCol))
        .select(col(idCol).as("id"), col(textCol).as("t"),
          shingleHashes(col(textCol), ngram).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val banded = bandTableFromShingles(hashed, col("id"), col("sh"), nBands, rpb)
    val l = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_1"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_2"))
    val candIds = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2")
      .dropDuplicates("id_1", "id_2")
    val texts = hashed.select(col("id"), col("t"))
    // Confirm-tier pruning — two implied predicates evaluated BEFORE the
    // quadratic DP, output-identical by construction:
    //  1. dist >= |len1 - len2| always, so a pair whose length gap exceeds
    //     the distance budget can never qualify — a free kill for band
    //     collisions between differently-sized texts;
    //  2. the budget itself bounds the DP: `levenshtein(a, b, k)` runs the
    //     BANDED O(len·k) algorithm and returns -1 past k. kb is the exact
    //     equivalence bound for the final integer-ppm filter
    //     (`floor(d·1e6/M) <= p  ⟺  d·1e6 < (p+1)·M  ⟺  d <= ((p+1)·M-1) div 1e6`),
    //     used per-row by the length-gap kill. The Scala `levenshtein` DSL
    //     takes a LITERAL Int threshold, so the DP is bounded by kMax — the
    //     kb value at `mx = maxLen`, an upper bound for every surviving row
    //     (the length filter precedes it). Rows with kb < dist <= kMax are
    //     still rejected by the exact ppm filter, which runs last as the
    //     semantic arbiter, so the output is unchanged.
    val mx = greatest(length(col("t_1")), length(col("t_2"))).cast("long")
    val kb = call_function("div", (lit(maxDistPpm) + 1L) * mx - 1L, lit(1000000L))
    val kMax = (((maxDistPpm + 1L) * maxLen - 1L) / 1000000L).toInt
    candIds
      .join(texts.select(col("id").as("id_1"), col("t").as("t_1")), Seq("id_1"))
      .join(texts.select(col("id").as("id_2"), col("t").as("t_2")), Seq("id_2"))
      .filter(length(col("t_1")) <= maxLen && length(col("t_2")) <= maxLen)
      .filter(abs(length(col("t_1")) - length(col("t_2"))).cast("long") <= kb)
      .withColumn("dist",
        levenshtein(col("t_1"), col("t_2"), kMax).cast("long"))
      .filter(col("dist") >= 0L)
      .withColumn("rel_ppm", call_function("div", col("dist") * lit(1000000L), mx))
      .filter(col("rel_ppm") <= maxDistPpm)
      .select(col("id_1"), col("id_2"), col("dist"), col("rel_ppm"))
  }

  /** 60-bit SimHash signature over word-token md5 hashes: bit j is set iff
    * the sum of (+1/-1) votes from each token's bit j is positive. Pure
    * per-row expressions; 60 bits (not 64) to stay within a signed i64.
    *
    * Single pass over the token hashes: one `aggregate` accumulates the
    * 60-element vote vector, then one fold packs the sign bits — the naive
    * per-bit formulation would re-expand the md5 token hashing 60 times
    * (see [[minhashSignature]]). */
  def simhash(text: Column, bits: Int = 60): Column = {
    val toks = s"split(trim(${text.toString}), '\\\\s+')"
    val hashes = s"transform($toks, t -> md5long(t))"
    val votes =
      s"""aggregate($hashes, transform(sequence(0, ${bits - 1}), j -> 0L),
         |  (acc, h) -> zip_with(acc, sequence(0, ${bits - 1}),
         |    (a, j) -> a + if(((h >> j) & 1) = 1, 1L, -1L)))""".stripMargin
    expr(
      s"""aggregate(zip_with($votes, sequence(0, ${bits - 1}),
         |  (v, j) -> if(v > 0, shiftleft(1L, cast(j as int)), 0L)), 0L, (acc, x) -> acc + x)""".stripMargin)
  }

  /** Fingerprint-blocked exact n-gram Jaccard dedup: block documents on
    * their winnowing-style fingerprint ([[TextAnalysis.fingerprint]]), then
    * exact-Jaccard every within-block pair. One shuffle on the fingerprint;
    * pair work is bounded by block sizes, never the corpus cross product —
    * the classic "blocking key + verify" shape that holds at 100 TB (a hot
    * fingerprint would indicate boilerplate worth exact-dedup'ing first).
    * Output: (id_1, id_2, jaccard), id_1 < id_2, both sides ≥1 shingle. */
  def fingerprintJaccardDups(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3): DataFrame = {
    // The repartition is a deliberate materialization barrier: without it,
    // CollapseProject inlines the (expensive) shingle + fingerprint
    // expressions into BOTH join sides' filters and projects (4× per row);
    // with it the two sides are identical exchange subtrees that Spark's
    // ReuseExchange computes ONCE, and the shuffle on fp is the one a
    // sort-merge self-join needs at scale anyway (AQE may still downgrade
    // it to broadcast on small inputs).
    // HASHED shingle identity (md5long), as in [[prefixJaccardJoin]]: the
    // fp exchange carries 8-byte elements instead of ~25-char shingle
    // strings (§2.3 — ~4× fewer shuffled bytes for the same sets), and the
    // confirm runs the native [[intersectCount]] kernel instead of boxing
    // string arrays. Hashed-set Jaccard equals string-set Jaccard exactly
    // unless two distinct shingles of one compared pair collide in 64 bits
    // (~2⁻⁶⁴ per pair — the risk every minhash confirm tier accepts).
    val keyed = df.select(
      col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"),
      shingleHashes(col(textCol), ngram).as("sh"))
      .repartition(col("fp"))
    val l = keyed.select(col("fp"), col("id").as("id_1"), col("sh").as("sh_1"))
    val r = keyed.select(col("fp"), col("id").as("id_2"), col("sh").as("sh_2"))
    l.join(r, Seq("fp"))
      .filter(col("id_1") < col("id_2"))
      .filter(size(col("sh_1")) > 0 && size(col("sh_2")) > 0)
      .withColumn("inter", intersectCount(col("sh_1"), col("sh_2")).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_1")) + size(col("sh_2")) - col("inter")))
      .select(col("id_1"), col("id_2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Sorted-neighborhood dedup (Hernández & Stolfo's merge/purge blocking):
    * sort the corpus by a cheap discriminating key, compare each record
    * only against its `windowSize − 1` successors in that order, confirm
    * with exact n-gram Jaccard. The classic complement to hash blocking
    * ([[fingerprintJaccardDups]]) and LSH ([[minhashNearDups]]): a sort
    * key groups near-dups that share a PREFIX even when their fingerprints
    * and minhashes diverge, and the candidate count is strictly
    * `(w−1)·n` — no hot-block blowup possible.
    *
    * Scale shape: the global ordering comes from [[Ranking.globalRank]]
    * (range-repartition + per-partition rank + bounded offsets — never a
    * single-partition window); neighbor candidates are an EQUI-join on the
    * integer rank (each record exploded to its `w−1` successor ranks), so
    * the join shuffles balanced longs and the exact-Jaccard confirm runs
    * on candidate pairs only.
    *
    * Output: `(id_1, id_2, rank_dist, jaccard_ppm)` for pairs at or above
    * `thetaPpm`, ids oriented by rank order (id_1 precedes id_2 in the
    * sort). */
  def sortedNeighborhoodDups(df: DataFrame, idCol: String, textCol: String,
      prefixTokens: Int = 3, windowSize: Int = 4,
      thetaPpm: Long = 500000L, ngram: Int = 3): DataFrame = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    require(prefixTokens >= 1, s"prefixTokens must be >= 1, got $prefixTokens")
    val key = array_join(
      slice(split(trim(col(textCol)), "\\s+"), 1, prefixTokens), " ")
    // HASHED shingle identity (md5long), as in [[prefixJaccardJoin]]: the
    // checkpointed ranked table holds 8-byte elements instead of shingle
    // strings (~4× narrower materialization + rank-join shuffles, §2.3),
    // and the confirm runs the native [[intersectCount]] kernel. Exact
    // unless two distinct shingles of one compared pair collide in 64
    // bits — the accepted minhash-confirm risk.
    val base = df.select(col(idCol).as("_id"), key.as("_key"),
      shingleHashes(col(textCol), ngram).as("_sh"))
    val ranked = Ranking.globalRank(base, Seq("_key", "_id"))
      // the rank join consumes this twice; materialize the (narrow)
      // ranked table once rather than re-running rank's shuffles per side
      .select(col("_id"), col("_sh"), col("_rank")).localCheckpoint()
    val lhs = ranked
      .withColumn("_d", explode(array((1 until windowSize).map(lit): _*)))
      .select(col("_id").as("id_1"), col("_sh").as("_s1"),
        col("_d"), (col("_rank") + col("_d")).as("_rb"))
    val rhs = ranked.select(col("_id").as("id_2"), col("_sh").as("_s2"),
      col("_rank").as("_rb"))
    lhs.join(rhs, "_rb")
      .filter(size(col("_s1")) > 0 && size(col("_s2")) > 0)
      .withColumn("_i", intersectCount(col("_s1"), col("_s2")).cast("long"))
      .withColumn("jaccard_ppm", expr(
        "_i * 1000000 div (size(_s1) + size(_s2) - _i)"))
      .filter(col("jaccard_ppm") >= thetaPpm)
      .select(col("id_1"), col("id_2"), col("_d").cast("long").as("rank_dist"),
        col("jaccard_ppm"))
  }

  /** Incremental (cross-corpus) dedup — the nightly-refresh shape: decide,
    * for every document in a NEW batch, whether it is novel with respect to
    * an EXISTING corpus and to the rest of the batch. Output is one row per
    * batch document: `(idCol, status)` with status the FIRST match of
    *
    *  1. `dup_exact_corpus` — its content key already exists in the corpus;
    *  2. `dup_exact_batch`  — its key is shared within the batch (and absent
    *     from the corpus) and it is not the minimum-id holder;
    *  3. `near_dup_corpus`  — exact n-gram Jaccard ≥ `threshold` against
    *     some corpus document (candidates from banded MinHash LSH);
    *  4. `near_dup_batch`   — Jaccard ≥ `threshold` against a SMALLER-id
    *     batch document that is itself still standing after 1–3;
    *  5. `admitted`.
    *
    * 100 TB shape: the corpus contributes only (a) its distinct content
    * keys (partial-aggregated, one shuffle) and (b) its narrow LSH band
    * rows — full corpus text is never joined against the batch; exact
    * Jaccard touches LSH candidates only. This overload derives those
    * artifacts from the corpus text in-plan (a corpus-sized job); the
    * [[DedupArtifacts]] overload consumes PERSISTED artifacts instead,
    * making the per-batch cost proportional to the batch, not the corpus. */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 0, rowsPerBand: Int = 0,
      threshold: Double = 0.5): DataFrame = {
    // resolve ONCE so build and decide band identically
    val (nBands, rpb) = resolveBanding(bands, rowsPerBand, threshold)
    incrementalDedup(batch,
      buildDedupArtifacts(corpus, idCol, textCol, ngram, nBands, rpb),
      idCol, textCol, ngram, nBands, rpb, threshold)
  }

  /** The persisted corpus state [[incrementalDedup]] needs — three narrow
    * frames, each writable as a parquet table and incrementally maintained
    * ([[updateDedupArtifacts]] is insert-only under admission):
    *
    *  - `keys`:     distinct corpus content keys `(ck)`;
    *  - `bands`:    LSH band rows `(cid, band_idx, band_hash)`;
    *  - `shingles`: per-document shingle hash sets `(cid, sh)` — joined
    *    only against LSH CANDIDATES for the exact-Jaccard confirm. Since
    *    r11 this is the combined tokenized projection and also carries
    *    the content key `ck` (see [[Dedup.buildDedupArtifacts]]).
    *
    * With these at rest, a nightly batch never touches corpus text: the
    * per-batch job reads batch text plus three batch-∝ or candidate-∝
    * joins against the artifact tables. */
  final case class DedupArtifacts(keys: DataFrame, bands: DataFrame, shingles: DataFrame,
      banding: Option[(Int, Int)] = None,
      keysDistinct: Boolean = false,
      // true when the three frames are independently cheap to evaluate
      // (parquet scans / checkpoints); false when they are live derivations
      // of ONE shared tokenize pass — consumers that materialize all three
      // (the streaming admission) then persist the shingles projection once
      // and derive keys/bands from it instead of paying the corpus
      // tokenize per frame (r19; the same one-scan discipline write() uses)
      framesAtRest: Boolean = false) {
    /** Materialize the three frames and truncate their lineage (eager
      * local checkpoint) — the single-process analog of writing the
      * artifact tables to storage and reading them back. Chained
      * [[updateDedupArtifacts]] cycles MUST cross this boundary between
      * nights: night N's decisions are otherwise a live subtree of night
      * N+1's plan (referenced once per artifact frame per join), so the
      * un-truncated plan grows multiplicatively with nights — at depth 2
      * the analyzer alone is a GC-bound driver job. In production the
      * same boundary is the nightly parquet write of the artifacts. */
    def materialize(): DedupArtifacts =
      DedupArtifacts(keys.localCheckpoint(), bands.localCheckpoint(),
        shingles.localCheckpoint(), banding, keysDistinct, framesAtRest = true)

    /** The REAL nightly boundary: persist the three artifact tables as
      * parquet under `dir` (`keys/`, `bands/`, `shingles/`) plus a
      * `MANIFEST.json` recording the layout version and the build
      * parameters, so the next night's [[Dedup.readArtifacts]] (or a
      * different process entirely) resumes from storage. `params` should
      * carry the (ngram, bands, rowsPerBand) the artifacts were built
      * with — a mismatched rebuild would silently change the candidate
      * space. Writes go through the Hadoop FileSystem of `dir`, so any
      * Spark-supported storage (HDFS/S3/local) works unchanged. */
    def write(dir: String, params0: Map[String, Long] = Map.empty): Unit = {
      val spark = keys.sparkSession
      // the recorded scheme backfills absent band params so a default
      // (auto-banded) build still writes a scheme-carrying manifest —
      // a FULL explicit pair wins (write() re-derives the band table under
      // it). A HALF-explicit pair (just "bands" or just "rowsPerBand") is
      // rejected: the old behavior wrote a partial-scheme manifest, so
      // readArtifacts yielded banding=None and every downstream
      // scheme-mismatch check was silently disabled (ADVICE r14).
      val hasB = params0.contains("bands")
      val hasR = params0.contains("rowsPerBand")
      require(hasB == hasR,
        s"pass both bands and rowsPerBand or neither; got ${params0.filter(
          kv => kv._1 == "bands" || kv._1 == "rowsPerBand")}")
      val params = banding match {
        case Some((b, r)) if !hasB =>
          params0 + ("bands" -> b.toLong) + ("rowsPerBand" -> r.toLong)
        case _ => params0
      }
      // ONE corpus scan+tokenize, not three: persist the tokenized
      // projection (the shingles table, carrying cid/ck/sh since r11)
      // first, then derive keys and bands from the WRITTEN parquet —
      // reading back pre-computed hash arrays is column-pruned IO, while
      // re-deriving each table from the raw corpus repeats the regex
      // shingling + per-shingle md5 that dominates the build. Falls back
      // to the independent-frame writes when the shingles frame predates
      // the combined projection or the band parameters aren't recorded.
      shingles.write.mode("overwrite").parquet(s"$dir/shingles")
      val base = spark.read.parquet(s"$dir/shingles")
      val canDerive = base.columns.contains("ck") && base.columns.contains("sh") &&
        params.contains("bands") && params.contains("rowsPerBand")
      // keys and bands derive from the SAME written parquet and land in
      // different directories — two independent job chains, overlapped on
      // driver threads so the second write's tasks back-fill the first's
      // straggler tail (nothing orders them; the manifest below still
      // commits only after both)
      if (canDerive) {
        val nBands = params("bands").toInt
        val rpb = params("rowsPerBand").toInt
        runParallel(
          () => base.select(col("ck")).distinct()
            .write.mode("overwrite").parquet(s"$dir/keys"),
          () => bandTableFromShingles(base, col("cid"), col("sh"), nBands, rpb)
            .withColumnRenamed("id", "cid")
            .write.mode("overwrite").parquet(s"$dir/bands"))
      } else {
        runParallel(
          () => keys.write.mode("overwrite").parquet(s"$dir/keys"),
          () => bands.write.mode("overwrite").parquet(s"$dir/bands"))
      }
      // a rebuild resets the append state wholesale: clear any stale
      // single-writer lock a crashed appender left behind (appendDedupDelta
      // refuses while it exists), then stamp the fresh epoch-0 manifest
      val lockPath = new org.apache.hadoop.fs.Path(s"$dir/_append.lock")
      val lockFs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      lockFs.delete(lockPath, false): Unit
      writeManifest(spark, dir, params, appends = 0L, dirty = false)
    }
  }

  /** Persist `MANIFEST.json`. `appends` counts completed
    * [[appendDedupDelta]] epochs; `dirty` is set for the duration of an
    * append so an interrupted one (crash between the three table appends,
    * or a blind retry re-appending rows that already landed) is visible to
    * the next reader instead of silently poisoning the distinct-by-
    * construction claim (ADVICE r17).
    *
    * Written tmp + atomic rename, never an in-place truncate (ADVICE r18):
    * the manifest is rewritten twice per append (dirty-set, then the
    * clearing write after the three parquet appends), and a crash mid-write
    * or a reader racing a truncate-then-write could observe an EMPTY
    * manifest — the dirty/appends regexes then find nothing, so the very
    * mechanism added to catch interrupted appends would report clean/epoch-0
    * and wave a duplicating retry through. `Options.Rename.OVERWRITE` is the
    * same atomic-replace primitive Spark's own checkpoint file manager
    * relies on, and works on any Hadoop filesystem, not just file://. */
  private def writeManifest(spark: org.apache.spark.sql.SparkSession, dir: String,
      params: Map[String, Long], appends: Long, dirty: Boolean): Unit = {
    val pjson = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val manifest =
      s"""{"version":1,"appends":$appends,"dirty":${if (dirty) 1 else 0},""" +
        s""""tables":["keys","bands","shingles"],"params":$pjson}"""
    val path = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json.tmp")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(path.toUri, conf)
    fc.rename(tmp, path, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readManifest(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"no dedup artifact manifest at $dir")
    val len = fs.getFileStatus(path).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(path)
    try in.readFully(0L, buf) finally in.close()
    new String(buf, "UTF-8")
  }

  /** Load [[DedupArtifacts]] previously persisted by
    * [[DedupArtifacts.write]] — the other half of the storage contract.
    * Fails fast on a missing/alien directory (no manifest) or an
    * unsupported layout version rather than mis-joining partial tables. */
  def readArtifacts(spark: org.apache.spark.sql.SparkSession, dir: String): DedupArtifacts = {
    val manifest = readManifest(spark, dir)
    require(manifest.contains("\"version\":1"),
      s"unsupported dedup artifact layout at $dir: $manifest")
    val params = parseManifestParams(manifest)
    val scheme = for (b <- params.get("bands"); r <- params.get("rowsPerBand"))
      yield (b.toInt, r.toInt)
    DedupArtifacts(
      spark.read.parquet(s"$dir/keys"),
      spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/shingles"),
      scheme,
      // version-1 layouts are written by DedupArtifacts.write (keys pass a
      // distinct at build) and extended only by appendDedupDelta (admitted
      // keys are novel by the admission rules), so the key table is
      // distinct by construction — UNLESS the manifest says an append was
      // interrupted mid-flight (dirty=1): a crash between the three table
      // appends, or a blind retry that re-appended already-landed rows,
      // can leave duplicate ck rows, and skipping the distinct would then
      // multiply batch rows through every downstream left join (ADVICE
      // r17). A dirty dir degrades to the defensive distinct instead.
      keysDistinct = !manifestDirty(manifest),
      framesAtRest = true) // three independent parquet scans, no shared lineage
  }

  /** A manifest MISSING the `dirty` key counts as dirty: every version-1
    * manifest this code writes carries `appends` and `dirty`, so an absent
    * key means a torn or foreign file — exactly the state in which trusting
    * key distinctness (or an epoch default of 0) would let a retry
    * double-append (ADVICE r18: the old getOrElse defaults turned a torn
    * manifest into "clean, epoch 0", defeating the mechanism). */
  private def manifestDirty(manifest: String): Boolean =
    """"dirty":(\d+)""".r.findFirstMatchIn(manifest)
      .map(_.group(1) != "0").getOrElse(true)

  /** Completed-append epoch recorded in the manifest. Callers use it as an
    * idempotency key for [[appendDedupDelta]] retries. Refuses a manifest
    * with no `appends` key (every version-1 manifest is written with one,
    * so its absence means a torn or foreign file — defaulting to 0 would
    * hand retries a valid-looking idempotency key; ADVICE r18). */
  def readArtifactEpoch(spark: org.apache.spark.sql.SparkSession, dir: String): Long = {
    val m = readManifest(spark, dir)
    """"appends":(\d+)""".r.findFirstMatchIn(m).map(_.group(1).toLong).getOrElse {
      throw new IllegalArgumentException(
        s"dedup artifact manifest at $dir has no 'appends' epoch (torn or " +
          "foreign manifest): " + m)
    }
  }

  /** The `params` map recorded by [[DedupArtifacts.write]] (empty if none
    * were provided) — callers verify build-parameter compatibility before
    * deciding a batch against read-back artifacts. */
  def readArtifactParams(spark: org.apache.spark.sql.SparkSession, dir: String): Map[String, Long] =
    parseManifestParams(readManifest(spark, dir))

  private val ManifestMetaKeys = Set("version", "appends", "dirty")
  private def parseManifestParams(manifest: String): Map[String, Long] =
    """"([A-Za-z]+)":(-?\d+)""".r.findAllMatchIn(manifest)
      .filterNot(m => ManifestMetaKeys(m.group(1)))
      .map(m => m.group(1) -> m.group(2).toLong).toMap

  /** Append-only nightly fold-back at the STORAGE layer: write ONLY the
    * admitted documents' artifact rows into an existing artifact dir
    * (parquet append on each table), with build parameters taken from the
    * dir's own manifest so the delta can't be shingled differently from
    * the corpus. Equivalent to [[updateDedupArtifacts]] + a full rewrite —
    * admission guarantees every appended row is new (an admitted key is
    * absent from the corpus and unique in its batch) — but the nightly
    * cost is DELTA-sized: the union-and-rewrite cycle copies the entire
    * artifact set every night, which at 100 TB is a nightly full copy of
    * the dedup state. `decisions` is [[incrementalDedup]]'s output for
    * `batch` against these same artifacts.
    *
    * Parquet append is neither atomic nor idempotent, so the manifest
    * brackets each append with a `dirty` flag (set before the first table
    * append, cleared with the epoch bump after the last): a crash in
    * between leaves `dirty=1`, which makes [[readArtifacts]] fall back to
    * the defensive key distinct and makes the NEXT append refuse until the
    * dir is rebuilt — duplicated ck rows never silently multiply decisions
    * (ADVICE r17). `expectedEpoch` is the retry guard: pass the
    * [[readArtifactEpoch]] observed when the batch was decided and an
    * orchestrator-level retry of an append that actually completed (epoch
    * already bumped) becomes a no-op instead of a row-duplicating second
    * append. */
  def appendDedupDelta(artifactDir: String, batch: DataFrame,
      decisions: DataFrame, idCol: String, textCol: String,
      expectedEpoch: Option[Long] = None): Unit = {
    val spark = batch.sparkSession
    // Single-writer lock (ADVICE r18): expectedEpoch protects SEQUENTIAL
    // retries only — two CONCURRENT appenders would both read dirty=0 at
    // epoch N, both append (duplicate rows), and whichever clearing write
    // lands last would erase the evidence (dirty=0, epoch N+1). A
    // CREATE-NEW lock file makes the second appender fail loudly instead;
    // every manifest decision below happens under the lock. A crashed
    // appender leaves the lock behind alongside dirty=1 — both cleared by
    // the rebuild ([[DedupArtifacts.write]] removes a stale lock).
    val lockPath = new org.apache.hadoop.fs.Path(s"$artifactDir/_append.lock")
    val fs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = try fs.create(lockPath, false) catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(
          s"dedup artifact dir $artifactDir is locked by another appender " +
            "(_append.lock exists — concurrent appends are not supported; " +
            "if the holder crashed, the manifest is dirty and the dir " +
            s"needs a rebuild, which clears the lock): ${e.getMessage}")
    }
    lock.close()
    try {
    val manifest = readManifest(spark, artifactDir)
    require(manifest.contains("\"appends\":") && manifest.contains("\"dirty\":"),
      s"dedup artifact manifest at $artifactDir has no appends/dirty keys " +
        "(torn or pre-epoch manifest) — rebuild the artifacts before " +
        "appending deltas: " + manifest)
    require(!manifestDirty(manifest),
      s"dedup artifact dir $artifactDir has an interrupted append (dirty=1); " +
        "rebuild the artifacts before appending more deltas")
    val epoch = """"appends":(\d+)""".r.findFirstMatchIn(manifest)
      .map(_.group(1).toLong).getOrElse(0L)
    if (expectedEpoch.exists(_ != epoch)) return // completed retry: no-op
    val params = readArtifactParams(spark, artifactDir)
    writeManifest(spark, artifactDir, params, appends = epoch, dirty = true)
    val admitted = batch.join(
      decisions.filter(col("status") === "admitted").select(col(idCol)),
      Seq(idCol), "left_semi")
    // the delta's tokenized projection, materialized once (delta-sized):
    // three lazy frames would re-shingle the admitted text once per append
    val base = Projections.spread(admitted, col(idCol))
      .select(col(idCol).as("cid"),
        contentKey(col(textCol)).as("ck"),
        shingleHashes(col(textCol), params.getOrElse("ngram", 3L).toInt).as("sh"))
      .localCheckpoint()
    val nBands = params.getOrElse("bands", 32L).toInt
    val rpb = params.getOrElse("rowsPerBand", 2L).toInt
    // project onto the dir's existing column set: a pre-r11 artifact dir
    // stores shingles as (cid, sh) without the combined projection's ck,
    // and a mixed-schema parquet dir reads back nondeterministically
    val existing = spark.read.parquet(s"$artifactDir/shingles").columns.toSeq
    // the three appends read the SAME checkpointed delta and land in
    // different directories — independent jobs, overlapped on driver
    // threads (the dirty bracket is already set; the clearing manifest
    // write below still waits for all three, so the crash contract is
    // unchanged: any failure or crash leaves dirty=1)
    runParallel(
      () => base.select(col("ck")).distinct()
        .write.mode("append").parquet(s"$artifactDir/keys"),
      () => bandTableFromShingles(base, col("cid"), col("sh"), nBands, rpb)
        .withColumnRenamed("id", "cid")
        .write.mode("append").parquet(s"$artifactDir/bands"),
      () => base.select(existing.map(col): _*)
        .write.mode("append").parquet(s"$artifactDir/shingles"))
    writeManifest(spark, artifactDir, params, appends = epoch + 1, dirty = false)
    } finally {
      // released on success AND on refusal/failure paths where this JVM is
      // still alive (a refused append left no partial state; a failed one
      // left dirty=1, which blocks the next append regardless of the lock)
      fs.delete(lockPath, false): Unit
    }
  }

  /** Build [[DedupArtifacts]] from a corpus — the one corpus-sized job,
    * run once (then maintained incrementally, not recomputed).
    *
    * All three tables derive from ONE tokenized projection
    * `(cid, ck, sh)` — content key and shingle hashes computed in the same
    * pass over the text. The shingles frame carries the extra `ck` column
    * (harmless to its consumers, which select `cid`/`sh`), which is what
    * lets [[DedupArtifacts.write]] persist that projection once and derive
    * `keys`/`bands` from the written parquet instead of re-scanning and
    * re-tokenizing the corpus per table. */
  def buildDedupArtifacts(corpus: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 0, rowsPerBand: Int = 0,
      threshold: Double = 0.5): DedupArtifacts = {
    val (nBands, rpb) = resolveBanding(bands, rowsPerBand, threshold)
    val perms = nBands * rpb
    // deliberately NOT persisted (r17, measured): the three artifact tables
    // share this lineage, but their consumers either cut it themselves
    // (DedupArtifacts.write derives keys/bands from the written shingles
    // parquet; the streaming admission persists each stream-static table)
    // or evaluate it once — with the tokenize spread across the cluster a
    // re-run is cheaper than a corpus-sized cache fill + three block reads
    // (persisting here measured +3 s on both the streaming-admission and
    // artifact-cycle gates).
    val base = Projections.spread(corpus, col(idCol)).select(col(idCol).as("cid"),
      contentKey(col(textCol)).as("ck"), shingleHashes(col(textCol), ngram).as("sh"))
    val keys = base.select(col("ck")).distinct()
    val cBand = bandTableFromShingles(base, col("cid"), col("sh"), nBands, rpb)
      .withColumnRenamed("id", "cid")
    DedupArtifacts(keys, cBand, base, Some((nBands, rpb)), keysDistinct = true,
      framesAtRest = false) // all three are live derivations of `base`
  }

  /** Append the ADMITTED documents of a decided batch to the artifacts.
    * Plain insert-only unions — no distinct/re-dedup shuffle is needed
    * because admission guarantees novelty: an admitted key is absent from
    * the corpus (else `dup_exact_corpus`) and unique within its batch
    * (else `dup_exact_batch`), so every appended row is new. `decisions`
    * is [[incrementalDedup]]'s output for `batch`.
    *
    * The delta's band rows MUST be built under the SAME banding scheme as
    * the existing artifact bands — unioning rows from two schemes means new
    * docs' band hashes never collide with later batches (silent recall
    * loss). When the artifacts record their scheme ([[buildDedupArtifacts]]
    * and manifest-carrying [[readArtifacts]] both set it), that recorded
    * scheme is authoritative: explicit `bands`/`rowsPerBand` here must
    * match it or be left at the auto sentinel (0); `threshold` only feeds
    * the auto-resolution fallback for legacy scheme-less artifacts. */
  def updateDedupArtifacts(artifacts: DedupArtifacts, batch: DataFrame,
      decisions: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 0, rowsPerBand: Int = 0,
      threshold: Double = 0.5): DedupArtifacts = {
    val (nBands, rpb) = artifacts.banding match {
      case Some((ab, ar)) =>
        require((bands == 0 && rowsPerBand == 0) || (bands == ab && rowsPerBand == ar),
          s"artifact banding scheme is ${ab}x$ar; cannot update with ${bands}x$rowsPerBand")
        (ab, ar)
      case None => resolveBanding(bands, rowsPerBand, threshold)
    }
    val admitted = batch.join(
      decisions.filter(col("status") === "admitted").select(col(idCol)),
      Seq(idCol), "left_semi")
    val add = buildDedupArtifacts(admitted, idCol, textCol, ngram, nBands, rpb)
    DedupArtifacts(
      artifacts.keys.unionByName(add.keys),
      artifacts.bands.unionByName(add.bands),
      artifacts.shingles.unionByName(add.shingles),
      Some((nBands, rpb)),
      // an admitted key is absent from the corpus and unique in its batch,
      // so the union preserves the input's distinctness
      keysDistinct = artifacts.keysDistinct,
      // the delta legs are live derivations of one shared tokenize; the
      // delta is batch-sized, so inheriting the corpus side's answer keeps
      // the flag meaningful for the dominant frames
      framesAtRest = artifacts.framesAtRest)
  }

  /** [[incrementalDedup]] against persisted [[DedupArtifacts]] — the form
    * whose per-batch plan contains NO corpus text scan (pinned in
    * PlanAuditSpec): corpus participation is three joins against the
    * artifact tables (key set, band rows, candidate shingle sets).
    *
    * The batch MUST be banded under the artifacts' own scheme — a batch
    * banded 32x2 against 17x4 artifact bands produces band hashes that can
    * NEVER collide with the corpus rows, silently admitting every near-dup
    * (the same hazard [[updateDedupArtifacts]] guards). When the artifacts
    * record their scheme it is authoritative: explicit `bands`/`rowsPerBand`
    * must match it or be the auto sentinel (0, 0); `threshold`-based
    * auto-resolution applies only to legacy scheme-less artifacts. */
  def incrementalDedup(batch: DataFrame, artifacts: DedupArtifacts,
      idCol: String, textCol: String, ngram: Int, bands: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val (nBands, rpb) = artifacts.banding match {
      case Some((ab, ar)) =>
        require((bands == 0 && rowsPerBand == 0) || (bands == ab && rowsPerBand == ar),
          s"artifact banding scheme is ${ab}x$ar; cannot decide batch with ${bands}x$rowsPerBand")
        (ab, ar)
      case None => resolveBanding(bands, rowsPerBand, threshold)
    }
    val perms = nBands * rpb
    // ONE tokenize pass over the batch, materialized (localCheckpoint —
    // batch-sized by definition): the content-key rung, the LSH banding,
    // both exact-Jaccard confirms and the within-batch self-join all reuse
    // these arrays. The previous shape re-ran the regex shingling +
    // per-shingle md5 in every leg (and a second full minhash inside the
    // within-batch minhashNearDups), which dominated the nightly decision.
    val base = Projections.spread(batch, col(idCol)).select(col(idCol).as("id"),
        contentKey(col(textCol)).as("ck"),
        shingleHashes(col(textCol), ngram).as("sh"))
      .localCheckpoint()
    // a duplicated artifact key would multiply batch rows through the
    // join, but the defensive distinct is a CORPUS-WIDE exchange on every
    // nightly decide — skipped when the artifacts' provenance guarantees
    // distinctness (built/read/updated through this module, r17); only
    // hand-assembled artifact frames still pay it
    val ckeys = (if (artifacts.keysDistinct) artifacts.keys.select(col("ck"))
                 else artifacts.keys.select(col("ck")).distinct())
      .withColumn("in_corpus", lit(true))
    val flagged = base.select("id", "ck").join(ckeys, Seq("ck"), "left")
      .withColumn("in_corpus", coalesce(col("in_corpus"), lit(false)))
    // within-batch exact keep-min, computed only over keys the corpus lacks
    // (a key the corpus has rejects ALL its batch holders as rule 1)
    val keepers = flagged.filter(!col("in_corpus"))
      .groupBy("ck").agg(min("id").as("keep_id"))
    val exact = flagged.join(keepers, Seq("ck"), "left")
      .select(col("id"),
        when(col("in_corpus"), "dup_exact_corpus")
          .when(col("id") =!= col("keep_id"), "dup_exact_batch").as("exact_status"))
    val survIds = exact.filter(col("exact_status").isNull).select("id")

    // near-dup vs corpus: batch bands join corpus bands, exact-Jaccard confirm
    val bH = base.join(survIds, Seq("id"), "left_semi").select("id", "sh")
    val bBand = bandTableFromShingles(bH, col("id"), col("sh"), nBands, rpb)
    val candIds = bBand.join(artifacts.bands, Seq("band_idx", "band_hash"))
      .select("id", "cid").dropDuplicates("id", "cid")
    val nearCorpus = candIds
      .join(bH.select(col("id"), col("sh").as("sh_b")), Seq("id"))
      .join(artifacts.shingles.select(col("cid"), col("sh").as("sh_c")), Seq("cid"))
      .withColumn("inter", intersectCount(col("sh_b"), col("sh_c")).cast("double"))
      .filter(col("inter") / (size(col("sh_b")) + size(col("sh_c")) - col("inter")) >= threshold)
      .select("id").distinct().withColumn("near_corpus", lit(true))

    // near-dup within the still-standing batch (smaller id wins): the band
    // rows already computed for the survivors are filtered to the standing
    // set and self-joined — no second minhash pass (per-row minhash is
    // deterministic, so these rows are identical to re-banding standing)
    val standingIds = survIds.join(nearCorpus, Seq("id"), "left_anti")
    val sBand = bBand.join(standingIds, Seq("id"), "left_semi")
    val candBatch = sBand.select(col("band_idx"), col("band_hash"), col("id").as("id_1"))
      .join(sBand.select(col("band_idx"), col("band_hash"), col("id").as("id_2")),
        Seq("band_idx", "band_hash"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2").dropDuplicates("id_1", "id_2")
    val nearBatch = candBatch
      .join(base.select(col("id").as("id_1"), col("sh").as("sh_1")), Seq("id_1"))
      .join(base.select(col("id").as("id_2"), col("sh").as("sh_2")), Seq("id_2"))
      .withColumn("inter", intersectCount(col("sh_1"), col("sh_2")).cast("double"))
      .filter(col("inter") / (size(col("sh_1")) + size(col("sh_2")) - col("inter")) >= threshold)
      .select(col("id_2").as("id")).distinct().withColumn("near_batch", lit(true))

    exact
      .join(nearCorpus, Seq("id"), "left")
      .join(nearBatch, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("exact_status"),
          when(col("near_corpus"), "near_dup_corpus"),
          when(col("near_batch"), "near_dup_batch"),
          lit("admitted")).as("status"))
  }

  /** Exact word n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter)
  }
}
