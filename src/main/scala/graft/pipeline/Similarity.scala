package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Similarity search over an embedding column (`array<float>`).
  *
  * Vectors are quantized to integers (`round(x * 1000)`) before any
  * arithmetic so every dot product is an exact integer sum — bit-identical
  * across engines and partitionings (no FP order dependence), which makes
  * the operators oracle-checkable. Cosine values derived from those exact
  * integers are then deterministic doubles.
  *
  * Scale design:
  *  - [[bruteForceTopK]] broadcasts the (small) query set and streams the
  *    corpus once — the right baseline shape for "k queries vs 100 TB
  *    corpus";
  *  - [[lshTopK]] buckets the corpus by sign-random-projection so each query
  *    only scans its bucket — the scale path when the query set is large;
  *    deterministic hyperplanes derived from md5 so results are reproducible;
  *  - every top-k is two-phase via [[graft.functions.TopKByDot]]: bounded
  *    per-partition state + a k-way merge over ≤ partitions×k rows — never a
  *    per-query window rank (which funnels corpus-sized data through one
  *    reducer per query at scale).
  */
object Similarity {

  /** Quantize an array<float/double> to array<long> (milli-units). */
  def quantize(v: Column): Column =
    expr(s"transform(${v.toString}, x -> cast(round(x * 1000) as bigint))")

  /** Exact integer dot product of two array<long> columns, backed by the
    * native codegen'd [[graft.functions.DotLong]] expression. The lambda
    * spelling (`aggregate(zip_with(...))`) is interpreted and measured ~480×
    * slower when evaluated per candidate pair inside a join. */
  def dotLong(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.columnOf(graft.functions.DotLong(
      org.apache.spark.sql.graft.bridge.expressionOf(a),
      org.apache.spark.sql.graft.bridge.expressionOf(b)))

  /** Cosine from quantized vectors (deterministic double). */
  def cosineQ(a: Column, b: Column): Column =
    dotLong(a, b) / (sqrt(dotLong(a, a).cast("double")) * sqrt(dotLong(b, b).cast("double")))

  /** k best (dot DESC, neighbor_id ASC) rows per query from a candidate
    * frame carrying (query_id, neighbor_id, dot [, cosine]) — grouped
    * through the bounded [[graft.functions.TopKByDot]] aggregate: map-side
    * partial state ≤ k per (query, partition), exchange of ≤ partitions×k
    * entries per query, k-way final merge. The per-group analog of
    * TakeOrderedAndProject. */
  private def topKPerQuery(cand: DataFrame, k: Int, idType: DataType,
      withCosine: Boolean): DataFrame = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    val tk = columnOf(graft.functions.TopKByDot(
      expressionOf(col("dot")),
      expressionOf(col("neighbor_id").cast("long")),
      expressionOf((if (withCosine) col("cosine") else lit(0.0)).cast("double")),
      k).toAggregateExpression())
    val exploded = cand.groupBy(col("query_id")).agg(tk.as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
    if (withCosine)
      exploded.select(col("query_id"), col("e.id").cast(idType).as("neighbor_id"),
        col("e.dot").as("dot"), round(col("e.payload"), 6).as("cosine"))
    else
      exploded.select(col("query_id"), col("e.id").cast(idType).as("neighbor_id"),
        col("e.dot").as("dot"))
  }

  /** Exact top-k neighbors for each query vector by quantized cosine.
    * `queries` must be small (broadcast); the corpus side streams.
    * Output: (query_id, neighbor_id, dot, cosine) — k rows per query,
    * ranked by (dot desc, neighbor_id) for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms are per-VECTOR quantities — computed once per row before the
    // join, never per candidate pair
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dotLong(col("qv"), col("qv")).cast("double"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(dotLong(col("cv"), col("cv")).cast("double")))
    val joined = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", dotLong(col("qv"), col("cv")))
      .withColumn("cosine", col("dot") / (col("qn") * col("cn")))
    topKPerQuery(joined, k, corpus.schema(idCol).dataType, withCosine = true)
  }

  /** HARD-NEGATIVE mining for contrastive/metric training: each query's k
    * most similar vectors with a DIFFERENT label — the "nearest wrong
    * answer" set that contrastive losses need (random negatives are too
    * easy; these are the ones the model confuses). Same broadcast-query /
    * corpus-stream shape as [[bruteForceTopK]] with the label inequality
    * fused into the join predicate, so wrong-label candidates are never
    * even ranked; swap the candidate source for the PQ/IVF paths at
    * corpus scale.
    *
    * Output: query_id, neighbor_id, dot, `neg_label`. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qv"), col(labelCol).as("__ql")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("cv"), col(labelCol).as("__cl"))
    val cand = c.join(q,
        col("neighbor_id") =!= col("query_id") && col("__cl") =!= col("__ql"))
      .withColumn("dot", dotLong(col("qv"), col("cv")))
    val ranked = topKPerQuery(
      cand.select(col("query_id"), col("neighbor_id"), col("dot")),
      k, corpus.schema(idCol).dataType, withCosine = false)
    ranked.join(corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("neg_label")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("dot"), col("neg_label"))
  }

  /** kNN CLASSIFICATION eval: predict each query's label by majority vote
    * of its k nearest neighbors (self excluded; vote ties → smaller
    * label — deterministic), reported against the query's own label. The
    * standard embedding-quality acceptance row: if kNN can't recover the
    * labels, no downstream classifier will.
    *
    * Output: query_id, true_label, predicted_label, `correct`. */
  def knnClassify(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val ranked = bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).cast("long").as("__nl")), Seq("neighbor_id"))
    val votes = ranked.groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__votes"))
      .groupBy(col("query_id"))
      .agg(max(struct(col("__votes"), -col("__nl"))).as("__best"))
      .select(col("query_id"), (-col("__best.col2")).as("predicted_label"))
    votes.join(queries.select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("true_label")), Seq("query_id"))
      .select(col("query_id"), col("true_label"), col("predicted_label"),
        (col("true_label") === col("predicted_label")).as("correct"))
  }

  /** Sign-random-projection bucket id for hash table `table` over `planes`
    * deterministic hyperplanes. Plane p's component j is an md5-derived value
    * in [-500, 500] — fixed by (table, p, j), engine-portable. The planes are
    * PRECOMPUTED at plan-build time and inlined as literal arrays (hashing
    * them per row cost more than the dot products themselves). */
  def srpBucket(qv: Column, dims: Int, planes: Int, table: Int): Column = {
    val bitExprs = (0 until planes).map { p =>
      val weights = planeWeights(table, p, dims).map(w => s"${w}L").mkString("array(", ", ", ")")
      // dot(plane_{table,p}, v) > 0 → bit p — native dotl, not the
      // interpreted lambda spelling (see [[dotLong]])
      val terms = s"dotl(${qv.toString}, $weights)"
      s"if($terms > 0, ${1L << p}L, 0L)"
    }
    expr(bitExprs.mkString(" + "))
  }

  /** Exposed within the project so the DuckDB oracles can inline the SAME
    * deterministic hyperplanes as SQL literals — the LSH paths are exactly
    * reproducible, not just approximately. */
  private[graft] def planeWeights(table: Int, p: Int, dims: Int): Seq[Long] =
    (0 until dims).map(j => Math.floorMod(Hashing.md5LongJvm(s"plane_$table-$p-$j"), 1001L) - 500L)

  /** All `tables` bucket ids in ONE expression returning
    * `array<struct<tbl:int, bkt:bigint>>`, for `explode`.
    *
    * Why not `array(struct(srpBucket(t=0)), …)`: each srpBucket references
    * the quantized-vector column, and CollapseProject inlines the
    * (interpreted-lambda) quantization into EVERY reference — tables×planes
    * re-evaluations per row. Here the vector expression is the HOF's
    * *argument* (evaluated once per row) and rebinds as the lambda variable
    * `v`; the hyperplanes are foldable literals and each dot product is the
    * native [[graft.functions.DotLong]]. */
  def srpBuckets(qv: Column, dims: Int, planes: Int, tables: Int): Column = {
    // built with the typed Column API, not an expr() string: tables×planes
    // literal weight arrays spelled as SQL text made the one-off plan cost
    // (parse + constant folding + codegen) ~10 s — typedLit arrays are
    // already Literals and plan in milliseconds
    val perTable = (v: Column) => array((0 until tables).map { t =>
      val bits = (0 until planes).map { p =>
        val w = typedLit(planeWeights(t, p, dims))
        when(dotLong(v, w) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bits.as("bkt"))
    }: _*)
    flatten(transform(array(qv), perTable))
  }

  /** SRP depth (planes per table) that holds bucket occupancy near
    * `targetPerBucket` for an `n`-vector corpus: `ceil(log2(n / target))`,
    * clamped to [2, 20] (bucket ids pack into an i64 well past 20 planes;
    * below 2 the tables stop discriminating).
    *
    * Why this exists (r11 scale sweep): LSH candidate cost is
    * sum-over-buckets of occupancy², so FIXED planes make candidates grow
    * QUADRATICALLY with the corpus — the 10× rehearsal ran
    * [[cosineNearDups]]' default 4 planes at 10× vectors and paid ~100×
    * the confirm cost. Each extra plane halves expected occupancy, so
    * depth must grow with log2(n) to keep per-vector candidate work
    * constant; recall lost to the deeper code is bought back with more
    * `tables` (cost grows linearly with tables, never quadratically).
    * Since r13 this IS the default sizing of [[cosineNearDups]] (planes=0
    * auto-derives from a one-time corpus count); pass `planes` explicitly
    * only to pin a scheme.
    *
    * Computed in INTEGER arithmetic — `ceil(log2(ceil(n / target)))`,
    * provably equal to `ceil(log2(n / target))` since no integer separates
    * 2^(k-1) from x ≤ ceil(x) ≤ 2^k — so the DuckDB oracles can replicate
    * the value bit-exactly (a float log2 at an exact power of two may land
    * on either side of the integer on different libm builds). */
  def srpPlanesFor(n: Long, targetPerBucket: Long = 64L): Int = {
    require(n >= 0 && targetPerBucket > 0, s"bad srpPlanesFor($n, $targetPerBucket)")
    if (n == 0L) return 2 // empty corpus: minimum depth (result is empty anyway)
    // ceil(n / target) without the +target-1 overflow at n near Long.Max
    val m = n / targetPerBucket + (if (n % targetPerBucket == 0L) 0L else 1L)
    val raw = if (m <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1L)
    math.min(20, math.max(2, raw))
  }

  /** Embedding-cosine near-duplicate pairs: all (id_1 < id_2) pairs with
    * quantized cosine ≥ `threshold`. Output: (id_1, id_2, dot, cosine).
    *
    * The DEFAULT is the scale path: candidates are generated by SRP-LSH
    * bucket co-occurrence (shuffle on (table, bucket), never a cross join)
    * and then exact-confirmed — recall grows with `tables` at proportional
    * cost, and the pair space never goes O(n²). Set `lshPrefilter = false`
    * for the exact self-join — right only when the corpus is a filtered
    * slice or small enough that an n² pair space is acceptable; that mode is
    * the oracle-checked slice, and LSH recall against it is spec-tested.
    *
    * `planes = 0` (the default) AUTO-SIZES the SRP depth: the corpus is
    * counted once (one narrow job) and `planes = srpPlanesFor(n)` — the
    * r11 scale sweep showed any FIXED depth makes bucket occupancy, hence
    * candidate pairs, grow quadratically with the corpus (the old
    * gate-scale 4-plane default paid ~100× the confirm cost at 10×). Pass
    * `planes` explicitly only to pin a scheme (e.g. an oracle or a
    * pre-agreed index layout shared with a reader). NOTE the auto count is
    * a full execution of the corpus lineage — callers with an expensive
    * upstream plan should cache/checkpoint first (or pin `planes`). An
    * empty corpus auto-sizes to the minimum depth and returns empty. */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, lshPrefilter: Boolean = true, dims: Int = 64,
      planes: Int = 0, tables: Int = 16): DataFrame = {
    require(planes >= 0, s"planes must be >= 0 (0 = auto), got $planes")
    // quantized vector + norm computed ONCE per row (norms are per-vector,
    // not per-pair quantities) and PERSISTED (spillable): the bucket leg
    // and both confirm legs consume this projection, and under planes=0
    // the auto-depth count() is the scan that warms the cache — one pass
    // over the corpus serves all four consumers (r14; the same
    // multi-consumer lesson as the Dedup projections).
    // Lifetime: registered — see the Projections caching contract.
    val v = Projections.register(
      Projections.spread(corpus, col(idCol))
        .select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
        .withColumn("nrm", sqrt(dotLong(col("qv"), col("qv")).cast("double")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nPlanes =
      if (planes > 0 || !lshPrefilter) math.max(planes, 1) // exact mode never buckets
      else srpPlanesFor(v.count())
    val pairs =
      if (!lshPrefilter) {
        val l = v.select(col("id").as("id_1"), col("qv").as("qv_1"), col("nrm").as("nrm_1"))
        val r = v.select(col("id").as("id_2"), col("qv").as("qv_2"), col("nrm").as("nrm_2"))
        l.join(r, col("id_1") < col("id_2"))
      } else {
        val banded = v
          .select(col("id"), explode(srpBuckets(col("qv"), dims, nPlanes, tables)).as("tb"))
          .select(col("id"), col("tb.tbl"), col("tb.bkt"))
        val cand = banded.as("a").join(banded.as("b"), Seq("tbl", "bkt"))
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("id_1"), col("b.id").as("id_2"))
          .dropDuplicates("id_1", "id_2")
        cand
          .join(v.select(col("id").as("id_1"), col("qv").as("qv_1"), col("nrm").as("nrm_1")), Seq("id_1"))
          .join(v.select(col("id").as("id_2"), col("qv").as("qv_2"), col("nrm").as("nrm_2")), Seq("id_2"))
      }
    pairs
      .withColumn("dot", dotLong(col("qv_1"), col("qv_2")))
      .withColumn("cosine", col("dot") / (col("nrm_1") * col("nrm_2")))
      .filter(col("cosine") >= threshold)
      .select(col("id_1"), col("id_2"), col("dot"), round(col("cosine"), 6).as("cosine"))
  }

  /** `array<struct<nd, cid>>` of the `keep` nearest centroids (dot DESC, cid
    * ASC) — ONE codegen'd map-side expression over the plan-time centroid
    * literals: no per-row centroid join, no nClusters× row inflation, no
    * argmax window (`nd` is the negated dot, so lexicographic struct sort
    * ranks directly). The centroid list is tiny (nClusters × dims longs) and
    * known at plan time, so inlining beats broadcasting a join side. */
  private[graft] def nearestCells(vec: Column, cents: Seq[(Long, Seq[Long])], keep: Int): Column =
    slice(sort_array(array(cents.map { case (cid, cv) =>
      struct((-dotLong(vec, typedLit(cv))).as("nd"), lit(cid).as("cid"))
    }: _*)), 1, keep)

  private[graft] def collectCentroids(df: DataFrame): Seq[(Long, Seq[Long])] =
    df.collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).sortBy(_._1)

  /** Map-side nearest-centroid CLASSIFICATION — embedding-based domain/
    * topic tagging, the labeling step that feeds domain-weighted mixing:
    * each vector is tagged with the centroid id maximizing the exact
    * integer dot product (ties → smaller cid). The centroid set is labels,
    * not data — it is collected and inlined as plan-time literals (the
    * [[srpBuckets]]/nearestCells trick): zero joins, zero row inflation,
    * the whole pass stays inside one codegen'd projection at any corpus
    * size. Output: `(idCol, cid, dot)`. */
  def classifyByCentroids(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String): DataFrame = {
    val cents = collectCentroids(
      centroids.select(col(centIdCol).cast("long"), quantize(col(centVecCol))))
    require(cents.nonEmpty, "classifyByCentroids needs at least one centroid")
    df.select(col(idCol), quantize(col(vecCol)).as("qv"))
      .withColumn("best", element_at(nearestCells(col("qv"), cents, 1), 1))
      .select(col(idCol), col("best.cid").as("cid"), (-col("best.nd")).as("dot"))
  }

  /** Scalar (per-dimension min/max) embedding quantization — the int8-style
    * compression every large vector store applies before ANN (e.g. FAISS
    * `ScalarQuantizer`): dimension i of every vector is linearly mapped from
    * the corpus-wide [min_i, max_i] onto `levels` integer codes.
    *
    * Two phases, both scale-safe: (1) per-dim min/max is ONE map-side-
    * combined aggregation whose result is `dims` rows — a bounded collect
    * (same discipline as the IVF centroid collect); (2) encoding is a
    * single codegen'd projection with the bounds inlined as array literals —
    * no join, no shuffle, no second scan of the vectors.
    *
    * The code formula `floor((v - mn) * (levels-1) / (mx - mn))`, clamped to
    * [0, levels-1], is evaluated in IEEE double with this exact association
    * on both engines, so results are bit-reproducible.
    *
    * Output: id, `n_dims`, first/last codes as witnesses, `q_sum` (sum of
    * codes), and `fp` — md5-fingerprint of the comma-joined code string, so
    * an oracle mismatch anywhere in any vector is visible. */
  def scalarQuantize(embs: DataFrame, idCol: String, vecCol: String,
      levels: Int = 256): DataFrame = {
    require(levels >= 2, s"levels must be >= 2, got $levels")
    val bounds = embs
      .select(posexplode(col(vecCol)).as(Seq("i", "v")))
      // cast up front so the collected rows are doubles for ANY numeric
      // element type (array<float>, array<double>, array<int>)
      .groupBy("i").agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .orderBy("i")
      .collect() // bounded: one row per embedding DIMENSION, not per vector
    require(bounds.nonEmpty, "scalarQuantize needs at least one vector")
    val mnLit = array(bounds.toSeq.map(r => lit(r.getDouble(1))): _*)
    val mxLit = array(bounds.toSeq.map(r => lit(r.getDouble(2))): _*)
    val top = lit((levels - 1).toDouble)
    val codes = transform(col(vecCol), (x, i) => {
      val mn = element_at(mnLit, i + 1)
      val mx = element_at(mxLit, i + 1)
      when(mx === mn, lit(0L)).otherwise(
        least(greatest(
          floor((x.cast("double") - mn) * top / (mx - mn)),
          lit(0L)), lit((levels - 1).toLong)))
    })
    embs
      .withColumn("_codes", codes)
      .select(col(idCol),
        size(col("_codes")).cast("long").as("n_dims"),
        element_at(col("_codes"), 1).as("q_first"),
        element_at(col("_codes"), size(col("_codes"))).as("q_last"),
        aggregate(col("_codes"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        Hashing.md5Long(concat_ws(",",
          transform(col("_codes"), _.cast("string")))).as("fp"))
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned into
    * `nClusters` cells around centroid vectors; a query exact-ranks only the
    * cells its `nProbe` closest centroids own — candidates ∝ corpus/nClusters
    * × nProbe instead of the full corpus. The 100 TB shape: centroids are
    * plan-time literals (they are tiny), cell assignment is one codegen'd
    * map-side pass, the probe join broadcasts the (small) probe set so
    * candidates never shuffle, and the final ranking is the two-phase
    * bounded top-k.
    *
    * Centroids seed from the `nClusters` lowest-id corpus vectors; with
    * `lloydIters > 0` they are refined by that many k-means (Lloyd)
    * rounds — assignment by exact integer dot, new centroid = element-wise
    * truncated integer mean of the cell — each round one map-side assign
    * pass + one (cid, dim)-keyed aggregation, all in integer arithmetic, so
    * the result stays fully DETERMINISTIC and oracle-checkable. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nClusters: Int = 16, nProbe: Int = 4, lloydIters: Int = 0): DataFrame = {
    val v = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))

    // seed centroids: nClusters lowest-id vectors — one tiny TakeOrdered job
    var cents = collectCentroids(
      v.orderBy(col("neighbor_id")).limit(nClusters)
        .select(col("neighbor_id").cast("long"), col("cv")))

    // Lloyd refinement: per round, one map-side assign pass over the corpus
    // plus a (cid, dim)-keyed integer aggregation — never wider than
    // nClusters × dims rows after the partial agg. Mean is the TRUNCATED
    // integer quotient (Spark double-division cast, trunc() in the oracle).
    (0 until lloydIters).foreach { _ =>
      val assigned = v.select(
        element_at(nearestCells(col("cv"), cents, 1), 1).getField("cid").as("cid"),
        col("cv"))
      cents = collectCentroids(assigned
        .select(col("cid"), posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg((sum(col("x")) / count(lit(1))).cast("long").as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cid"), expr("transform(dm, e -> e.m)").as("centroid")))
    }

    // corpus: home cell only; queries: nProbe probe cells — both map-side
    val cells = v.withColumn("cid",
      element_at(nearestCells(col("cv"), cents, 1), 1).getField("cid"))
    val qv = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
    val probes = qv
      .withColumn("cell", explode(nearestCells(col("qv"), cents, nProbe)))
      .select(col("query_id"), col("qv"), col("cell.cid").as("cid"))

    // probes are queries×nProbe rows — broadcast them so the corpus-sized
    // cell frame never shuffles (a shuffle keyed on ≤ nClusters values would
    // be skew-prone at scale)
    val cand = cells.join(broadcast(probes), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", dotLong(col("qv"), col("cv")))
    topKPerQuery(cand, k, corpus.schema(idCol).dataType, withCosine = false)
  }

  /** Persisted IVF index: centroids + inverted lists as parquet with a
    * MANIFEST.json — the nightly-build / query-time boundary for the ANN
    * path, the same production shape as [[Dedup.DedupArtifacts]]: the
    * index is built ONCE over the corpus, and every query-time probe scans
    * only the artifact directory (centroids are a bounded collect of
    * nClusters rows; candidates come from the postings table), never the
    * raw embedding table. */
  final case class IvfIndex(centroids: DataFrame, postings: DataFrame)

  /** Build the index frames: `centroids(cid, centroid)` and
    * `postings(cid, neighbor_id, cv)` — identical centroid/assignment
    * derivation as [[ivfTopK]] (lowest-id seeds + optional Lloyd), so a
    * persisted index answers queries exactly as the inline path does. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, lloydIters: Int = 0): IvfIndex = {
    val v = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      quantize(col(vecCol)).as("cv"))
    var cents = collectCentroids(
      v.orderBy(col("neighbor_id")).limit(nClusters)
        .select(col("neighbor_id"), col("cv")))
    (0 until lloydIters).foreach { _ =>
      val assigned = v.select(
        element_at(nearestCells(col("cv"), cents, 1), 1).getField("cid").as("cid"),
        col("cv"))
      cents = collectCentroids(assigned
        .select(col("cid"), posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg((sum(col("x")) / count(lit(1))).cast("long").as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cid"), expr("transform(dm, e -> e.m)").as("centroid")))
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroidsDf = cents.toDF("cid", "centroid")
    val postings = v.withColumn("cid",
      element_at(nearestCells(col("cv"), cents, 1), 1).getField("cid"))
      .select(col("cid"), col("neighbor_id"), col("cv"))
    IvfIndex(centroidsDf, postings)
  }

  /** Persist the index (two parquet tables + manifest with layout version
    * and build params; fail-fast on read for alien layouts). */
  def writeIvfIndex(index: IvfIndex, dir: String,
      params: Map[String, Long] = Map.empty): Unit = {
    val spark = index.centroids.sparkSession
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    index.postings.write.mode("overwrite").parquet(s"$dir/postings")
    val pjson = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val manifest =
      s"""{"version":1,"tables":["centroids","postings"],"params":$pjson}"""
    val path = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  def readIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"not an IVF index directory (no MANIFEST.json): $dir")
    val manifest = {
      val len = fs.getFileStatus(path).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(path)
      try in.readFully(0L, buf) finally in.close()
      new String(buf, "UTF-8")
    }
    require(manifest.contains("\"version\":1") && manifest.contains("\"centroids\""),
      s"unrecognized IVF index layout in $dir: $manifest")
    IvfIndex(spark.read.parquet(s"$dir/centroids"), spark.read.parquet(s"$dir/postings"))
  }

  /** Query a (possibly read-back) [[IvfIndex]]: identical ranking to
    * [[ivfTopK]] but the corpus side is the POSTINGS table — probes
    * (queries × nProbe rows) broadcast against it; the raw embedding
    * table is never touched at query time. */
  def ivfTopKIndexed(index: IvfIndex, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val cents = collectCentroids(index.centroids.select(col("cid"), col("centroid")))
    val qv = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
    val probes = qv
      .withColumn("cell", explode(nearestCells(col("qv"), cents, nProbe)))
      .select(col("query_id"), col("qv"), col("cell.cid").as("cid"))
    val cand = index.postings.join(broadcast(probes), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", dotLong(col("qv"), col("cv")))
    topKPerQuery(cand, k, queries.schema(idCol).dataType, withCosine = false)
  }

  // ---------------- product quantization (ADC) ----------------

  /** PQ sub-codebooks (Jégou/Douze/Schmid, "Product quantization for
    * nearest neighbor search", PAMI 2011): the vector space splits into
    * `m` contiguous subspaces of dims/m coordinates; sub-codebook j is the
    * j-th slice of the `ksub` lowest-id corpus vectors (the deterministic
    * IVF seeding convention — a Lloyd refinement per subspace would reuse
    * [[ivfTopK]]'s integer k-means machinery verbatim; seeds keep the
    * oracle derivation closed-form and the recall row quantifies what
    * they give up). Returns `codebooks(j)(c)` = centroid c of subspace j,
    * in quantized integer coordinates. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int): Seq[Seq[Seq[Long]]] = {
    require(m > 0 && ksub > 0, s"m and ksub must be positive, got $m, $ksub")
    val seeds = collectCentroids(
      corpus.orderBy(col(idCol)).limit(ksub)
        .select(col(idCol).cast("long"), quantize(col(vecCol))))
    require(seeds.size == ksub, s"corpus has ${seeds.size} < ksub=$ksub vectors")
    val dims = seeds.head._2.size
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val sub = dims / m
    (0 until m).map(j => seeds.map { case (_, v) => v.slice(j * sub, j * sub + sub) })
  }

  /** Encode every corpus vector as `m` one-byte-scale codes: code j is the
    * sub-codebook entry minimizing exact integer L2 distance on subspace j
    * (spelled `|c|² − 2·x·c` — the `|x|²` term is constant per subspace —
    * ties → smaller centroid index). ONE codegen'd projection over the
    * corpus with the codebooks inlined as literals: m×ksub native DotLong
    * products per row, no join, no shuffle. The codes table is the
    * m-bytes-per-vector representation the 100 TB ANN serving path scans
    * instead of raw embeddings (a 64-dim float vector compresses 32×).
    *
    * Output: (neighbor_id, codes array<int> of length m). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Long]]]): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"),
      pqCodeArray(col(vecCol), codebooks).as("codes"))

  /** PQ approximate top-k by ASYMMETRIC DISTANCE COMPUTATION: the query
    * stays un-quantized; its per-subspace dot products against every
    * sub-codebook entry form an m×ksub lookup table (computed driver-side
    * in exact integer arithmetic — queries are a bounded set, the
    * [[graft.pipeline.Search.hybridTopK]] contract), and a corpus
    * vector's approximate dot is m table lookups on its CODES — the
    * serving scan never touches raw embeddings. The LUT frame
    * (queries × m·ksub longs) broadcasts against the codes scan; ranking
    * is the bounded two-phase top-k. Approximation quality is graded by
    * [[pqRecall]].
    *
    * Output: query_id, neighbor_id, `approx_dot` (the ADC estimate of the
    * quantized dot product). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, ksub: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebooks = pqCodebooks(corpus, idCol, vecCol, m, ksub)
    // the codes table IS the index artifact (built once, served many — the
    // DedupArtifacts/IvfIndex boundary): materialize it so the m×ksub
    // encode expression is compiled and evaluated in its own small stage,
    // not re-embedded in every query's candidate plan (measured 13 s of
    // per-query codegen overhead when inlined at sf0.1)
    val codes = pqEncode(corpus, idCol, vecCol, codebooks).localCheckpoint(true)
    val qs = queries.select(col(idCol).cast("long"), quantize(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toSeq
    val luts = qs.map { case (qid, qv) =>
      val flat = (0 until m).flatMap { j =>
        val sub = codebooks(j).head.size
        val qj = qv.slice(j * sub, j * sub + sub)
        codebooks(j).map(c => qj.iterator.zip(c.iterator).map { case (a, b) => a * b }.sum)
      }
      (qid, flat)
    }
    val lutDf = luts.toDF("query_id", "__lut")
    // approximate dot = m codegen'd element_at lookups, summed
    val approx = (0 until m)
      .map(j => element_at(col("__lut"),
        lit(j * ksub + 1) + element_at(col("codes"), j + 1)))
      .reduce(_ + _)
    val cand = codes.crossJoin(broadcast(lutDf))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", approx)
    topKPerQuery(cand, k, queries.schema(idCol).dataType, withCosine = false)
      .withColumnRenamed("dot", "approx_dot")
  }

  /** [[lshRecall]]'s harness pointed at the PQ/ADC ranking — the metric
    * that decides whether m×ksub is enough codebook for the corpus. */
  def pqRecall(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int = 8, ksub: Int = 16): DataFrame =
    recallVsExact(bruteForceTopK(corpus, queries, idCol, vecCol, k),
      pqTopK(corpus, queries, idCol, vecCol, k, m, ksub))

  /** IVF-PQ: the production ANN composition (the FAISS `IVFx,PQy` shape) —
    * the IVF coarse quantizer prunes the corpus to the probed cells'
    * postings, and the PQ codes rank those candidates by ADC, so query
    * cost is `(corpus/nClusters × nProbe)` candidates × m table lookups
    * and the serving scan touches only (cid, codes) rows — never a raw
    * embedding. Cell assignment and PQ encoding happen in the SAME
    * map-side projection over the corpus (both are pure expressions on
    * the quantized vector with plan-time-literal centroids); probes carry
    * their query's LUT, so after the ONE broadcast join everything is a
    * lookup. Codes quantize the vector itself (not the cell residual —
    * residual codebooks would need per-cell training; the recall row
    * prices the simplification).
    *
    * Output: query_id, neighbor_id, `approx_dot`. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nClusters: Int = 16, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = collectCentroids(
      corpus.orderBy(col(idCol)).limit(nClusters)
        .select(col(idCol).cast("long"), quantize(col(vecCol))))
    val codebooks = pqCodebooks(corpus, idCol, vecCol, m, ksub)
    // one pass: home cell + PQ codes, both codegen'd kernels on the raw
    // vector (same (-dot, cid) ordering as nearestCells, via least)
    val homeCell = least(cents.map { case (cid, cv) =>
      struct((-quantDot(col(vecCol), 0, cv)).as("nd"), lit(cid).as("cid"))
    }: _*).getField("cid")
    // one corpus pass builds the (cid, codes) index rows; materialized for
    // the same reason as pqTopK's codes table (it IS the index artifact)
    val cellsOnePass = corpus
      .select(homeCell.as("cid"), col(idCol).as("neighbor_id"),
        pqCodeArray(col(vecCol), codebooks).as("codes"))
      .localCheckpoint(true)
    val qs = queries.select(col(idCol).cast("long"), quantize(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toSeq
    val probeRows = qs.flatMap { case (qid, qv) =>
      val lut = (0 until m).flatMap { j =>
        val sub = codebooks(j).head.size
        val qj = qv.slice(j * sub, j * sub + sub)
        codebooks(j).map(c => qj.iterator.zip(c.iterator).map { case (a, b) => a * b }.sum)
      }
      cents.map { case (cid, cv) =>
        (qid, cid, cv.iterator.zip(qv.iterator).map { case (a, b) => a * b }.sum, lut)
      }.sortBy { case (_, cid, d, _) => (-d, cid) }.take(nProbe)
        .map { case (q, cid, _, lut0) => (q, cid, lut0) }
    }
    val probes = probeRows.toDF("query_id", "cid", "__lut")
    val approx = (0 until m)
      .map(j => element_at(col("__lut"),
        lit(j * ksub + 1) + element_at(col("codes"), j + 1)))
      .reduce(_ + _)
    val cand = cellsOnePass.join(broadcast(probes), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", approx)
    topKPerQuery(cand, k, queries.schema(idCol).dataType, withCosine = false)
      .withColumnRenamed("dot", "approx_dot")
  }

  /** Fused quantize-and-dot against a constant weight vector starting at
    * `offset` — the native [[graft.functions.QuantDotLong]] kernel. Keeps
    * the PQ encode (and the IVF-PQ cell pass) inside whole-stage codegen:
    * a `transform`-based quantize is a higher-order function with no
    * codegen, and CollapseProject inlines it into every one of the m×ksub
    * cost expressions (measured 15 s for a 5k-vector encode at sf0.1;
    * this kernel takes it to well under a second). */
  private def quantDot(vec: Column, offset: Int, weights: Seq[Long]): Column =
    org.apache.spark.sql.graft.bridge.columnOf(graft.functions.QuantDotLong(
      org.apache.spark.sql.graft.bridge.expressionOf(vec), offset, weights))

  /** The PQ code array as one expression over the RAW float vector
    * (shared by [[pqEncode]] and the fused cell+code pass of
    * [[ivfPqTopK]]). The argmin is a codegen-capable `least` over
    * (cost, idx) structs — ties break to the smaller centroid index. */
  private def pqCodeArray(vec: Column, codebooks: Seq[Seq[Seq[Long]]]): Column = {
    val m = codebooks.size
    array((0 until m).map { j =>
      val sub = codebooks(j).head.size
      val costs = codebooks(j).zipWithIndex.map { case (c, ci) =>
        val norm = c.map(x => x * x).sum
        struct((lit(norm) - lit(2L) * quantDot(vec, j * sub, c)).as("cost"),
          lit(ci).as("idx"))
      }
      least(costs: _*).getField("idx").cast("int")
    }: _*)
  }

  /** IVF maintenance report: per-cell posting counts and corpus share in
    * ppm — cell IMBALANCE is the operational risk of an inverted-file
    * index (a hot cell makes every probe touching it scan a corpus-scale
    * posting list; the fix is re-training or splitting, and this row is
    * what triggers it). One count aggregate over the postings plus a
    * 1-row total broadcast; integer ppm so the report is engine-exact. */
  def ivfCellStats(index: IvfIndex): DataFrame = {
    val counts = index.postings.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"))
    val total = counts.agg(sum(col("n_vectors")).as("_total"))
    counts.crossJoin(broadcast(total))
      .select(col("cid"), col("n_vectors"),
        expr("(n_vectors * 1000000) div _total").as("share_ppm"))
  }

  /** [[lshRecall]]'s harness pointed at the IVF-PQ ranking. */
  def ivfPqRecall(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nClusters: Int = 16,
      nProbe: Int = 4, m: Int = 8, ksub: Int = 16): DataFrame =
    recallVsExact(bruteForceTopK(corpus, queries, idCol, vecCol, k),
      ivfPqTopK(corpus, queries, idCol, vecCol, k, nClusters, nProbe, m, ksub))

  /** RESIDUAL IVF-PQ — the actual IVFADC of Jégou et al. (PAMI 2011,
    * §IV-B): codes quantize the RESIDUAL `x − centroid(cell)` instead of
    * the vector itself, so the codebook only has to cover the
    * within-cell spread. On clustered corpora this is the standard
    * quality upgrade over plain [[ivfPqTopK]]; on the UNIFORM synthetic
    * test embeddings the acceptance rows show it does NOT pay (mean
    * recall@5 0.18 vs plain 0.22 at sf0.01) — residuals of a uniform
    * cloud are as spread as the vectors themselves, and under
    * inner-product ranking the centroid-base term dominates. That is
    * exactly what the side-by-side recall rows are for: measure on YOUR
    * corpus before switching.
    *
    * The Spark-first trick: the residual is NEVER materialized. Encoding
    * argmin needs `|c|² − 2·(x−cent)·c = (|c|² + 2·cent·c) − 2·x·c`, and
    * `cent·c` is a constant per (cell, codebook entry) — folded at
    * plan-build time into a per-cell literal array indexed by the row's
    * cell ordinal. Query-time ADC likewise: `x ≈ cent + c` gives
    * `q·x ≈ q·cent + Σ_j q_j·c_j` — a per-(query, cell) base constant
    * plus the usual LUT reads. Everything stays inside the ONE codegen'd
    * corpus pass ([[graft.functions.QuantDotLong]] kernels + literal
    * lookups), and the candidate join is still the single cid broadcast.
    *
    * Residual codebooks seed from the residuals of the `ksub` lowest-id
    * vectors (each against its own home cell) — the [[pqCodebooks]]
    * convention applied to residual space.
    *
    * Output: query_id, neighbor_id, `approx_dot`. */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nClusters: Int = 16, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = collectCentroids(
      corpus.orderBy(col(idCol)).limit(nClusters)
        .select(col(idCol).cast("long"), quantize(col(vecCol))))
    // codebook seeds start AFTER the centroid seeds: a vector that is its
    // own centroid has a ZERO residual, so a residual codebook seeded
    // from the same ids as the coarse quantizer is mostly null entries
    // (measured recall 0.12 vs plain IVF-PQ's 0.22 — worse than no
    // residuals at all; disjoint seeds flip it)
    val seeds = collectCentroids(
      corpus.orderBy(col(idCol)).limit(nClusters + ksub)
        .select(col(idCol).cast("long"), quantize(col(vecCol))))
      .drop(nClusters)
    require(seeds.size == ksub, s"corpus has < ${nClusters + ksub} vectors")
    val dims = seeds.head._2.size
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val sub = dims / m

    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    // home cell: max dot, ties to the smaller cid (the nearestCells rule)
    def homeIdx(v: Seq[Long]): Int =
      cents.indices.minBy(i => (-dot(v, cents(i)._2), cents(i)._1))

    // residual codebooks: seed residuals against their own home cells
    val seedRes = seeds.map { case (_, v) =>
      val c = cents(homeIdx(v))._2
      v.iterator.zip(c.iterator).map { case (x, y) => x - y }.toVector
    }
    val codebooks: Seq[Seq[Seq[Long]]] =
      (0 until m).map(j => seedRes.map(_.slice(j * sub, j * sub + sub)))

    // one corpus pass: cell ORDINAL (position in cents) + residual codes.
    // cost_c = (|c|² + 2·cent·c)[cellOrdinal] − 2·x·c — the first term is
    // a per-entry literal array indexed by the row's cell ordinal
    val cellOrd = least(cents.zipWithIndex.map { case ((cid, cv), i) =>
      struct((-quantDot(col(vecCol), 0, cv)).as("nd"), lit(cid).as("cid"),
        lit(i).as("ord"))
    }: _*).getField("ord")
    val codeExprs = (0 until m).map { j =>
      val costs = codebooks(j).zipWithIndex.map { case (c, ci) =>
        val constByCell = cents.map { case (_, cv) =>
          c.map(x => x * x).sum + 2L * dot(cv.slice(j * sub, j * sub + sub), c)
        }
        struct((element_at(typedLit(constByCell), col("__ord") + 1) -
          lit(2L) * quantDot(col(vecCol), j * sub, c)).as("cost"),
          lit(ci).as("idx"))
      }
      least(costs: _*).getField("idx").cast("int")
    }
    val cellsCodes = corpus
      .withColumn("__ord", cellOrd)
      .select(col("__ord"), col(idCol).as("neighbor_id"),
        array(codeExprs: _*).as("codes"))
      .localCheckpoint(true)

    // probes: per query, nProbe best cells; each probe row carries the
    // per-cell base (q·cent) and the residual LUT (cell-independent)
    val qs = queries.select(col(idCol).cast("long"), quantize(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toSeq
    val probeRows = qs.flatMap { case (qid, qv) =>
      val lut = (0 until m).flatMap { j =>
        val qj = qv.slice(j * sub, j * sub + sub)
        codebooks(j).map(c => dot(qj, c))
      }
      cents.zipWithIndex
        .map { case ((cid, cv), i) => (qid, i, dot(qv, cv), cid) }
        .sortBy { case (_, _, d, cid) => (-d, cid) }.take(nProbe)
        .map { case (q, ord, base, _) => (q, ord, base, lut) }
    }
    val probes = probeRows.toDF("query_id", "__ord", "__base", "__lut")
    val approx = col("__base") + (0 until m)
      .map(j => element_at(col("__lut"),
        lit(j * ksub + 1) + element_at(col("codes"), j + 1)))
      .reduce(_ + _)
    val cand = cellsCodes.join(broadcast(probes), Seq("__ord"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", approx)
    topKPerQuery(cand, k, queries.schema(idCol).dataType, withCosine = false)
      .withColumnRenamed("dot", "approx_dot")
  }

  /** [[lshRecall]]'s harness pointed at the residual IVF-PQ ranking —
    * side by side with [[ivfPqRecall]] it prices what residual
    * quantization buys. */
  def ivfPqResidualRecall(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nClusters: Int = 16,
      nProbe: Int = 4, m: Int = 8, ksub: Int = 16): DataFrame =
    recallVsExact(bruteForceTopK(corpus, queries, idCol, vecCol, k),
      ivfPqResidualTopK(corpus, queries, idCol, vecCol, k, nClusters, nProbe, m, ksub))

  /** ANN quality evaluation: per-query RECALL of the LSH top-k against the
    * exact top-k ground truth — the acceptance metric every approximate
    * index deployment is judged by. Both rankings run their normal scale
    * paths; the comparison is a join on (query, neighbor) and a per-query
    * count, integer ppm so the metric is engine-exact.
    *
    * Output: query_id, `n_exact` (truth size ≤ k), `n_hit` (truth rows the
    * LSH ranking also returned), `recall_ppm` = n_hit · 1e6 / n_exact
    * (truncated). */
  def lshRecall(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int,
      planes: Int = 4, tables: Int = 8): DataFrame =
    recallVsExact(bruteForceTopK(corpus, queries, idCol, vecCol, k),
      lshTopK(corpus, queries, idCol, vecCol, k, dims, planes, tables))

  /** [[lshRecall]]'s harness pointed at the IVF ranking: per-query recall
    * of [[ivfTopK]] against the exact top-k, integer ppm — both index
    * families carry the same acceptance metric. */
  def ivfRecall(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nClusters: Int = 16,
      nProbe: Int = 4, lloydIters: Int = 0): DataFrame =
    recallVsExact(bruteForceTopK(corpus, queries, idCol, vecCol, k),
      ivfTopK(corpus, queries, idCol, vecCol, k, nClusters, nProbe, lloydIters))

  /** Matryoshka / prefix-dimension evaluation: recall of the top-k ranking
    * computed on only the FIRST `prefixDims` coordinates against the
    * full-dimension exact truth — the "can we serve truncated vectors"
    * question (Kusupati et al., Matryoshka Representation Learning,
    * NeurIPS'22). Both rankings are deterministic quantized-dot exact
    * searches, so the metric itself is oracle-exact; serving cost drops
    * ∝ prefixDims/dims and this row says what recall that buys. */
  def prefixDimRecall(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, prefixDims: Int): DataFrame = {
    require(prefixDims > 0, s"prefixDims must be positive, got $prefixDims")
    def trunc(df: DataFrame): DataFrame =
      df.withColumn(vecCol, slice(col(vecCol), 1, prefixDims))
    recallVsExact(bruteForceTopK(corpus, queries, idCol, vecCol, k),
      bruteForceTopK(trunc(corpus), trunc(queries), idCol, vecCol, k))
  }

  /** Grade ANY approximate (query_id, neighbor_id) ranking against the
    * exact one: per-query `n_exact`, `n_hit`, truncated-ppm recall. */
  private def recallVsExact(exactRank: DataFrame, approxRank: DataFrame): DataFrame = {
    val exact = exactRank.select(col("query_id"), col("neighbor_id"))
    val approx = approxRank.select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .withColumn("recall_ppm", expr("(n_hit * 1000000) div n_exact"))
  }

  /** LSH-bucketed approximate top-k with `tables` independent hash tables
    * (standard SRP-LSH): each side is exploded to (table, bucket) keys, a
    * query's candidates are the union of its buckets across tables, then
    * exact-ranked. Shuffles on (table, bucket) — never a cross join; recall
    * grows with `tables` at proportional cost. The scale path when the query
    * set is too large to broadcast. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int,
      planes: Int = 4, tables: Int = 8): DataFrame = {
    // bucket rows carry ONLY (tbl, bkt, id) — 24-byte-ish rows through the
    // candidate shuffle; vectors are joined back for deduped candidates only
    // (shuffling the vectors through the bucket join measured ~3× slower)
    def prep(df: DataFrame, idName: String, vecName: String): DataFrame =
      df.select(col(idCol).as(idName), quantize(col(vecCol)).as(vecName))
    def buckets(v: DataFrame, idName: String, vecName: String): DataFrame =
      v.select(col(idName), explode(srpBuckets(col(vecName), dims, planes, tables)).as("tb"))
        .select(col(idName), col("tb.tbl"), col("tb.bkt"))
    val cV = prep(corpus, "neighbor_id", "cv")
    val qV = prep(queries, "query_id", "qv")
    val cand = buckets(cV, "neighbor_id", "cv").join(buckets(qV, "query_id", "qv"), Seq("tbl", "bkt"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val joined = cand
      .join(qV, Seq("query_id"))
      .join(cV, Seq("neighbor_id"))
      .withColumn("dot", dotLong(col("qv"), col("cv")))
    topKPerQuery(joined, k, corpus.schema(idCol).dataType, withCosine = false)
  }

  /** Cross-side cosine candidates for [[marginPairs]]: EVERY (a, b) pair
    * with its ppm-quantized cosine — norms computed once per row before
    * the join, never per pair. This is the exhaustive TRUTH builder (the
    * DuckDB-oracle definition and eval harnesses only); the production
    * gate and any corpus-scale caller go through [[lshCosCandidates]],
    * which derives the same `(a_id, b_id, cos_ppm)` frame from LSH-blocked
    * pairs without ever planning the cross join. */
  def cosCandidates(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    def side(df: DataFrame, id: String) = df
      .select(col(idCol).cast("long").as(id), quantize(col(vecCol)).as(s"_q$id"))
      .withColumn(s"_n$id", sqrt(dotLong(col(s"_q$id"), col(s"_q$id")).cast("double")))
    side(a, "a_id").crossJoin(side(b, "b_id"))
      .withColumn("_dot", dotLong(col("_qa_id"), col("_qb_id")))
      .select(col("a_id"), col("b_id"),
        expr("cast(round(1000000.0 * _dot / (_na_id * _nb_id)) as bigint)")
          .as("cos_ppm"))
  }

  /** LSH-blocked cosine candidates for [[marginPairs]] — the SCALE path.
    * Both sides bucket under the same deterministic SRP hyperplanes as
    * [[srpBuckets]]; a pair is a candidate iff it co-occurs in at least one
    * (table, bucket), and only candidates get the exact ppm-quantized
    * cosine. The candidate shuffle carries (tbl, bkt, id)-only rows and the
    * vectors join back per deduped candidate — never a cross join, so pair
    * cost is proportional to bucket collisions, not |a|×|b|. The margin is
    * then relative to the blocked neighborhood (the standard
    * approximation); the hyperplanes are data-independent md5-derived
    * literals, so the DuckDB oracle replays the exact candidate set.
    *
    * `planes = 0` (default) auto-sizes the depth from the COMBINED side
    * count ([[srpPlanesFor]](|a|+|b|), two narrow count jobs) — a fixed
    * depth makes per-bucket |A_b|×|B_b| collision cost grow quadratically
    * with the corpora, the same disease [[cosineNearDups]]'s auto default
    * cures. Pass `planes` explicitly only to pin a scheme. */
  def lshCosCandidates(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, dims: Int, planes: Int = 0, tables: Int = 8): DataFrame = {
    require(planes >= 0, s"planes must be >= 0 (0 = auto), got $planes")
    // each side feeds its bucket leg AND the confirm join — persist
    // (spillable) so quantize+norm run once per side; under planes=0 the
    // auto-depth counts are the scans that warm the caches
    // Lifetime: registered — see the Projections caching contract.
    def side(df: DataFrame, id: String) = Projections.register(
      Projections.spread(df, col(idCol))
      .select(col(idCol).cast("long").as(id), quantize(col(vecCol)).as(s"_q$id"))
      .withColumn(s"_n$id", sqrt(dotLong(col(s"_q$id"), col(s"_q$id")).cast("double")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val av = side(a, "a_id")
    val bv = side(b, "b_id")
    val nPlanes = if (planes > 0) planes else srpPlanesFor(av.count() + bv.count())
    def buckets(v: DataFrame, id: String) = v
      .select(col(id), explode(srpBuckets(col(s"_q$id"), dims, nPlanes, tables)).as("tb"))
      .select(col(id), col("tb.tbl"), col("tb.bkt"))
    val cand = buckets(av, "a_id").join(buckets(bv, "b_id"), Seq("tbl", "bkt"))
      .select("a_id", "b_id").dropDuplicates("a_id", "b_id")
    cand.join(av, Seq("a_id")).join(bv, Seq("b_id"))
      .withColumn("_dot", dotLong(col("_qa_id"), col("_qb_id")))
      .select(col("a_id"), col("b_id"),
        expr("cast(round(1000000.0 * _dot / (_na_id * _nb_id)) as bigint)")
          .as("cos_ppm"))
  }

  /** Margin-based pair scoring — the bitext-mining ratio of Artetxe &
    * Schwenk (2019): a pair's cosine divided by the MEAN of the two
    * sides' top-`k` neighborhood cosines; margin > 1 (1e6 ppm) marks a
    * pair that stands out from BOTH neighborhoods, the standard mined
    * parallel-pair filter (and a general cross-corpus link miner).
    *
    * Input: a candidate frame (a_id, b_id, cos_ppm). Everything after
    * the ppm quantization is exact integers: the two directional
    * neighborhood sums ride bounded [[graft.functions.TopKByDot]]
    * aggregations (≤ k entries of state per id), the candidate frame
    * joins the two ID-GRAIN sum tables, and
    * `margin_ppm = cos·2e6·cntA·cntB div (sumA·cntB + sumB·cntA)`
    * evaluates the mean-of-means denominator as one exact rational
    * (cnt < k where a side has fewer candidates). Pairs whose
    * neighborhood sums are non-positive carry no meaningful ratio and
    * are dropped.
    *
    * Output: (a_id, b_id, cos_ppm, margin_ppm) for margin ≥
    * `thresholdPpm`. */
  def marginPairs(candidates: DataFrame, k: Int, thresholdPpm: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    // THREE consumers read the candidate frame (each directional top-k
    // aggregation plus the final join base), and a candidate row costs a
    // bucket join + dot product to produce — unpersisted, the whole
    // candidate build ran three times (r20 plan audit; exchange reuse does
    // not cover the post-exchange dot-product projection). Persist
    // (spillable) so collisions are scored once; candidate volume is the
    // operator's honest cost and this caches exactly that, nothing wider.
    // Lifetime: registered — see the Projections caching contract.
    val cand = graft.pipeline.Projections.register(
      candidates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def sumTopK(qc: String, nc: String, sumName: String, cntName: String) = {
      val tk = columnOf(graft.functions.TopKByDot(
        expressionOf(col("cos_ppm")), expressionOf(col(nc).cast("long")),
        expressionOf(lit(0.0)), k).toAggregateExpression())
      cand.groupBy(col(qc)).agg(tk.as("_tk"))
        .select(col(qc),
          expr("aggregate(_tk, cast(0 as bigint), (acc, e) -> acc + e.dot)").as(sumName),
          size(col("_tk")).cast("long").as(cntName))
    }
    cand
      .join(sumTopK("a_id", "b_id", "_sa", "_ca"), Seq("a_id"))
      .join(sumTopK("b_id", "a_id", "_sb", "_cb"), Seq("b_id"))
      .filter(col("_sa") * col("_cb") + col("_sb") * col("_ca") > 0)
      .withColumn("margin_ppm",
        expr("(cos_ppm * 2000000 * _ca * _cb) div (_sa * _cb + _sb * _ca)"))
      .filter(col("margin_ppm") >= thresholdPpm)
      .select(col("a_id"), col("b_id"), col("cos_ppm"), col("margin_ppm"))
  }
}
