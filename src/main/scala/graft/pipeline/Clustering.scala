package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over near-duplicate PAIRS — the pairs→groups step a
  * large-scale dedup pipeline needs before it can pick survivors (pair lists
  * alone over-delete: A~B and B~C must collapse to ONE group even when A!~C).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * published shuffle-only formulation that converges in O(log n) rounds and
  * needs no driver-side graph state, vertex collections, or long lineage:
  * each round is a groupBy-min plus a co-partitioned join over (src, dst)
  * pairs, so a 100 TB edge set is just a big shuffle, and skewed (hot) nodes
  * cost a wide group, never a cross product. Plain min-label propagation was
  * rejected: its round count is the graph DIAMETER, unbounded for the chain
  * topologies boilerplate dedup actually produces.
  *
  * Per round the edge set is materialized: iterative plans otherwise
  * accumulate lineage (and re-execute every prior round on each action).
  * Default is `localCheckpoint` (executor block storage — fine for tests and
  * single-node runs); pass `checkpointDir` for a RELIABLE per-round scratch
  * Parquet table instead — on a real cluster `localCheckpoint` blocks die
  * with their executor, making an O(log n)-round job on 100 TB of edges
  * unrecoverable after a single executor loss mid-run.
  */
object Clustering {

  /** Assign every node of the undirected pair graph its component label
    * (= the component's minimum node id). Output: `(id, cluster_id)`, one
    * row per distinct node appearing in `pairs`.
    *
    * @param pairs         DataFrame with two long-castable id columns
    * @param maxRounds     safety bound on star rounds; the algorithm
    *                      converges in O(log n) — hitting the bound raises
    *                      rather than returning a possibly-unconverged
    *                      labeling
    * @param checkpointDir when set, each round materializes to
    *                      `<dir>/cc_round_<n>` Parquet (reliable storage —
    *                      survives executor loss; stale rounds are deleted
    *                      as the job advances — the FINAL round's table
    *                      backs the returned frame, so delete the dir only
    *                      after consuming it); when None, rounds
    *                      `localCheckpoint` to executor block storage
    * @param localThreshold canonical edge counts at or below this finish as
    *                      driver-side union-find instead of shuffle rounds
    *                      (small-graph fast path; default 2M edges —
    *                      ~100 MB transient on the driver, the same order
    *                      as a large broadcast relation, vs O(log n)
    *                      rounds × several scheduled shuffles each for a
    *                      graph that fits in one task's memory; negative
    *                      disables). Raised from 128k in r19: the dense
    *                      image dup-graph gates carry ~1.6M edges and
    *                      spent ~4 s in star rounds whose every shuffle
    *                      moved less data than one broadcast.
    * @param autoDiskEdges with no explicit `checkpointDir`, canonical edge
    *                      counts ABOVE this auto-switch round scratch from
    *                      executor blocks to parquet under
    *                      [[autoScratchDir]] — the r11 10× rehearsal
    *                      measured `localCheckpoint` OOM at 158.7M edges,
    *                      so the safe default must not depend on the
    *                      caller remembering a knob (default 64M;
    *                      negative disables). The count is the round-0
    *                      checksum — no extra job.
    */
  def connectedComponents(pairs: DataFrame, idCol1: String = "id_1",
      idCol2: String = "id_2", maxRounds: Int = 30,
      checkpointDir: Option[String] = None,
      localThreshold: Int = 1 << 21,
      autoDiskEdges: Long = 1L << 26,
      assumeCanonical: Boolean = false): DataFrame = {
    val spark = pairs.sparkSession
    // `assumeCanonical` (r20, guide §2.4 "a distinct on data that is
    // already unique"): the near-dup pair builders (nearDupImages,
    // minhashNearDups, cosineNearDups, Identity star edges) all emit
    // DISTINCT pairs with id_1 < id_2 by construction (their band/bucket
    // self-joins filter `<` and dropDuplicates before the confirm), so the
    // defensive re-canonicalization here — a corpus-wide exchange + hash
    // aggregate over the full edge list — is pure cost at every scale.
    // Callers set it ONLY when the producer guarantees the contract;
    // CanonicalPairSpec pins value identity on violating inputs staying on
    // the default path.
    val canonical =
      if (assumeCanonical)
        pairs.select(col(idCol1).cast("long").as("u"), col(idCol2).cast("long").as("v"))
      else pairs
        .select(col(idCol1).cast("long").as("u"), col(idCol2).cast("long").as("v"))
        .filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .distinct()

    // large-star: every neighbor v > u links to m(u) = min(Γ(u) ∪ {u});
    // small-star: every neighbor v < u (and u itself) links to m(u).
    // Both are: symmetrize → per-node min → join-back → emit, all shuffles
    // on the node id. groupBy-min is insensitive to duplicate edges, so the
    // (shuffling) dedup runs only at the round boundary, not between the
    // two stars of a round.
    def star(edges: DataFrame, large: Boolean, dedup: Boolean): DataFrame = {
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val joined = sym.join(mins, "u")
      val emitted =
        if (large) joined.filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
        else joined.filter(col("v") < col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(mins.select(col("u"), col("m").as("v")))
      val loops = emitted.filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      if (dedup) loops.distinct() else loops
    }

    // one aggregate action per round: (count, xor of a 64-bit edge hash) is
    // a change detector without materializing except() diffs
    def checksum(edges: DataFrame): (Long, Long) = {
      val r = edges.agg(
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("x")).head()
      (r.getLong(0), r.getLong(1))
    }

    // materialize a round's edges: reliable scratch Parquet when a
    // checkpoint dir is set (explicitly or by the auto-switch below),
    // executor-local blocks otherwise. Stale round tables are deleted once
    // the next round is durably written.
    var ckDir: Option[String] = checkpointDir
    def materialize(df: DataFrame, round: Int): DataFrame = ckDir match {
      case Some(dir) =>
        val path = s"$dir/cc_round_$round"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None => df.localCheckpoint(true)
    }
    def dropRound(round: Int): Unit = ckDir.foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/cc_round_$round")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true): Unit
    }

    var edges = materialize(canonical, 0)
    var sig = checksum(edges)

    // the round-0 checksum already paid for the edge count: above the
    // auto-disk bound, re-home round scratch to reliable parquet NOW (one
    // extra pass over the round-0 edges) rather than let O(log n) rounds
    // of executor-block checkpoints OOM or die with an executor
    if (ckDir.isEmpty && autoDiskEdges >= 0 && sig._1 > autoDiskEdges) {
      autoScratchDir(spark, "cc") match {
        case d @ Some(_) =>
          ckDir = d
          val migrated = materialize(edges, 0)
          edges.unpersist(false)
          edges = migrated
        case None =>
          log.warn(s"connectedComponents: ${sig._1} edges exceed the auto-disk bound " +
            s"but no shared scratch location exists (no checkpoint dir, non-local " +
            s"master); staying on localCheckpoint — pass checkpointDir explicitly")
      }
    }

    // Small-graph fast path (the AQE-broadcast principle applied to the
    // iterative loop): the O(log n) star rounds exist for graphs too big
    // for one machine — but each round costs several scheduled jobs, and
    // once the CANONICAL edge count (already paid for by the round-0
    // checksum) is known to be bounded, finishing distributed is pure
    // scheduler latency. ≤ localThreshold edges ⇒ collect through the tuple
    // encoder (no Row per edge; ~tens of MB transient at the default
    // 128k-edge bound) and run min-root union-find on the driver; identical
    // labels, milliseconds instead of O(log n) shuffle rounds. A 100 TB
    // pair graph never takes this branch.
    if (sig._1 <= localThreshold) {
      import spark.implicits._
      val arr = edges.select(col("u"), col("v")).as[(Long, Long)].collect()
      edges.unpersist(false)
      dropRound(0)
      // Primitive union-find over the sorted node table (r20 rework: the
      // boxed LongMap + flatMap/distinct spelling allocated ~3 objects per
      // edge). nodes is ASCENDING, so index order == id order and min-root
      // union on INDICES is exactly min-id union — every root stays its
      // component's min id, the labels the distributed rounds converge to.
      val m = arr.length
      val ea = new Array[Long](m); val eb = new Array[Long](m)
      var i = 0
      while (i < m) { val p = arr(i); ea(i) = p._1; eb(i) = p._2; i += 1 }
      val nodes = {
        val ids = new Array[Long](m * 2)
        System.arraycopy(ea, 0, ids, 0, m)
        System.arraycopy(eb, 0, ids, m, m)
        java.util.Arrays.parallelSort(ids)
        var n = 0; var j = 0
        while (j < ids.length) {
          if (n == 0 || ids(j) != ids(n - 1)) { ids(n) = ids(j); n += 1 }
          j += 1
        }
        java.util.Arrays.copyOf(ids, n)
      }
      val parent = Array.tabulate(nodes.length)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      i = 0
      while (i < m) {
        val ra = find(java.util.Arrays.binarySearch(nodes, ea(i)))
        val rb = find(java.util.Arrays.binarySearch(nodes, eb(i)))
        // min-root union ⇒ every root IS its component's min id
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        i += 1
      }
      return nodes.indices.map(k => (nodes(k), nodes(find(k))))
        .toDF("id", "cluster_id")
    }

    var converged = edges.isEmpty
    var round = 0
    while (!converged && round < maxRounds) {
      val next = materialize(
        star(star(edges, large = true, dedup = false), large = false, dedup = true), round + 1)
      val nextSig = checksum(next)
      edges.unpersist(false)
      dropRound(round)
      converged = nextSig == sig
      edges = next
      sig = nextSig
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds")

    // converged ⇒ every component is a star (v, m) centered at its min node
    val members = edges.select(col("v").as("id"), col("u").as("cluster_id"))
    val centers = edges.select(col("u").as("id")).distinct()
      .join(members.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"))
    members.union(centers)
  }

  /** Near-duplicate CLUSTERS over a document frame: MinHash+LSH pairs
    * ([[Dedup.minhashNearDups]]) collapsed into components. Output one row
    * per clustered doc: `(id, cluster_id, is_survivor)` — survivor = the
    * cluster's min id, matching [[Dedup.exactDedup]]'s keep-min convention.
    * Docs with no near-duplicate are omitted (they are all trivial
    * survivors; at 100 TB emitting them would dwarf the interesting rows). */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 0, rowsPerBand: Int = 0,
      threshold: Double = 0.5, checkpointDir: Option[String] = None): DataFrame = {
    val pairs = Dedup.minhashNearDups(df, idCol, textCol, ngram, bands, rowsPerBand, threshold)
    connectedComponents(pairs, checkpointDir = checkpointDir)
      .select(col("id"), col("cluster_id"),
        (col("id") === col("cluster_id")).as("is_survivor"))
  }

  /** SemDeDup-style SEMANTIC deduplication: embedding-cosine near-dup pairs
    * collapsed into components, min-id survivor per component — the
    * embedding-space sibling of [[nearDupClusters]] (Abbas et al., SemDeDup,
    * arXiv:2303.09540: cluster embeddings, keep one representative per
    * semantic duplicate group). The pair stage is
    * [[Similarity.cosineNearDups]]: SRP-LSH candidates + exact confirm by
    * default (the 100 TB path — never an O(n²) pair space), with the SRP
    * depth auto-sized to the corpus (`planes = 0` ⇒
    * [[Similarity.srpPlanesFor]] from a one-time count — a fixed depth
    * would grow candidates quadratically with the corpus) and exposed here
    * so a 100 TB caller can pin or re-budget the scheme;
    * `lshPrefilter = false` gives the exact pair graph (the oracle slice).
    * Output: `(id, cluster_id, is_survivor)`, clustered vectors only. */
  def semanticDedup(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double, lshPrefilter: Boolean = true,
      checkpointDir: Option[String] = None,
      dims: Int = 64, planes: Int = 0, tables: Int = 16): DataFrame = {
    val pairs = Similarity.cosineNearDups(embeddings, idCol, vecCol, threshold,
      lshPrefilter, dims, planes, tables)
    connectedComponents(pairs, checkpointDir = checkpointDir)
      .select(col("id"), col("cluster_id"),
        (col("id") === col("cluster_id")).as("is_survivor"))
  }

  /** HYBRID dedup: the union of the lexical (MinHash 3-gram Jaccard) and
    * semantic (embedding-cosine) near-dup pair graphs collapsed into ONE
    * component labeling — a document caught by either signal joins the
    * cluster, and transitive chains may cross signals (a↔b lexical, b↔c
    * semantic ⇒ {a,b,c}). Ids must share a key space (`idCol` ≡ `embIdCol`).
    * Both pair stages keep their 100 TB shapes (banded LSH / SRP buckets —
    * never O(n²)); the union just concatenates two bounded pair lists before
    * the O(log n)-round star labeling. Output: `(id, cluster_id,
    * is_survivor)`, clustered ids only. */
  def hybridDedup(docs: DataFrame, idCol: String, textCol: String,
      embeddings: DataFrame, embIdCol: String, vecCol: String,
      cosineThreshold: Double, jaccardThreshold: Double = 0.5,
      lshPrefilter: Boolean = true, checkpointDir: Option[String] = None,
      bands: Int = 0, rowsPerBand: Int = 0,
      dims: Int = 64, planes: Int = 0, tables: Int = 16): DataFrame = {
    val lexical = Dedup.minhashNearDups(docs, idCol, textCol,
        bands = bands, rowsPerBand = rowsPerBand, threshold = jaccardThreshold)
      .select(col("id_1"), col("id_2"))
    val semantic = Similarity
      .cosineNearDups(embeddings, embIdCol, vecCol, cosineThreshold, lshPrefilter,
        dims, planes, tables)
      .select(col("id_1"), col("id_2"))
    connectedComponents(lexical.unionByName(semantic), checkpointDir = checkpointDir)
      .select(col("id"), col("cluster_id"),
        (col("id") === col("cluster_id")).as("is_survivor"))
  }

  /** Drop every clustered non-survivor from `df` — the end-to-end near-dup
    * dedup: keep each cluster's min id plus all unclustered docs. The losers
    * relation is cluster-bounded (≪ corpus size), so the anti-join
    * broadcasts in the common case and hash-shuffles at worst. */
  def dropNearDups(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 0, rowsPerBand: Int = 0,
      threshold: Double = 0.5): DataFrame = {
    val losers = nearDupClusters(df, idCol, textCol, ngram, bands, rowsPerBand, threshold)
      .filter(!col("is_survivor"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** PageRank over an undirected pair graph in EXACT integer ppm: rank
    * starts at 1e6 per node and iterates
    * `r′_v = (1e6 − damp) + damp · (Σ_{u∼v} (r_u div deg_u)) div 1e6`
    * for `iters` rounds — every division truncates, so all ten rounds
    * replay bit-for-bit on any engine (the steadyStateEventMix
    * discipline; at scale fully DISTRIBUTED — ranks never visit the
    * driver on any graph above `localThreshold`). The few-ppm mass leak
    * of truncation is the documented price of exactness, identical
    * everywhere.
    *
    * Small-graph fast path (the [[connectedComponents]] localThreshold
    * discipline, r19): ≤ `localThreshold` canonical edges ⇒ collect the
    * pair list through the tuple encoder and replay the identical integer
    * recurrence on the driver over a CSR adjacency — milliseconds instead
    * of `iters` × (join + aggregate) scheduled rounds (measured ~0.55 s
    * PER ROUND of pure scheduling+scan floor on a 1.6M-edge gate graph).
    * Every operand of every division is positive, so JVM `/` equals SQL
    * `div` and the ranks are bit-identical (spec-pinned equivalence). A
    * 100 TB pair graph never takes this branch; negative disables, and an
    * explicit `checkpointDir` (the cluster spelling) skips it too.
    *
    * Scale shape: the degree-annotated directed edge list is built once,
    * REPARTITIONED ON `src`, SORTED within partitions, and persisted
    * (MEMORY_AND_DISK, registered with [[Projections]] as the release
    * boundary). A persisted InMemoryTableScan keeps both the hash
    * partitioning and the sort order, so the per-round join shuffles and
    * sorts only the node-grain rank table, never the edges. (r19: the
    * previous `localCheckpoint` spelling came back as an ExistingRDD with
    * UnknownPartitioning on Spark 4.x, so EVERY round silently re-exchanged
    * and re-sorted the full edge table — the measured plan, not the
    * documented one. Lineage re-derivation is equally prevented by the
    * persist: cached blocks are read back, the pair-graph plan only re-runs
    * if blocks are evicted.) Each round is then exactly ONE join (edges ⋈
    * ranks, both hashed on src) fused with ONE aggregation on the
    * destination — the symmetrized edge list guarantees every node
    * appears as a `dst`, so the old per-round "redistribute to all
    * nodes" left-join was a provable no-op and is gone (3 → 2 exchanges
    * and one fewer stage per round). Rank lineage is cut by an EAGER
    * checkpoint every `checkpointEvery` rounds rather than every round:
    * each materialization is a blocking job, so per-round checkpoints
    * serialized ten scheduler round-trips (the r9 bench's 13.5 s was
    * mostly that latency), while a small bounded lineage between
    * checkpoints lets AQE pipeline the intermediate rounds.
    *
    * Output: node, rank_ppm after `iters` rounds (isolated nodes never
    * appear — an edgeless node holds the base rank trivially). */
  def pageRank(edges: DataFrame, aCol: String, bCol: String,
      iters: Int = 10, dampPpm: Long = 850000L,
      checkpointEvery: Int = 5,
      checkpointDir: Option[String] = None,
      autoDiskEdges: Long = 1L << 26,
      localThreshold: Int = 1 << 21,
      assumeCanonical: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    require(dampPpm >= 0 && dampPpm <= 1000000L, s"dampPpm out of range: $dampPpm")
    val spark = edges.sparkSession
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    // assumeCanonical: see connectedComponents — skips a full-edge-list
    // exchange when the producer guarantees distinct a < b pairs
    val und0 =
      if (assumeCanonical)
        edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      else edges
        .select(least(col(aCol), col(bCol)).cast("long").as("a"),
          greatest(col(aCol), col(bCol)).cast("long").as("b"))
        .filter(col("a") < col("b")).distinct()
    // small-graph fast path (scaladoc): the canonical pair list is
    // persisted ONCE (the count that gates the branch is also the fill
    // job, so the pair-graph lineage still runs exactly one pass), then
    // either collected (small) or reused as the distributed build's base
    val smallOrUnd = smallPairsOrPersisted(und0, localThreshold, checkpointDir)
    smallOrUnd match {
      case Left(pairs) => return pageRankLocal(spark, pairs, iters, dampPpm)
      case Right(_)    => ()
    }
    val und = smallOrUnd.toOption.get
    val dir = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val deg = dir.groupBy("src").agg(count(lit(1)).as("deg"))
    // above autoDiskEdges the locally-materialized edge table re-homes to
    // reliable parquet and every round scratch follows it (the
    // connectedComponents auto-disk discipline; count = one narrow job
    // over the cached blocks)
    val annotated = dir.join(deg, Seq("src")).repartition(col("src"))
    // partition-and-order-preserving local materialization (see scaladoc);
    // with an explicit checkpoint dir the parquet scratch stays authoritative
    val eLocal =
      if (checkpointDir.isDefined) scratch(spark, checkpointDir, "pr_edges", annotated)
      else Projections.register(annotated.sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK))
    val (e, ckDir) = autoDiskEdgesSwitch(spark, checkpointDir, autoDiskEdges, "pr", eLocal)
    und.unpersist(false) // annotated cache is filled; the pair cache is done
    // initial ranks at node grain, derived from the CHECKPOINTED edges
    // (partition-aligned groupBy — no extra scan of the pair-graph lineage)
    var r = scratch(spark, ckDir, "pr_nodes",
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("_d"))
        .select(col("node"), lit(1000000L).as("r")))
    (1 to iters).foreach { i =>
      // dir is symmetric ⇒ set(dst) = set(src) = every node, and r always
      // holds every node (inductively), so the contribution aggregate is
      // itself the complete next rank table — no fill-in join needed
      r = e
        .join(r.select(col("node").as("src"), col("r")), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(idiv(col("r"), col("deg"))).as("_s"))
        .select(col("dst").as("node"),
          (lit(1000000L - dampPpm) +
            idiv(lit(dampPpm) * col("_s"), lit(1000000L))).as("r"))
      if (i % checkpointEvery == 0 || i == iters)
        r = scratch(spark, ckDir, s"pr_round_$i", r)
    }
    r.select(col("node"), col("r").as("rank_ppm"))
  }

  /** Gate of the iterative small-graph fast paths: persist the canonical
    * pair frame (registered with [[Projections]]; the gating count is also
    * the cache-fill job, so the pair lineage runs exactly one pass either
    * way), then collect it when it is at or under `localThreshold` edges
    * (Left) or hand the persisted frame back as the distributed build's
    * base (Right). Negative threshold or an explicit checkpoint dir (the
    * cluster spelling) skip the persist entirely. */
  private def smallPairsOrPersisted(und: DataFrame, localThreshold: Int,
      checkpointDir: Option[String]): Either[Array[(Long, Long)], DataFrame] = {
    if (localThreshold < 0 || checkpointDir.isDefined) return Right(und)
    val spark = und.sparkSession
    import spark.implicits._
    val p = Projections.register(und.persist(StorageLevel.MEMORY_AND_DISK))
    if (p.count() <= localThreshold) {
      val arr = p.select(col("a"), col("b")).as[(Long, Long)].collect()
      p.unpersist(false)
      Left(arr)
    } else Right(p)
  }

  /** CSR adjacency over a canonical (a < b, distinct) pair list: sorted
    * distinct node ids, per-node degree, offsets, neighbor index array —
    * the driver-side mirror of the symmetrized directed edge list the
    * distributed rounds iterate. Bounded by the callers' localThreshold. */
  private final class CsrGraph(pairs: Array[(Long, Long)]) {
    // Build order (r20 rework): ONE unboxing pass over the tuple array
    // into primitive endpoint arrays, ONE binary-search index pass per
    // endpoint (parallel — writes disjoint slots), then degree/offset/
    // neighbor fills over primitive ints. The previous spelling re-walked
    // the boxed tuples three times and binary-searched every endpoint
    // twice more (4 searches/edge) — ~0.4 s of the graph gates' driver
    // wall at the 1.58M-edge gate graph. Identical arrays come out.
    private val m = pairs.length
    private val ea = new Array[Long](m)
    private val eb = new Array[Long](m)
    locally {
      var i = 0
      while (i < m) { val p = pairs(i); ea(i) = p._1; eb(i) = p._2; i += 1 }
    }
    val nodes: Array[Long] = {
      val ids = new Array[Long](m * 2)
      System.arraycopy(ea, 0, ids, 0, m)
      System.arraycopy(eb, 0, ids, m, m)
      java.util.Arrays.parallelSort(ids)
      var n = 0
      var j = 0
      while (j < ids.length) {
        if (n == 0 || ids(j) != ids(n - 1)) { ids(n) = ids(j); n += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(ids, n)
    }
    val n: Int = nodes.length
    private val ia = new Array[Int](m)
    private val ib = new Array[Int](m)
    locally {
      val ns = nodes // avoid capturing `this` per lambda call
      java.util.stream.IntStream.range(0, m).parallel().forEach { i =>
        ia(i) = java.util.Arrays.binarySearch(ns, ea(i))
        ib(i) = java.util.Arrays.binarySearch(ns, eb(i))
      }
    }
    val deg: Array[Int] = {
      val d = new Array[Int](n)
      var i = 0
      while (i < m) { d(ia(i)) += 1; d(ib(i)) += 1; i += 1 }
      d
    }
    val off: Array[Int] = {
      val o = new Array[Int](n + 1)
      var k = 0
      while (k < n) { o(k + 1) = o(k) + deg(k); k += 1 }
      o
    }
    val nbr: Array[Int] = {
      val cur = java.util.Arrays.copyOf(off, n)
      val a = new Array[Int](m * 2)
      var i = 0
      while (i < m) {
        val ip = ia(i); val iq = ib(i)
        a(cur(ip)) = iq; cur(ip) += 1
        a(cur(iq)) = ip; cur(iq) += 1
        i += 1
      }
      a
    }
  }

  /** Driver replay of the [[pageRank]] integer recurrence over a CSR
    * adjacency — bit-identical to the distributed rounds (every division's
    * operands are positive, so JVM `/` ≡ SQL `div`; spec-pinned). */
  private def pageRankLocal(spark: org.apache.spark.sql.SparkSession,
      pairs: Array[(Long, Long)], iters: Int, dampPpm: Long): DataFrame = {
    import spark.implicits._
    if (pairs.isEmpty) return Seq.empty[(Long, Long)].toDF("node", "rank_ppm")
    val g = new CsrGraph(pairs)
    var r = Array.fill(g.n)(1000000L)
    var it = 0
    while (it < iters) {
      val c = new Array[Long](g.n)
      var k = 0
      while (k < g.n) { c(k) = r(k) / g.deg(k); k += 1 }
      val nx = new Array[Long](g.n)
      k = 0
      while (k < g.n) {
        var s = 0L
        var j = g.off(k)
        while (j < g.off(k + 1)) { s += c(g.nbr(j)); j += 1 }
        nx(k) = (1000000L - dampPpm) + dampPpm * s / 1000000L
        k += 1
      }
      r = nx
      it += 1
    }
    g.nodes.indices.map(k => (g.nodes(k), r(k))).toDF("node", "rank_ppm")
  }

  /** Driver replay of the [[labelPropagation]] synchronous min-tie rounds
    * over a CSR adjacency: per node, sort the neighbor labels and take the
    * longest run (ascending scan with strictly-greater replacement ⇒ ties
    * keep the smallest label — exactly the distributed
    * `max(struct(count, -label))`). */
  private def lpaLocal(spark: org.apache.spark.sql.SparkSession,
      pairs: Array[(Long, Long)], iters: Int): DataFrame = {
    import spark.implicits._
    if (pairs.isEmpty) return Seq.empty[(Long, Long)].toDF("node", "community")
    val g = new CsrGraph(pairs)
    var lab: Array[Long] = g.nodes.clone()
    // per-node argmax is independent within a round (reads the previous
    // round's lab, writes nx(k) only), so the rounds parallelize across
    // driver cores with per-thread scratch — the per-node neighbor-label
    // sort made the serial replay the visible cost of the LPA gate (~0.7 s
    // single-threaded on the 3.17M-directed-edge gate graph vs pageRank's
    // linear adds; r20 profile). Results are bit-identical regardless of
    // scheduling: same per-node inputs, same first-max (= min-label tie)
    // scan.
    val scratchTL = ThreadLocal.withInitial[Array[Long]](() => new Array[Long](g.deg.max))
    var it = 0
    while (it < iters) {
      val nx = new Array[Long](g.n)
      val labCur = lab
      java.util.stream.IntStream.range(0, g.n).parallel().forEach { k =>
        val scratchLabels = scratchTL.get()
        val base = g.off(k)
        val d = g.off(k + 1) - base
        var j = 0
        while (j < d) { scratchLabels(j) = labCur(g.nbr(base + j)); j += 1 }
        java.util.Arrays.sort(scratchLabels, 0, d)
        var best = scratchLabels(0); var bestCnt = 0
        var cur = scratchLabels(0); var cnt = 0
        j = 0
        while (j < d) {
          if (scratchLabels(j) == cur) cnt += 1
          else {
            if (cnt > bestCnt) { bestCnt = cnt; best = cur }
            cur = scratchLabels(j); cnt = 1
          }
          j += 1
        }
        if (cnt > bestCnt) { bestCnt = cnt; best = cur }
        nx(k) = best
      }
      lab = nx
      it += 1
    }
    g.nodes.indices.map(k => (g.nodes(k), lab(k))).toDF("node", "community")
  }

  /** Materialize an iteration frame: reliable scratch Parquet when a
    * checkpoint dir is given ([[connectedComponents]]' discipline — on a
    * real cluster `localCheckpoint` blocks die with their executor, making
    * a long iterative job unrecoverable after one executor loss mid-run),
    * executor-local blocks otherwise. */
  private def scratch(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: Option[String], tag: String, df: DataFrame): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val path = s"$dir/$tag"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None => df.localCheckpoint(true)
    }

  /** Scratch root for the AUTO disk-checkpoint switch — `Some` only when a
    * location every executor can read exists: the session's configured
    * reliable checkpoint dir (`sparkContext.setCheckpointDir` — shared
    * storage on a real cluster), or a process-local tmp subdir under a
    * `local[*]` master (single JVM ⇒ the driver's tmp IS shared; this is
    * where the r11 rehearsal measured the `localCheckpoint` OOM the switch
    * prevents). On a multi-node cluster withOUT a configured checkpoint
    * dir this returns `None` — a driver-local tmp path is not reachable
    * from executors, so the caller keeps `localCheckpoint` and logs a
    * warning; pass `checkpointDir` explicitly there. The dir is registered
    * with the filesystem's `deleteOnExit` (removed when the session's JVM
    * exits): in-flight round tables are dropped eagerly, but the FINAL
    * round backs the returned frame lazily, so the dir must outlive the
    * operator call itself. */
  private[graft] def autoScratchDir(spark: org.apache.spark.sql.SparkSession,
      tag: String): Option[String] = {
    val sc = spark.sparkContext
    val base = sc.getCheckpointDir.orElse(
      if (sc.isLocal) Some(sys.props.getOrElse("java.io.tmpdir", "/tmp")) else None)
    base.map { b =>
      val dir = s"$b/graft_${tag}_scratch_${java.util.UUID.randomUUID().toString.take(8)}"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(sc.hadoopConfiguration).deleteOnExit(p): Unit
      dir
    }
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.pipeline.Clustering")

  /** [[pageRank]]/[[labelPropagation]]'s edge-table half of the auto-disk
    * discipline: the edge frame is already materialized locally, so the
    * count is one narrow job over cached blocks; above the bound the edges
    * are re-homed to reliable parquet and the returned dir makes every
    * subsequent ROUND scratch disk-backed too. */
  private def autoDiskEdgesSwitch(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: Option[String], autoDiskEdges: Long, tag: String,
      localEdges: DataFrame): (DataFrame, Option[String]) = {
    if (checkpointDir.isDefined || autoDiskEdges < 0 ||
        localEdges.count() <= autoDiskEdges) (localEdges, checkpointDir)
    else autoScratchDir(spark, tag) match {
      case dir @ Some(_) =>
        val migrated = scratch(spark, dir, s"${tag}_edges", localEdges)
        localEdges.unpersist(false)
        (migrated, dir)
      case None =>
        log.warn(s"$tag: edge count exceeds the auto-disk bound but no shared " +
          s"scratch location exists (no checkpoint dir, non-local master); " +
          s"staying on localCheckpoint — pass checkpointDir explicitly")
        (localEdges, None)
    }
  }

  /** SYNCHRONOUS label propagation (Raghavan et al. 2007, made
    * deterministic): `iters` rounds where every node adopts the most
    * frequent label among its NEIGHBORS as of the previous round, ties
    * broken by smallest label. Communities are finer-grained than
    * [[connectedComponents]] — a chain of weak bridges stays split where
    * CC would collapse it — which is the read you want when a dup graph
    * mixes tight re-upload cliques with accidental one-edge matches.
    * The async/randomized variant converges faster but is run-dependent;
    * the synchronous min-tie variant is reproducible on any engine and
    * partitioning, which is what an oracle-checked pipeline needs.
    *
    * Scale shape: each round is one join (edge ⋈ labels, both keyed on
    * the node id) plus two aggregations (neighbor-label counts, then the
    * per-node argmax via a `max(struct(count, −label))` — never a window
    * over the node's neighbor list); label lineage is cut every
    * `checkpointEvery` rounds exactly like [[pageRank]] — per-round
    * eager checkpoints serialize one blocking job per round, while a
    * short pipelined lineage lets the scheduler overlap rounds.
    *
    * Output: `(node, community)` — the label after `iters` rounds. */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
      iters: Int = 3, checkpointEvery: Int = 5,
      checkpointDir: Option[String] = None,
      autoDiskEdges: Long = 1L << 26,
      localThreshold: Int = 1 << 21,
      assumeCanonical: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    // assumeCanonical: see connectedComponents — skips a full-edge-list
    // exchange when the producer guarantees distinct a < b pairs
    val und0 =
      if (assumeCanonical)
        edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      else edges
        .select(least(col(aCol), col(bCol)).cast("long").as("a"),
          greatest(col(aCol), col(bCol)).cast("long").as("b"))
        .filter(col("a") < col("b")).distinct()
    // small-graph fast path — the pageRank/connectedComponents
    // localThreshold discipline (identical labels, spec-pinned)
    val smallOrUnd = smallPairsOrPersisted(und0, localThreshold, checkpointDir)
    smallOrUnd match {
      case Left(pairs) => return lpaLocal(edges.sparkSession, pairs, iters)
      case Right(_)    => ()
    }
    val und = smallOrUnd.toOption.get
    // partitioned on the per-round join key and SORTED before a persisted
    // materialization: an InMemoryTableScan keeps hash partitioning + sort
    // order, so every round's join re-shuffles/re-sorts only the node-grain
    // label side, never the edge table (the pageRank discipline — the
    // previous localCheckpoint spelling lost the partitioning on Spark 4.x
    // and re-exchanged the edges per round, see pageRank's scaladoc);
    // above autoDiskEdges the table re-homes to reliable parquet
    val spark = edges.sparkSession
    val symEdges = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("v"))
    val dirLocal =
      if (checkpointDir.isDefined) scratch(spark, checkpointDir, "lpa_edges", symEdges)
      else Projections.register(symEdges.sortWithinPartitions("v")
        .persist(StorageLevel.MEMORY_AND_DISK))
    val (dir, ckDir) = autoDiskEdgesSwitch(spark, checkpointDir,
      autoDiskEdges, "lpa", dirLocal)
    und.unpersist(false) // symmetrized cache is filled; the pair cache is done
    var labels = dir.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    (1 to iters).foreach { i =>
      labels = dir
        .join(labels.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("u"))
        .agg(max(struct(col("_c"), (-col("label")).as("_nl"))).as("_m"))
        .select(col("u").as("node"), (-col("_m._nl")).as("label"))
      if (i % checkpointEvery == 0 || i == iters)
        labels = scratch(edges.sparkSession, ckDir, s"lpa_round_$i", labels)
    }
    labels.select(col("node"), col("label").as("community"))
  }

  /** Per-node triangle count and LOCAL CLUSTERING COEFFICIENT over an
    * undirected pair graph — the community-density read of a dup graph:
    * a tight clique of re-uploads closes its triangles (coefficient → 1),
    * a hub-and-spoke of weak accidental matches closes none.
    *
    * Scale shape: edges are ORIENTED by id (a < b), so each triangle
    * (x < y < z) is enumerated exactly once by TWO equi-joins (wedge
    * x–y–z closed by the x–z edge) — the standard distributed triangle
    * count whose cost follows wedge counts, never node pairs; the
    * per-node roll-ups are plain aggregations over exploded
    * triangle/edge node lists. Degree-<2 nodes have no wedges and report
    * coefficient 0.
    *
    * Output: node, degree, n_tri, lcc_ppm =
    * `2·n_tri·1e6 div (degree·(degree−1))` (truncated). */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String,
      assumeCanonical: Boolean = false): DataFrame = {
    // normalize orientation (a reversed duplicate collapses rather than
    // vanishes), drop self-loops, dedupe; assumeCanonical (see
    // connectedComponents) skips that full-edge-list exchange when the
    // producer guarantees distinct a < b pairs
    val e =
      if (assumeCanonical)
        edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      else edges
        .select(least(col(aCol), col(bCol)).cast("long").as("a"),
          greatest(col(aCol), col(bCol)).cast("long").as("b"))
        .filter(col("a") < col("b")).distinct()
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    val triNodes = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.join(triNodes, Seq("node"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(col("node"), col("degree"), col("n_tri"),
        when(col("degree") >= 2,
          expr("(2 * n_tri * 1000000) div (degree * (degree - 1))"))
          .otherwise(0L).as("lcc_ppm"))
  }
}
