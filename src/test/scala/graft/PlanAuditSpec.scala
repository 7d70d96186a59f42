package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, count, explode, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make these operators
  * scale (predicate pushdown to the Parquet scan, column pruning,
  * partial+final aggregation, whole-stage codegen, no accidental cartesian
  * products) are asserted on the EXPLAIN output, so a refactor that silently
  * loses one fails here rather than in a 100 TB run. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("selection pushes filters to the Parquet scan") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val p = plan(SparkEntry.run("QUERY purchase WHERE value > 100")(spark, dir))
    assert(p.contains("PushedFilters:"), p)
    // both the event-type scope filter and the user predicate reach the scan
    assert(p.contains("GreaterThan(value,100"), p)
    assert(p.contains("EqualTo(event_type,purchase)"), p)
    assert(p.contains("codegen id"), p)
  }

  test("RETURN projection prunes unread columns at the scan") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val p = plan(SparkEntry.run("QUERY purchase RETURN [value]")(spark, dir))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("props"), s"props not pruned: $readSchema")
  }

  test("aggregation is partial+final with codegen, including tz calendar buckets") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val p = plan(SparkEntry.run("QUERY purchase COUNT BY context_id")(spark, dir))
    assert(p.split("HashAggregate").length >= 3, s"expected partial+final HashAggregate:\n$p")

    spark.conf.set("spark.graft.time.zone", "America/New_York")
    try {
      val tz = plan(SparkEntry.run("QUERY purchase COUNT PER DAY")(spark, dir))
      // tz conversion is built-in from/to_utc_timestamp in the grouping
      // projection — partial+final agg preserved, no UDF/object boundary
      assert(tz.contains("from_utc_timestamp") && tz.contains("to_utc_timestamp"), tz)
      assert(tz.split("HashAggregate").length >= 3, tz)
      assert(!tz.contains("BatchEvalPython") && !tz.contains("MapPartitions"), tz)
    } finally spark.conf.unset("spark.graft.time.zone")
  }

  test("LSH-default embedding dedup plans no cartesian pair space") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val e = new graft.sources.TestDataSource(spark, dir).table("embeddings")
    val lsh = plan(graft.pipeline.Similarity.cosineNearDups(e, "vec_id", "embedding", 0.4))
    assert(!lsh.contains("CartesianProduct") && !lsh.contains("BroadcastNestedLoopJoin"),
      s"LSH path must not plan an n^2 join:\n$lsh")
    // the exact oracle slice, by contrast, IS the n^2 self-join
    val exact = plan(graft.pipeline.Similarity.cosineNearDups(e, "vec_id", "embedding", 0.4,
      lshPrefilter = false))
    assert(exact.contains("BroadcastNestedLoopJoin") || exact.contains("CartesianProduct"), exact)
  }

  test("curation pipeline is one shuffle end-to-end with no join") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val d = new graft.sources.TestDataSource(spark, dir).table("documents")
    val p = plan(graft.pipeline.TrainingPipeline.curate(d, "doc_id", "text"))
    // lang/quality filters fuse into the scan side; dedup survivor selection
    // is a window over content_key — exactly ONE Exchange, and no join
    assert("Exchange \\(".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("sequence matching is a single shuffle on the link key") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val p = plan(SparkEntry.run(
      "QUERY signup FOLLOWED BY purchase LINKED BY context_id")(spark, dir))
    // one Exchange on the link key, a Union below it, no join operator;
    // since r17 the match is sort-based — a Tungsten Sort(link, ts, eid)
    // feeds a streaming MapPartitions (consecutive-group walk) instead of
    // the old groupByKey/MapGroups object path
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    assert("Exchange \\(".r.findAllIn(p).length == 1, p)
    assert(p.contains("MapPartitions") && p.contains("Sort") && p.contains("Union"), p)
  }

  test("decontamination broadcasts the benchmark gram set, never the corpus") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val d = new graft.sources.TestDataSource(spark, dir).table("documents")
    val p = plan(graft.pipeline.Contamination.contamination(
      d.filter(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0), "doc_id", "text",
      d.filter(org.apache.spark.sql.functions.col("doc_id") % 50 === 0), "text", ngram = 3))
    // gram semi-join side is a BroadcastHashJoin (benchmark grams), so the
    // exploded corpus grams never hash-shuffle; no cartesian anywhere
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // exactly two text scans: corpus side ONCE (n_grams captured before the
    // explode) + benchmark side — a third scan means the denominator
    // recompute crept back in
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 2, s"expected 2 scans:\n$p")
  }

  test("similarity top-k is two-phase bounded agg, never a per-query window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val e = new graft.sources.TestDataSource(spark, dir).table("embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val plans = Seq(
      "brute" -> plan(graft.pipeline.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)),
      "ivf"   -> plan(graft.pipeline.Similarity.ivfTopK(e, q, "vec_id", "embedding", 5)),
      "lsh"   -> plan(graft.pipeline.Similarity.lshTopK(e, q, "vec_id", "embedding", 5, dims = 64)))
    plans.foreach { case (name, p) =>
      // a Window.partitionBy(query_id) rank would single-reducer per query
      // at 100 TB; the bounded TopKByDot aggregate (ObjectHashAggregate,
      // partial+final) must rank instead
      assert(!p.contains("Window"), s"$name plans a per-query window rank:\n$p")
      assert(p.split("ObjectHashAggregate").length >= 3,
        s"$name missing partial+final bounded top-k agg:\n$p")
    }
  }

  test("PQ: encode is one shuffle-free projection; ADC never joins the raw embeddings") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val e = new graft.sources.TestDataSource(spark, dir).table("embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val cb = graft.pipeline.Similarity.pqCodebooks(e, "vec_id", "embedding", 8, 16)
    val pe = plan(graft.pipeline.Similarity.pqEncode(e, "vec_id", "embedding", cb))
    assert(!pe.contains("Exchange") && !pe.contains("Join"),
      s"pqEncode must be a single map-side projection:\n$pe")
    val pt = plan(graft.pipeline.Similarity.pqTopK(e, q, "vec_id", "embedding", 5))
    // the LUT frame broadcasts onto the codes scan; the ranking is the
    // bounded two-phase top-k — no window, no shuffled join
    assert(!pt.contains("Window"), s"PQ plans a per-query window rank:\n$pt")
    assert(!pt.contains("SortMergeJoin") && !pt.contains("ShuffledHashJoin") &&
      !pt.contains("CartesianProduct"), s"the LUT side must broadcast:\n$pt")
    assert(pt.split("ObjectHashAggregate").length >= 3,
      s"PQ missing partial+final bounded top-k agg:\n$pt")
    // IVF-PQ: cell + codes fused in one map-side pass, probes (with LUTs)
    // broadcast — exactly ONE join, and it's the broadcast hash join on cid
    val pc = plan(graft.pipeline.Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5))
    assert("""BroadcastHashJoin""".r.findAllIn(pc).length >= 1 &&
      !pc.contains("SortMergeJoin") && !pc.contains("ShuffledHashJoin") &&
      !pc.contains("CartesianProduct") && !pc.contains("BroadcastNestedLoopJoin"),
      s"IVF-PQ must join candidates only via the cid broadcast:\n$pc")
    assert(!pc.contains("Window"), s"IVF-PQ plans a window rank:\n$pc")
  }

  test("IVF assignment is map-side: no centroid join, no row inflation") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val e = new graft.sources.TestDataSource(spark, dir).table("embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val p = plan(graft.pipeline.Similarity.ivfTopK(e, q, "vec_id", "embedding", 5))
    // centroids are plan-time literals: the ONLY join is the broadcast of
    // the (queries × nProbe) probe rows onto the corpus cells
    assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(p).length == 1,
      s"IVF should have exactly one (broadcast) join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("incremental dedup: no cartesian; corpus text never reaches the band join") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val d = new graft.sources.TestDataSource(spark, dir).table("documents")
    val c = org.apache.spark.sql.functions.col("doc_id")
    val p = plan(graft.pipeline.Dedup.incrementalDedup(
      d.filter(c % 5 === 0).select("doc_id", "text"),
      d.filter(c % 5 =!= 0).select("doc_id", "text"), "doc_id", "text"))
    // every join is keyed (content key / band hash / id) — an unkeyed pair
    // space would be corpus x batch at scale
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the corpus contributes distinct keys and narrow band rows; its raw
    // text column must be consumed AT the scan projections (hash/shingle
    // expressions), never carried into a join side
    val joinSection = p.linesIterator.filter(l => l.contains("Join") && l.contains("text"))
    assert(joinSection.isEmpty, s"corpus text leaked into a join:\n$p")
  }

  test("persisted-artifact incremental dedup: per-batch plan never scans corpus text") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val d = new graft.sources.TestDataSource(spark, dir).table("documents")
    val c = org.apache.spark.sql.functions.col("doc_id")
    val art = graft.pipeline.Dedup
      .buildDedupArtifacts(d.filter(c % 5 =!= 0).select("doc_id", "text"), "doc_id", "text")
      .materialize()
    // batch synthesized OFF parquet: any parquet scan in the per-batch
    // plan is then by construction a corpus leak. The nightly promise —
    // per-batch cost ∝ batch — means corpus participation is exactly the
    // three checkpointed-artifact RDD scans.
    import org.apache.spark.sql.functions.{col => fcol, concat_ws, lit}
    val batch = spark.range(0, 50)
      .select(fcol("id").as("doc_id"), concat_ws(" ", lit("synthetic"), lit("body"),
        (fcol("id") % 7).cast("string"), (fcol("id") % 11).cast("string")).as("text"))
    val p = plan(graft.pipeline.Dedup.incrementalDedup(
      batch, art, "doc_id", "text", 3, 0, 0, 0.5))
    assert(!p.contains("Scan parquet") && !p.contains("FileScan parquet"),
      s"corpus-sized scan leaked into the per-batch plan:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("Scan RDD"),
      s"artifact sides should be lineage-cut RDD scans:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("written-artifact incremental dedup: per-batch plan scans only the read-back tables") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val d = new graft.sources.TestDataSource(spark, dir).table("documents")
    val c = org.apache.spark.sql.functions.col("doc_id")
    val artDir = java.nio.file.Files.createTempDirectory("graft_art_pin_").toString
    graft.pipeline.Dedup
      .buildDedupArtifacts(d.filter(c % 5 =!= 0).select("doc_id", "text"), "doc_id", "text")
      .write(artDir)
    val art = graft.pipeline.Dedup.readArtifacts(spark, artDir)
    // batch synthesized OFF parquet: every parquet scan in the per-batch
    // plan must then be one of the three artifact tables — corpus text
    // participation through storage only, cost ∝ batch + artifacts
    import org.apache.spark.sql.functions.{col => fcol, concat_ws, lit}
    val batch = spark.range(0, 50)
      .select(fcol("id").as("doc_id"), concat_ws(" ", lit("synthetic"), lit("body"),
        (fcol("id") % 7).cast("string"), (fcol("id") % 11).cast("string")).as("text"))
    val p = plan(graft.pipeline.Dedup.incrementalDedup(
      batch, art, "doc_id", "text", 3, 0, 0, 0.5))
    // every parquet Location in the per-batch plan must point into the
    // artifact dir (the artifact tables are referenced by several joins —
    // each reference is artifact-sized, never corpus text)
    val locs = p.linesIterator.filter(_.contains("Location:")).toSeq
    assert(locs.nonEmpty, s"expected artifact-table scans:\n$p")
    assert(locs.forall(_.contains(artDir)),
      s"a parquet scan outside the artifact dir leaked in:\n${locs.mkString("\n")}")
    assert(!p.contains("documents.parquet"),
      s"corpus text leaked into the per-batch plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("export sharding: bucketed offsets + local counter, never a shard window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val d = new graft.sources.TestDataSource(spark, dir).table("documents")
    val p = plan(graft.pipeline.DataMix.exportShards(d, "doc_id", nShards = 8))
    // a Window over the 8-value shard key would funnel the corpus through 8
    // reducers — and repartition(8) would funnel it through 8 TASKS; the
    // two-phase shape shuffles on (shard, bucket) (8×1000-way parallel),
    // broadcast-joins the collected offsets, and counts locally
    assert(!p.contains("Window"), s"shard-cardinality window crept in:\n$p")
    assert(p.contains("BroadcastExchange"), p) // offsets join, not shuffled
    // exactly one SHUFFLE exchange: the (shard, bucket) repartition — its
    // key list must carry bkt, not shard alone
    val shuffles = p.linesIterator.filter(_.contains("hashpartitioning(")).toSeq
    assert(shuffles.length == 1, s"expected 1 shuffle:\n$p")
    assert(shuffles.head.contains("bkt"), s"shuffle must key on (shard, bkt):\n$p")
    assert(p.contains("Sort") && p.contains("MapPartitions"), p)
  }

  test("centroid classification is one map-side projection: no join/window/shuffle") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val e = new graft.sources.TestDataSource(spark, dir).table("embeddings")
    val p = plan(graft.pipeline.Similarity.classifyByCentroids(
      e, "vec_id", "embedding",
      e.filter(org.apache.spark.sql.functions.col("vec_id") < 8), "vec_id", "embedding"))
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("Exchange"),
      s"classification must stay map-side:\n$p")
  }

  test("clustering rounds are shuffle-only: no cartesian in the star step") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    import spark.implicits._
    // the iterative loop materializes per round, so audit one star round's
    // shape via the public API on a graph that converges in one round
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_1", "id_2")
    // force the distributed rounds — the plan under audit — past the
    // small-graph fast path
    val labels = graft.pipeline.Clustering.connectedComponents(pairs, localThreshold = -1)
    val p = plan(labels)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("per-group sampling is two-phase bounded agg, never a per-group window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val p = plan(graft.pipeline.DataMix.samplePerGroup(docs, "source", "doc_id", 5))
    assert(!p.contains("Window"), s"samplePerGroup plans a per-group window rank:\n$p")
    assert(p.split("ObjectHashAggregate").length >= 3,
      s"missing partial+final bounded sample agg:\n$p")
  }

  test("corpus heavy hitters: partial+final count, TakeOrdered global top-k") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val p = plan(graft.pipeline.TextAnalysis.topTokens(docs, "text", 20))
    assert(p.split("HashAggregate").length >= 3,
      s"missing partial+final vocabulary count:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell back to a full sort:\n$p")
    assert(!p.contains("\n(1) Sort") && !p.contains(" Sort "),
      s"global sort in a top-k plan:\n$p")
  }

  test("chunking and repetition stats are map-side: no exchange, pruned scan") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    import org.apache.spark.sql.functions.col
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val chunkPlan = plan(graft.pipeline.Chunking.chunk(docs, "doc_id", "text", 64, 48))
    val repCols = graft.pipeline.TextAnalysis.repetitionStats(col("text"))
    val repPlan = plan(docs.select(col("doc_id") +: repCols.map { case (n, c) => c.as(n) }: _*))
    Seq("chunk" -> chunkPlan, "repetition" -> repPlan).foreach { case (name, p) =>
      assert(!p.contains("Exchange"), s"$name shuffles a per-row operator:\n$p")
      val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(!readSchema.contains("lang"), s"$name reads unused columns: $readSchema")
    }
  }

  test("term search is map-side scoring + TakeOrdered, never a sort or window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val p = plan(graft.pipeline.Search.searchTopK(docs, "doc_id", "text",
      Seq("dup", "vector"), k = 10))
    // term dfs were collected as literals at plan-build; the remaining plan
    // must be scan → project/filter → bounded top-k
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell back to a full sort:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(!p.contains("Exchange"), s"search scoring shuffles:\n$p")
  }

  test("posting heads are a bounded two-phase agg, never an unbounded collect") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val p = plan(graft.pipeline.Search.buildPostings(docs, "doc_id", "text", 8))
    // a stopword's posting head must stay ≤ cap per partition: the bounded
    // aggregate appears partial+final, and no collect_list/sort anywhere
    assert(p.split("ObjectHashAggregate").length >= 3,
      s"missing partial+final bounded head agg:\n$p")
    assert(!p.contains("collect_list") && !p.contains("Window"), p)
  }

  test("corpus signals collapse to doc-distinct pairs before any exchange") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val plans = Seq(
      "rarity" -> plan(graft.pipeline.CorpusSignals.rarityStats(docs, "doc_id", "text", 50)),
      "boilerplate" -> plan(graft.pipeline.CorpusSignals.boilerplateStats(docs, "doc_id", "text")))
    plans.foreach { case (name, p) =>
      // the exploded occurrences must partial-aggregate map-side (partial +
      // final HashAggregate pairs) so only doc-distinct rows shuffle, and
      // the df join-back must never be a nested-loop/cartesian
      assert(p.split("HashAggregate").length >= 5,
        s"$name missing partial+final aggregates:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name plans a pair space:\n$p")
      val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(!readSchema.contains("lang") && !readSchema.contains("source"),
        s"$name reads unused columns: $readSchema")
    }
  }

  test("url parse is one codegen'd projection; curate caps without a domain window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    import org.apache.spark.sql.functions.{col => fcol, concat, lit}
    val withUrl = docs.select(fcol("doc_id"),
      concat(lit("http://h"), (fcol("doc_id") % 9).cast("string"),
        lit(".example.com/p/"), fcol("doc_id").cast("string")).as("url"))
    val pp = plan(graft.pipeline.UrlCuration.parseUrls(withUrl, "doc_id", "url"))
    assert(!pp.contains("Exchange") && !pp.contains("Join") && !pp.contains("Window"),
      s"parseUrls must stay map-side:\n$pp")
    // formatted explain stars codegen'd nodes; an un-starred Project means
    // a CodegenFallback expression (e.g. a higher-order filter) crept in
    assert(pp.contains("* Project"), s"parseUrls fell out of codegen:\n$pp")
    val spark2 = spark
    import spark2.implicits._
    val pc = plan(graft.pipeline.UrlCuration.curate(withUrl, "doc_id", "url",
      Seq("blocked.example").toDF("domain"), perDomainCap = 3))
    // the cap must ride the bounded TopKByDot aggregate, never a
    // per-domain Window; the blocklist must broadcast
    assert(!pc.contains("Window"), s"per-domain window crept into curate:\n$pc")
    assert(pc.contains("BroadcastExchange"), s"blocklist not broadcast:\n$pc")
    assert(!pc.contains("CartesianProduct") && !pc.contains("BroadcastNestedLoopJoin"), pc)
  }

  test("naive bayes inference: doc-distinct collapse, broadcast model, no window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val model = graft.pipeline.CorpusSignals.trainNbModel(
      docs, "doc_id", "text", "lang", buckets = 512)
    val p = plan(graft.pipeline.CorpusSignals.classifyNb(
      model, docs, "doc_id", "text", buckets = 512))
    // the label fan-out must ride a BROADCAST of the aggregate-sized model
    // — a shuffled join would exchange the corpus occurrences on fb
    assert(p.contains("BroadcastHashJoin"), s"model join not broadcast:\n$p")
    // the one allowed nested-loop is the model-side labels x buckets grid
    // crossJoin — aggregate-cardinality by construction; anything touching
    // the corpus side must hash-join or fail here
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"bad join strategy:\n$p")
    // formatted explain names each node twice (tree line + detail block)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 2 &&
      !p.contains("BroadcastNestedLoopJoin Inner"),
      s"nested-loop beyond the model grid:\n$p")
    // (id, fb) partial+final collapse before the fan-out, and the argmax is
    // an aggregate — never a per-document Window on the CLASSIFY side (the
    // model side's per-label totals window over bucket rows is fine)
    assert(p.split("HashAggregate").length >= 5,
      s"missing partial+final occurrence collapse:\n$p")
    assert("Window".r.findAllIn(p).length <= 4, // 2 nodes x 2 mentions
      s"per-document window crept into inference:\n$p")
  }

  test("selection chain v3 plans no pair space and a bounded scan count") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val f = graft.PipelineQueries.queries("q_pipeline_v3")(spark, dir)
    f.collect()
    val p = f.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"v3 chain plans a pair space:\n$p")
    // four corpus-relative models + the dedup/self joins: the corpus may
    // be scanned once per model stage but never per branch-within-a-stage
    // (surprisal and DSIR each reuse their occurrence exchange)
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans <= 6, s"v3 chain reads the corpus $scans times:\n$p")
  }

  test("corpus signals scan and tokenize once: the df branch reuses the exchange") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val dfs = Seq(
      "rarity" -> graft.pipeline.CorpusSignals.rarityStats(docs, "doc_id", "text", 50),
      "boilerplate" -> graft.pipeline.CorpusSignals.boilerplateStats(docs, "doc_id", "text"),
      // these two also pin the explicit isnotnull-on-the-join-key spelling:
      // the context/totals Window blocks the inferred probe-side filter
      // from pushing down symmetrically, so without it the subtrees differ
      // and the corpus is scanned per branch
      "surprisal" -> graft.pipeline.CorpusSignals.surprisalStats(docs, "doc_id", "text"),
      "dsir" -> graft.pipeline.CorpusSignals.importanceScore(
        docs, "doc_id", "text", org.apache.spark.sql.functions.col("source") === "src0", 512))
    dfs.foreach { case (name, f) =>
      // exchange reuse is an AQE runtime decision — execute, then audit the
      // final plan: without ReusedExchange the scan + explode + hashing of
      // the occurrence frame runs TWICE (once per consumer branch)
      f.collect()
      val p = f.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"$name recomputes the occurrence exchange per branch:\n$p")
      val finalPlan = p.split("== Initial Plan ==")(0)
      assert("FileScan parquet".r.findAllIn(finalPlan).length == 1,
        s"$name scans the corpus more than once:\n$p")
    }
    // crossSurprisal reads TWO corpora: each must scan once — the LM and
    // its occurrence total share the reference gram exchange
    val cross = graft.pipeline.CorpusSignals.crossSurprisal(
      docs.filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("source")) === 4), "text",
      docs.filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("source")) === 5), "doc_id", "text")
    cross.collect()
    val cp = cross.queryExecution.executedPlan.toString
    assert(cp.contains("ReusedExchange"),
      s"crossSurprisal recomputes the reference grams per branch:\n$cp")
    assert("FileScan parquet".r.findAllIn(cp.split("== Initial Plan ==")(0)).length == 2,
      s"crossSurprisal scans a corpus more than once:\n$cp")
  }

  test("sessionize: one exchange on the context key reused by windows + aggregate") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.sessionize(
      ev, "context_id", "timestamp", "event_id", 21600L)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // lag + running-sum windows and the (ctx, session) aggregate must share
    // the hash(context_id) partitioning: exactly ONE shuffle in the plan
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"sessionize must shuffle once on the context key:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"sessionize must never funnel through one partition:\n$p")
  }

  test("retention: two bounded aggregations, no distinct-then-window double pass") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.retentionCohorts(
      ev, "context_id", "timestamp")
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Window"), s"retention must not use a window:\n$p")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n >= 1 && n <= 2,
      s"retention needs one or two exchanges (user, cohort cell), got $n:\n$p")
    // the calendar mode must keep the same shape: tz/week-start math is
    // pure codegen'd projection, never a join or window
    val pc = graft.pipeline.EventAnalytics.retentionCohortsCalendar(
      ev, "context_id", "timestamp", zone = "America/New_York")
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!pc.contains("Window") && !pc.contains("Join"),
      s"calendar retention must stay join/window-free:\n$pc")
    val nc = "Exchange hashpartitioning".r.findAllIn(pc).length
    assert(nc >= 1 && nc <= 2,
      s"calendar retention needs one or two exchanges, got $nc:\n$pc")
  }

  test("global line dedup: groupBy-min winners with partial agg, never a per-line window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val p = plan(graft.pipeline.CorpusSignals.dedupLinesGlobal(docs, "doc_id", "text"))
    // a per-line row_number would funnel every occurrence of a hot
    // boilerplate line through one task; the min(struct) winner combines
    // map-side
    assert(!p.contains("Window"), s"line dedup must not rank with a window:\n$p")
    assert(p.contains("partial_min") || p.split("HashAggregate").length >= 3,
      s"winner selection must partial-aggregate map-side:\n$p")
  }

  test("scalar quantization encodes in one projection: no join/window in phase 2") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val e = new graft.sources.TestDataSource(spark, dir).table("embeddings")
    val p = plan(graft.pipeline.Similarity.scalarQuantize(e, "vec_id", "embedding"))
    // the bounds are inlined literals — the encode pass must not join or
    // shuffle the vectors (the bounds aggregation ran at plan-build time)
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("Exchange"),
      s"quantization encode must stay map-side:\n$p")
  }

  test("top-k per context is the bounded two-phase aggregate, never a window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = plan(graft.pipeline.EventAnalytics.topEventsPerContext(
      ev, "context_id", "event_id", "value", "timestamp", 3))
    assert(!p.contains("Window"), s"per-group top-k must not rank with a window:\n$p")
    assert(p.contains("topk_by_dot"), s"expected the bounded TopKByDot aggregate:\n$p")
    // partial (ObjectHashAggregate partial) + final phases present
    assert(p.split("Aggregate").length >= 3, s"expected partial+final aggregate:\n$p")
  }

  test("session funnel: context-keyed throughout, no single-partition funnel") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.sessionFunnel(
      ev, "context_id", "timestamp", "event_id", "event_type", 21600L,
      "signup", "purchase")
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange SinglePartition"),
      s"session funnel must never funnel through one partition:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("k-step session funnel: one context exchange, no per-step join explosion") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.sessionFunnelK(
      ev, "context_id", "timestamp", "event_id", "event_type", 21600L,
      Seq("view", "click", "purchase"))
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the chain walk is a fold over each session's collected step events:
    // the session-assignment windows and the (ctx, session) aggregate share
    // ONE hash(context) exchange, and adding steps must not add joins
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"k-step funnel must shuffle once on the context key:\n$p")
    assert(!p.contains("Join"), s"k-step funnel must not join per step:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"k-step funnel must never funnel through one partition:\n$p")
  }

  test("time-budget funnel keeps the single-exchange join-free shape") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.sessionFunnelK(
      ev, "context_id", "timestamp", "event_id", "event_type", 21600L,
      Seq("view", "click", "purchase"), withinSec = 7200L)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"budgeted funnel must still shuffle once on the context key:\n$p")
    assert(!p.contains("Join"), s"budgeted funnel must not join:\n$p")
  }

  test("part-6/7 analytics keep their scale shapes (no window-rank, no single-partition funnel)") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    import graft.pipeline.EventAnalytics
    def sp(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // growth accounting: per-user windows on the context key only
    val g = sp(EventAnalytics.growthAccounting(ev, "context_id", "timestamp"))
    assert(!g.contains("Exchange SinglePartition"), s"growthAccounting funnels:\n$g")
    assert(!g.contains("CartesianProduct"), g)
    // power curve / RFM: percentile bounds collected, scoring map-side —
    // the OUTPUT plan must be window-free
    val pc = sp(EventAnalytics.powerCurve(ev, "context_id"))
    assert(!pc.contains("Window"), s"powerCurve plans a window:\n$pc")
    val rfm = sp(EventAnalytics.rfmSegments(ev, "context_id", "timestamp",
      "event_type", "value", "purchase"))
    assert(!rfm.contains("Window"), s"rfmSegments plans a window:\n$rfm")
    // rate anomalies: day-grain explosion, never a corpus self-join or window
    val ar = sp(EventAnalytics.anomalousRates(ev, "context_id", "timestamp",
      "event_type", "purchase", 7, 50000L))
    assert(!ar.contains("Window") && !ar.contains("CartesianProduct"),
      s"anomalousRates must stay window- and cartesian-free:\n$ar")
    // behavioral trigrams: bounded TakeOrdered ranking
    val ts = sp(EventAnalytics.topSequences(ev, "context_id", "timestamp",
      "event_id", "event_type", 21600L, 3, 25))
    assert(ts.contains("TakeOrderedAndProject"), s"topSequences must TakeOrdered:\n$ts")
    // key skew: one aggregate per key, no window, no global sort
    val ks = sp(graft.pipeline.Profile.keySkew(
      new graft.sources.TestDataSource(spark, dir).table("lineitem"), Seq("l_orderkey")))
    assert(!ks.contains("Window") && !ks.contains("Sort "), s"keySkew must not sort:\n$ks")
  }

  test("revenue rollup: dimension joins broadcast, no cartesian") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val p = plan(AnalyticsQueries.queries("q_revenue_by_nation")(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"customer and nation must broadcast onto the fact side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("incremental sessionization: state joins on the context key, no extra corpus shuffle") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val state = graft.pipeline.EventAnalytics.sessionState(
      graft.pipeline.EventAnalytics.sessionize(
        ev.filter(org.apache.spark.sql.functions.col("timestamp") < 1705363200L),
        "context_id", "timestamp", "event_id", 21600L), "context_id")
    val p = graft.pipeline.EventAnalytics.assignSessionsIncremental(
      ev.filter(org.apache.spark.sql.functions.col("timestamp") >= 1705363200L),
      state, "context_id", "timestamp", "event_id", 21600L)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"state must equi-join on the context key:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"incremental sessionization must never funnel through one partition:\n$p")
  }

  test("experimentLift: user-grain collapse, no window, control joins as broadcast") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.experimentLift(
      ev, "context_id", "event_type", "purchase", nVariants = 3)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Window"), s"experimentLift must not window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"the 1-row control side must broadcast, never shuffle the arms:\n$p")
  }

  test("topPaths: bounded TakeOrdered ranking, no join, no single-partition funnel") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.topPaths(
      ev, "context_id", "timestamp", "event_id", "event_type", 21600L,
      maxLen = 5, topN = 25)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TakeOrderedAndProject"),
      s"topPaths must rank via bounded TakeOrdered, not a global sort:\n$p")
    assert(!p.contains("Join"), s"topPaths must not join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"topPaths must never funnel through one partition:\n$p")
  }

  test("weightedSamplePerGroup never plans a per-group window rank") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val p = plan(graft.pipeline.DataMix.weightedSamplePerGroup(
      docs, "source", "doc_id", "n_chars", 20))
    assert(!p.contains("Window"),
      s"weightedSamplePerGroup plans a per-group window rank:\n$p")
  }

  test("engagement: window-free rolling distinct, bounded exchanges") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.engagement(ev, "context_id", "timestamp")
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the rolling WAU must come from the map-side window-end explode, not
    // a per-day self-join of the activity table or a rolling window
    assert(!p.contains("Window"), s"engagement must not use a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("hybrid retrieval: dense side is a map-side dot, ranking is TakeOrdered") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val src = new graft.sources.TestDataSource(spark, dir)
    val p = graft.pipeline.Search.hybridTopK(
      src.table("documents"),
      src.table("embeddings").withColumnRenamed("vec_id", "doc_id"),
      "doc_id", "text", "embedding", Seq("dup"), 0L, 5)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the query vector is a literal: no join against it, no window rank,
    // global top-k via TakeOrdered
    assert(p.contains("TakeOrderedAndProject"),
      s"hybrid ranking must be a bounded global top-k:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("batched hybrid retrieval: one job, map-side scoring, bounded per-query top-k") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val src = new graft.sources.TestDataSource(spark, dir)
    import spark.implicits._
    val qt = Seq((0L, Seq("dup")), (1L, Seq("vector"))).toDF("query_id", "terms")
    val p = plan(graft.pipeline.Search.hybridTopKBatch(
      src.table("documents"),
      src.table("embeddings").withColumnRenamed("vec_id", "doc_id"),
      "doc_id", "text", "embedding", qt, "query_id", "terms", 5))
    // query vectors are literals in the per-doc explode: no join against
    // the query table, no per-query window rank — the per-query top-k is
    // the bounded two-phase TopKByDot aggregate
    assert(!p.contains("Window"), s"batched retrieval must not rank with a window:\n$p")
    assert(p.contains("topk_by_dot"), s"expected the bounded TopKByDot aggregate:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("KMV sketch: one partial+final aggregation, bounded bottom-k state, no expand") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).table("events")
    val p = plan(graft.pipeline.Sketches.kmvDistinct(
      ev, "event_type", col("user_id").cast("string"), 32))
    assert(p.contains("bottom_k"), s"expected the bounded BottomKLongs aggregate:\n$p")
    // partial + final ObjectHashAggregate phases; exactly one exchange
    assert(p.split("Aggregate").length >= 3, s"expected partial+final aggregate:\n$p")
    assert(p.split("Exchange").length - 1 <= 2, s"expected one group exchange:\n$p")
    // the exact spelling's distinct-expand must NOT appear
    assert(!p.contains("Expand"), s"KMV must not plan a count-distinct expand:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("KMV overlap: both sketches in ONE scan/aggregation, no self-join") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val g = docs.select((col("doc_id") % 2).as("side"),
      explode(graft.pipeline.Dedup.shingles(col("text"), 3)).as("sh"))
    val p = plan(graft.pipeline.Sketches.kmvOverlap(
      g, col("side") === 0, col("side") === 1, col("sh"), 256))
    assert(!p.contains("Join"), s"overlap must not self-join the corpus:\n$p")
    // one documents scan only — both conditional sketches share the pass
    // (each physical scan contributes exactly one Location: detail line)
    assert(p.split("Location:").length - 1 == 1, s"expected exactly one scan:\n$p")
  }

  test("CMS: counter table broadcasts to the candidate side, partial agg absorbs the explode") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val t = docs.select(col("doc_id"),
      explode(graft.pipeline.Dedup.shingles(col("text"), 3)).as("sh"))
    val counters = graft.pipeline.Sketches.cmsCounters(t, col("sh"), 4, 512)
    val p = plan(graft.pipeline.Sketches.cmsEstimate(
      counters, t.select("sh").distinct(), col("sh"), 4, 512))
    assert(p.contains("BroadcastHashJoin"), s"counters must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    // counter build: generate (explode) feeds partial+final hash aggregation
    assert(p.contains("Generate"), p)
  }

  test("asOf join: one key exchange, no SQL join node, no window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("context_id"), col("event_id"), col("timestamp"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("context_id"), col("timestamp"), col("value"))
    val p = plan(graft.pipeline.AsOfJoin.asOf(
      purchases, views, "context_id", "timestamp", "timestamp", dimPrefix = "view_"))
    // (the operator's own class name contains "Join" — pin the node names)
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "CartesianProduct", "BroadcastNestedLoopJoin").foreach(n =>
      assert(!p.contains(n), s"asOf must not plan an n^2/range join ($n):\n$p"))
    assert(!p.contains("Window"), p)
    // exactly one shuffle: the group-by-key exchange shared by both sides
    assert(p.split("Exchange").length - 1 <= 2, s"expected one key exchange:\n$p")
    assert(p.contains("FlatMapGroups") || p.contains("MapGroups"), p)
  }

  test("bucketed storage: co-located equi-join plans ZERO exchanges") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket_pin_").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the M8 layout: both sides bucketed + sorted on the join key at
      // WRITE time, so the join is map-side at READ time — the shuffle is
      // paid once at ingest, not once per query
      ev.filter(col("event_type") === "purchase")
        .write.option("path", s"$tmp/a").bucketBy(8, "context_id")
        .sortBy("context_id").mode("overwrite").saveAsTable("graft_bucket_pin_a")
      ev.filter(col("event_type") === "view")
        .groupBy("context_id").count()
        .write.option("path", s"$tmp/b").bucketBy(8, "context_id")
        .sortBy("context_id").mode("overwrite").saveAsTable("graft_bucket_pin_b")
      val joined = spark.table("graft_bucket_pin_a")
        .join(spark.table("graft_bucket_pin_b"), "context_id")
      val p = plan(joined)
      assert(!p.contains("Exchange"),
        s"bucketed-by-key sides must join without any shuffle:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_pin_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_pin_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("persisted IVF index: the query-time plan scans only the artifact directory") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val e = new graft.sources.TestDataSource(spark, dir).table("embeddings")
    val idxDir = java.nio.file.Files.createTempDirectory("graft_ivf_pin_").toString
    graft.pipeline.Similarity.writeIvfIndex(
      graft.pipeline.Similarity.buildIvfIndex(e, "vec_id", "embedding", nClusters = 8),
      idxDir)
    val idx = graft.pipeline.Similarity.readIvfIndex(spark, idxDir)
    // queries synthesized OFF parquet so the one allowed scan source is
    // the index itself; centroids are a bounded collect, probes broadcast
    import org.apache.spark.sql.functions.{col => fcol, transform => ftransform, sequence => fsequence, lit}
    val queries = spark.range(0, 5).select(fcol("id").as("vec_id"),
      ftransform(fsequence(lit(1), lit(64)),
        x => (x * (fcol("id") + 1) % 7).cast("float") / 1000f).as("embedding"))
    val p = plan(graft.pipeline.Similarity.ivfTopKIndexed(
      idx, queries, "vec_id", "embedding", k = 3, nProbe = 2))
    val locs = p.linesIterator.filter(_.contains("Location:")).toSeq
    assert(locs.nonEmpty, s"expected postings-table scans:\n$p")
    assert(locs.forall(_.contains(idxDir)),
      s"a scan outside the index dir leaked into the query plan:\n${locs.mkString("\n")}")
    assert(!p.contains("embeddings.parquet"),
      s"raw embeddings leaked into the query-time plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probes must broadcast:\n$p")
  }

  test("range join: bucket equi-join, never a nested-loop over bands") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val li = new graft.sources.TestDataSource(spark, dir).table("lineitem")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        org.apache.spark.sql.functions.round(col("l_extendedprice") * 100)
          .cast("long").as("price_c"))
    val bands = spark.range(10).select(
      (col("id") * 1000000L).as("lo"), (col("id") * 1000000L + 750000L).as("hi"),
      col("id").cast("string").as("tier"))
    val p = plan(graft.pipeline.RangeJoin.bandJoin(
      li, col("price_c"), bands, "lo", "hi", 250000L))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"non-equi predicate must become an equi-join:\n$p")
    assert(p.contains("HashJoin"), s"expected a hash equi-join on the bucket:\n$p")
  }

  test("histogram quantiles: two bounded aggregations, cumulative walk is a fold not a window") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).table("events")
    val p = plan(graft.pipeline.Sketches.histogramQuantiles(ev, "event_type",
      org.apache.spark.sql.functions.round(col("value") * 1000).cast("long"),
      0L, 512000L, 64, Seq(50, 90, 99)))
    assert(!p.contains("Window"), s"cumulative walk must not be a window over rows:\n$p")
    assert(!p.contains("Join"), p)
    // (group, bin) partial+final then per-group histogram assembly
    assert(p.split("Aggregate").length >= 3, s"expected partial+final aggregation:\n$p")
  }

  test("bloom probe: literal-bitmask filter, no join or exchange on the probe side") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val src = new graft.sources.TestDataSource(spark, dir)
    val build = src.table("part").select(col("p_partkey").cast("long").as("key"))
      .filter(col("key") % 97 === 0)
    val mask = graft.pipeline.Sketches.bloomMask(build, col("key"), 512, 3)
    val probe = src.table("lineitem")
      .filter(graft.pipeline.Sketches.bloomTest(mask, col("l_partkey").cast("long"), 512, 3))
      .select("l_partkey")
    val p = plan(probe)
    assert(!p.contains("Join"), s"bloom test must be join-free:\n$p")
    assert(!p.contains("Exchange"), s"bloom test must be shuffle-free:\n$p")
    assert(p.contains("codegen id"), s"bloom test must stay in whole-stage codegen:\n$p")
  }

  test("image near-dup: banded candidate join, decode-once, never broadcast/cartesian") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val h = graft.pipeline.Multimodal.imageDHashes(
      graft.pipeline.Multimodal.syntheticPngs(docs, "doc_id", 5, 6))
    val nd = graft.pipeline.Multimodal.nearDupImages(h)
    val p = plan(nd)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup must join on band buckets, not all pairs:\n$p")
    // the decode pipeline has no size stats — an unguarded join broadcasts
    // a corpus-sized side (driver OOM at scale) and decodes every blob
    // twice; the merge-hinted self-join must shuffle both sides instead
    assert(!p.contains("BroadcastHashJoin"),
      s"near-dup must not broadcast the banded corpus:\n$p")
    // executed: the second shuffle must reuse the first (ONE decode pass)
    nd.collect()
    val ep = nd.queryExecution.executedPlan.toString
    assert("MapPartitions".r.findAllIn(ep.split("== Initial Plan ==")(0)).length == 2,
      s"near-dup must synthesize+decode exactly once:\n$ep")
  }

  test("video near-dup: pair join reads ONLY the cached frame table, never re-decodes") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    // the exact internal shape of Multimodal.nearDupVideos: decode → distinct
    // → persist, then self-join + totals off the cache
    val fh = graft.pipeline.Multimodal.videoFrameDHashes(
      graft.pipeline.Multimodal.syntheticAvis(docs.select(col("doc_id")), "doc_id"))
    val vh = fh.select(col("media_id"), col("frame_key")).distinct().persist()
    try {
      vh.count() // the ONE decode pass
      val l = vh.alias("l"); val r = vh.alias("r")
      val pairs = l.join(r, col("l.frame_key") === col("r.frame_key") &&
          col("l.media_id") < col("r.media_id"))
        .groupBy(col("l.media_id").as("a"), col("r.media_id").as("b"))
        .agg(count(lit(1)).as("shared"))
      pairs.collect()
      // walk the EXECUTED operator tree (InMemoryTableScan is a leaf here —
      // the cache's defining plan, which rightly contains the decode, is a
      // field of the relation, not an executed child)
      def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        p +: kids.flatMap(flatten)
      }
      val names = flatten(pairs.queryExecution.executedPlan)
        .map(_.getClass.getSimpleName)
      // a MapPartitions in the executed pair tree means a join side bypassed
      // the cache and re-ran container demux + JPEG decode over the corpus
      assert(!names.exists(_.contains("MapPartitions")),
        s"pair join must read the cached frame table, not re-decode: $names")
      assert(names.exists(_.contains("InMemoryTableScan")),
        s"pair join must scan the cache: $names")
    } finally { vh.unpersist(blocking = false); () }
  }

  test("interval join: bucket equi-join, never a nested-loop over interval pairs") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val src = new graft.sources.TestDataSource(spark, dir)
    val orders = src.table("orders").select(col("o_orderkey").as("oid"),
        (col("o_orderdate").cast("timestamp").cast("long") / 86400).cast("long").as("o_lo"))
      .withColumn("o_hi", col("o_lo") + 10)
    val promos = spark.range(20).select(col("id").as("pid"),
      (col("id") * 35 + 8035).as("p_lo"), (col("id") * 35 + 8060).as("p_hi"))
    val p = plan(graft.pipeline.RangeJoin.intervalJoin(
      orders, "o_lo", "o_hi", promos, "p_lo", "p_hi", 32L))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join must equi-join on buckets:\n$p")
  }

  test("session entry/exit: one context exchange serves sessions, matrix agg is the only other") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.sessionEntryExit(ev,
        "context_id", "timestamp", "event_id", "event_type", 21600L)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // hash(context) once (window + (ctx, session) aggregate reuse it) +
    // the tiny (entry, exit) matrix shuffle — nothing else moves data
    assert("Exchange".r.findAllIn(p).length == 2,
      s"expected exactly 2 exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("churn life table: corpus-end is a broadcast 1-row side, no data-sized join") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.churnLifeTable(ev,
        "context_id", "timestamp", 7L)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the only join is the 1-row corpus-end scalar broadcast; risk-set
    // window runs over the aggregated life table, not events
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert("Exchange".r.findAllIn(p).length <= 5, s"unexpected exchange growth:\n$p")
  }

  test("cohort LTV: no cohort join — bounded collect_list explode, windows on the matrix only") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ev = new graft.sources.TestDataSource(spark, dir).allEvents
    val p = graft.pipeline.EventAnalytics.cohortLtv(ev,
        "context_id", "timestamp", "value", 604800L)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the cohort pin rides the context aggregation (collect_list bounded
    // by buckets-per-context) — a join would re-shuffle the bucket table
    assert(!p.contains("Join"), s"cohort LTV must not join:\n$p")
    assert("Exchange".r.findAllIn(p).length <= 4, s"unexpected exchange growth:\n$p")
  }

  test("round-9 additions: no cartesian plans, single window passes, bounded graph joins") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val src = new graft.sources.TestDataSource(spark, dir)
    val docs = src.table("documents")
    def simple(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // skip-gram: ONE window pass, the mirror is map-side — no self-join
    val sg = simple(graft.pipeline.CorpusSignals.skipGramPairs(docs, "doc_id", "text", 2))
    assert("Window".r.findAllIn(sg).length == 1 && !sg.contains("Join"), sg)
    // fuzzy decontamination: banded candidates, never train × test
    val fd = simple(graft.pipeline.Dedup.minhashNearDupsAcross(
      docs, docs.limit(5), "doc_id", "text"))
    assert(!fd.contains("CartesianProduct") && !fd.contains("BroadcastNestedLoopJoin"), fd)
    // triangle stats + pagerank: equi-joins only over the pair graph
    val edges = spark.range(20).selectExpr("id as a", "id + 1 as b")
    val tr = simple(graft.pipeline.Clustering.triangleStats(edges, "a", "b"))
    assert(!tr.contains("CartesianProduct") && !tr.contains("BroadcastNestedLoopJoin"), tr)
    // Mann–Whitney: joins nothing; windows run over the value-grain
    // aggregate only (Spark may fuse the two cumulatives into one node)
    val ev = src.allEvents
    val mw = simple(graft.pipeline.EventAnalytics.mannWhitneyU(ev, "context_id", "value"))
    assert(!mw.contains("Join") && "Window".r.findAllIn(mw).length <= 2 &&
      mw.contains("Window"), mw)
  }

  test("round-9 continuation: one-exchange exclusion funnel, range-ranked SND, shuffle-only graphs") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val src = new graft.sources.TestDataSource(spark, dir)
    val ev = src.allEvents
    val docs = src.table("documents")
    def simple(df: DataFrame) =
      df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // exclusion funnel: three same-key windows + the context collapse ride
    // ONE hash(context) exchange; no join anywhere
    val fx = simple(graft.pipeline.EventAnalytics.funnelExclusion(ev,
      "context_id", "timestamp", "event_id", "event_type",
      "signup", "purchase", "error"))
    assert("Exchange".r.findAllIn(fx).length == 1 && !fx.contains("Join"), fx)
    // trimmed means: value-grain aggregate, then single-partition windows
    // over the GRAIN table only — no join, at most 2 exchanges
    val tm = simple(graft.pipeline.EventAnalytics.trimmedMeans(
      ev, "context_id", "value"))
    assert(!tm.contains("Join") && "Exchange".r.findAllIn(tm).length <= 2, tm)
    // CUSUM: two aggregations (partial+final), fold is an expression —
    // no window, no join
    val cp = simple(graft.pipeline.EventAnalytics.cusumChangepoint(
      ev, "event_type", "timestamp", burnDays = 7))
    assert(!cp.contains("Join") && !cp.contains("Window"), cp)
    // sorted-neighborhood: the global rank is range partitioning + a
    // PER-PARTITION window with broadcast offsets (never a single-partition
    // window over the corpus). The range exchange itself now lives behind
    // the pinned localCheckpoint (it must not re-sample between the counts
    // job and the join job), so the visible plan is pinned on the window
    // being keyed by the partition id, with its offsets broadcast-joined
    val sndRank = simple(graft.pipeline.Ranking.globalRank(
      docs.selectExpr("doc_id", "text as _key"), Seq("_key", "doc_id")))
    assert(sndRank.contains("windowspecdefinition(_pid"), sndRank)
    assert(sndRank.contains("BroadcastHashJoin"), sndRank)
    val snd = simple(graft.pipeline.Dedup.sortedNeighborhoodDups(
      docs, "doc_id", "text"))
    assert(!snd.contains("CartesianProduct") &&
      !snd.contains("BroadcastNestedLoopJoin"), snd)
    // identity edges: star edges via groupBy-min + key equi-join — linear,
    // no cartesian, no window
    val ie = simple(graft.pipeline.Identity.identityEdges(
      ev.selectExpr("context_id", "concat('d', cast(context_id as long) % 7) as dev"),
      "context_id", Seq("dev")))
    assert(!ie.contains("CartesianProduct") && !ie.contains("Window"), ie)
    // label propagation: shuffle-only rounds — aggregate argmax, no window
    val edges = spark.range(20).selectExpr("id as a", "id + 1 as b")
    val lpa = simple(graft.pipeline.Clustering.labelPropagation(edges, "a", "b", 2))
    assert(!lpa.contains("Window") && !lpa.contains("CartesianProduct"), lpa)
    // salted join: with broadcast off, the shuffle keys must include the
    // salt — the whole point is that a hot key spans `salts` partitions
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.range(1000).selectExpr("id % 3 as k", "id as v")
      val dim = spark.range(3).selectExpr("id as k", "id * 10 as w")
      val sj = plan(graft.pipeline.SaltedJoin.join(fact, dim, "k", 8))
      assert(sj.contains("_salt"), sj)
      assert(sj.linesIterator.exists(l =>
        l.contains("hashpartitioning") && l.contains("_salt")), sj)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("audio fingerprints: one per-media window, no self-join; match joins fp keys, argmax is an aggregate") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val docs = new graft.sources.TestDataSource(spark, dir).table("documents")
    val wavs = docs.select(col("doc_id").as("media_id"),
      graft.pipeline.Multimodal.syntheticWalshWav(col("doc_id"), 320, 16000).as("bytes"))
    val peaks = graft.pipeline.Multimodal.audioWhtPeaks(wavs, 64)
    val fps = graft.pipeline.Multimodal.audioFingerprints(peaks, maxDelta = 2)
    val pf = fps.queryExecution.explainString(ExplainMode.fromString("simple"))
    // every Δ lead comes from ONE window pass; keys are map-side math
    assert("Window".r.findAllIn(pf).length == 1, pf)
    assert(!pf.contains("Join"), s"fingerprinting must not self-join the peaks:\n$pf")
    val m = graft.pipeline.Multimodal.matchAudioFingerprints(fps, fps)
    val pm = m.queryExecution.explainString(ExplainMode.fromString("simple"))
    // candidates come from the fp_key equi-join; the per-probe best bucket
    // is a bounded struct-max aggregate, never a ranking window — the only
    // Window nodes are the two fingerprint inputs' lead passes
    assert(!pm.contains("CartesianProduct") && !pm.contains("BroadcastNestedLoopJoin"), pm)
    assert("Window".r.findAllIn(pm).length == 2 && !pm.contains("row_number"),
      s"match argmax must be an aggregate, not a ranking window:\n$pm")
    // no-stats decode pipelines: Spark's guess would broadcast the
    // corpus-sized fingerprint table — the hint must keep it shuffled
    assert(!pm.contains("BroadcastHashJoin"),
      s"match must not broadcast the corpus fingerprints:\n$pm")
  }

  test("margin mining runs on LSH-blocked candidates — no cartesian pair space") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    // the gate itself (not a harness copy): candidates must come from the
    // (tbl, bkt) equi-join; a cross join here is the 100 TB landmine the
    // exhaustive truth builder cosCandidates is quarantined to
    val p = plan(SparkEntry.queries("q_margin_mine")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q_margin_mine must plan zero cartesian/nested-loop joins:\n$p")
    // the exhaustive builder is still the documented truth side — pin that
    // it remains cross-join-shaped so nobody 'optimizes' the oracle
    val e = new graft.sources.TestDataSource(spark, dir).table("embeddings")
    val truth = plan(graft.pipeline.Similarity.cosCandidates(
      e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding"))
    assert(truth.contains("CartesianProduct") || truth.contains("BroadcastNestedLoopJoin"), truth)
  }
}
