package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Clustering

/** Connected-components clustering over near-dup pairs (large-star /
  * small-star), cross-checked against a driver-side union-find. */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Distributed star rounds FORCED (localThreshold = -1): these tests pin
    * the shuffle-round algorithm, which the small-graph fast path would
    * otherwise bypass on test-sized inputs. */
  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clustering.connectedComponents(pairs.toDF("id_1", "id_2"), localThreshold = -1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find on the driver. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chains collapse transitively; disjoint components stay apart") {
    // A~B, B~C (A!~C) must be ONE cluster; {5,6} a second
    assert(cc(Seq((2L, 1L), (2L, 3L), (5L, 6L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("long chain and star topologies converge to the component min") {
    val chain = (10L until 30L).map(i => (i, i + 1)) // 21-node path
    val star = (101L to 110L).map(i => (100L, i))
    val got = cc(chain ++ star)
    assert((10L to 30L).forall(got(_) == 10L))
    assert((100L to 110L).forall(got(_) == 100L))
  }

  test("matches union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    assert(cc(pairs) == unionFind(pairs))
  }

  test("small-graph fast path: identical labels to the distributed rounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(400)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    // default threshold takes the driver union-find branch on this size
    val fast = Clustering.connectedComponents(pairs.toDF("id_1", "id_2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == cc(pairs))
    assert(fast == unionFind(pairs))
    // empty input through the fast path (0 edges ≤ threshold)
    assert(Clustering.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_1", "id_2")).isEmpty)
  }

  test("empty and self-loop-only inputs yield no clusters") {
    import spark.implicits._
    assert(cc(Nil) == Map.empty)
    assert(Clustering.connectedComponents(
      Seq((7L, 7L)).toDF("id_1", "id_2"), localThreshold = -1).isEmpty)
  }

  test("hot-node skew: a 100k-degree hub converges without a pair blowup") {
    import spark.implicits._
    // one hub (id 5) connected to 100k spokes, hub also chained to node 1 —
    // the skew shape boilerplate dedup produces; large-star handles the hot
    // neighborhood as a single wide groupBy-min, never a pair space
    val spokes = spark.range(10L, 100010L).select(lit(5L).as("id_1"), col("id").as("id_2"))
    val extra = Seq((1L, 5L)).toDF("id_1", "id_2")
    val labels = Clustering.connectedComponents(spokes.union(extra), localThreshold = -1)
    val agg = labels.agg(
      countDistinct(col("cluster_id")).as("c"),
      min(col("cluster_id")).as("mn"),
      count(lit(1)).as("n")).head()
    assert(agg.getLong(0) == 1L && agg.getLong(1) == 1L && agg.getLong(2) == 100002L)
  }

  test("reliable checkpoint dir: same labels, rounds land in scratch parquet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt_").toString
    try {
      val chain = (10L until 40L).map(i => (i, i + 1)) // multi-round topology
      val got = Clustering.connectedComponents(
        chain.toDF("id_1", "id_2"), checkpointDir = Some(dir), localThreshold = -1)
      val labels = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((10L to 40L).forall(labels(_) == 10L))
      // stale rounds were cleaned; the final round's table backs the result
      val rounds = new java.io.File(dir).list().toSeq.filter(_.startsWith("cc_round_"))
      assert(rounds.size == 1, s"expected only the final round kept, got $rounds")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("auto disk switch: big edge counts re-home scratch to parquet, same labels") {
    import spark.implicits._
    // autoDiskEdges = 0 forces the switch on any non-empty graph — the pin
    // is that the switch path exists and changes NOTHING semantically; the
    // production bound (64M) is where the r11 rehearsal's localCheckpoint
    // OOM lives. sparkContext checkpoint dir set ⇒ the auto scratch roots
    // there (shared storage on a real cluster).
    val root = java.nio.file.Files.createTempDirectory("graft_auto_ckpt_").toString
    val prevCk = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(root)
    try {
      val chain = (10L until 40L).map(i => (i, i + 1))
      val ccLabels = Clustering.connectedComponents(chain.toDF("id_1", "id_2"),
          localThreshold = -1, autoDiskEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((10L to 40L).forall(ccLabels(_) == 10L))
      // setCheckpointDir creates a UUID subdir and reports it as a file: URI
      def scratchDirs(tag: String) = {
        val ck = spark.sparkContext.getCheckpointDir.get.stripPrefix("file:")
        Option(new java.io.File(ck).list()).map(_.toSeq).getOrElse(Seq.empty)
          .filter(_.startsWith(s"graft_${tag}_scratch_"))
      }
      assert(scratchDirs("cc").nonEmpty, "cc rounds must have re-homed to parquet")
      // pageRank / labelPropagation: identical output with and without the
      // switch (reliable rounds lose the edge partitioning — correctness
      // must not depend on it)
      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
      val prAuto = Clustering.pageRank(edges, "a", "b", iters = 3, autoDiskEdges = 0L,
          localThreshold = -1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prLocal = Clustering.pageRank(edges, "a", "b", iters = 3, autoDiskEdges = -1L,
          localThreshold = -1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prAuto == prLocal && scratchDirs("pr").nonEmpty)
      val lpaAuto = Clustering.labelPropagation(edges, "a", "b", autoDiskEdges = 0L,
          localThreshold = -1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lpaLocal = Clustering.labelPropagation(edges, "a", "b", autoDiskEdges = -1L,
          localThreshold = -1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lpaAuto == lpaLocal && scratchDirs("lpa").nonEmpty)
    } finally {
      // SparkContext has no public unset; restore an explicit prior dir,
      // else leave the (tmp, per-JVM) root in place for the session
      prevCk.foreach(spark.sparkContext.setCheckpointDir)
      if (prevCk.isDefined)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("pageRank/LPA small-graph fast path equals the distributed rounds bit-for-bit") {
    import spark.implicits._
    // deterministic pseudo-random graph with hubs, ties, duplicate and
    // reversed edges, and a node id far from the dense range — every shape
    // the CSR replay must normalize exactly like the distributed rounds
    val raw = (0 until 400).map { i =>
      val a = (i * 7919L) % 53
      val b = (i * 104729L) % 57 + (if (i % 11 == 0) 1000000L else 0L)
      if (i % 3 == 0) (b, a) else (a, b)
    }.filter { case (a, b) => a != b }
    val edges = raw.toDF("a", "b")
    def toMapOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prFast = toMapOf(Clustering.pageRank(edges, "a", "b"))
    val prDist = toMapOf(Clustering.pageRank(edges, "a", "b", localThreshold = -1))
    assert(prFast == prDist, "pageRank fast path diverged from distributed rounds")
    val lpaFast = toMapOf(Clustering.labelPropagation(edges, "a", "b"))
    val lpaDist = toMapOf(Clustering.labelPropagation(edges, "a", "b", localThreshold = -1))
    assert(lpaFast == lpaDist, "LPA fast path diverged from distributed rounds")
    // single edge: both nodes tie at the fixed point (pageRank), and LPA
    // adopts the partner's label — the min-tie rule's smallest witnesses
    val one = Seq((5L, 6L)).toDF("a", "b")
    assert(toMapOf(Clustering.pageRank(one, "a", "b")) ==
      toMapOf(Clustering.pageRank(one, "a", "b", localThreshold = -1)))
    assert(toMapOf(Clustering.labelPropagation(one, "a", "b")) ==
      toMapOf(Clustering.labelPropagation(one, "a", "b", localThreshold = -1)))
  }

  test("dropNearDups keeps the min id per near-dup cluster and all singletons") {
    import spark.implicits._
    val body = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = Seq(
      (1L, body + "alpha beta gamma"),
      (2L, body + "alpha beta gamma"),     // near-dup of 1
      (3L, body + "alpha beta delta"),     // near-dup of 1 and 2
      (4L, "completely different tiny text"),
      (5L, ("numbers one two three four five six seven eight nine ten " * 4))
    ).toDF("doc_id", "text")
    val kept = Clustering.dropNearDups(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L))
    val clusters = Clustering.nearDupClusters(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(clusters == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)))
  }

  test("semanticDedup clusters planted embedding groups, min-id survivors") {
    import spark.implicits._
    // two semantic groups (tiny perturbations of a base direction) + one
    // orthogonal singleton; exact pair slice for determinism
    def vec(base: Array[Float], eps: Float, at: Int): Array[Float] = {
      val v = base.clone(); v(at) = v(at) + eps; v
    }
    val a = Array.tabulate(8)(i => if (i < 4) 1.0f else 0.0f)
    val b = Array.tabulate(8)(i => if (i >= 4) 1.0f else 0.0f)
    val rows = Seq(
      (10L, a), (11L, vec(a, 0.05f, 0)), (12L, vec(a, -0.05f, 2)), // group min 10
      (20L, b), (21L, vec(b, 0.05f, 5)),                           // group min 20
      (30L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)) // unrelated
    ).toDF("vec_id", "embedding")
    val out = Clustering.semanticDedup(rows, "vec_id", "embedding",
        threshold = 0.9, lshPrefilter = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set(
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (20L, 20L, true), (21L, 20L, false)))
  }

  test("hybridDedup chains clusters across lexical and semantic signals") {
    import spark.implicits._
    val body = "the quick brown fox jumps over the lazy dog again and again " * 3
    // 1↔2 lexical near-dups; 2↔3 share an embedding but DIFFER textually;
    // hybrid must chain {1,2,3} while pure-lexical stops at {1,2}
    val docs = Seq(
      (1L, body + "alpha beta gamma"),
      (2L, body + "alpha beta delta"),
      (3L, "totally different words about catalyst and parquet internals here")
    ).toDF("doc_id", "text")
    val e = Array.tabulate(8)(i => (i + 1).toFloat)
    val far = Array.tabulate(8)(i => if (i % 2 == 0) 5.0f else -5.0f)
    val embs = Seq((1L, far), (2L, e), (3L, e)).toDF("vec_id", "embedding")
    val out = Clustering.hybridDedup(docs, "doc_id", "text",
        embs, "vec_id", "embedding", cosineThreshold = 0.95, lshPrefilter = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)))
  }

  test("labelPropagation splits bridged triangles that CC would merge") {
    import spark.implicits._
    // two triangles joined by the single bridge 3–4: one CC component,
    // but 3 synchronous min-tie LPA rounds keep two communities
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val lpa = Clustering.labelPropagation(edges, "a", "b", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(lpa == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    val cc = Clustering.connectedComponents(edges, "a", "b")
      .select("cluster_id").distinct().count()
    assert(cc == 1L)
  }

  test("assumeCanonical: identical results on producer-contract inputs, " +
      "both branches and both execution paths") {
    import spark.implicits._
    // a seeded random CANONICAL pair list (distinct, a < b) — the exact
    // contract the near-dup builders guarantee; assumeCanonical=true skips
    // the defensive re-canonicalization exchange and must change nothing
    val rnd = new scala.util.Random(13)
    val pairs = Seq.fill(400)((rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val df = pairs.toDF("a", "b")
    for (lt <- Seq(-1, 1 << 21)) { // distributed rounds AND the fast path
      val ccDef = Clustering.connectedComponents(df, "a", "b",
        localThreshold = lt).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ccCan = Clustering.connectedComponents(df, "a", "b",
        localThreshold = lt, assumeCanonical = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ccCan == ccDef, s"cc localThreshold=$lt")
      val prDef = Clustering.pageRank(df, "a", "b", iters = 3,
        localThreshold = lt).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val prCan = Clustering.pageRank(df, "a", "b", iters = 3,
        localThreshold = lt, assumeCanonical = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(prCan == prDef, s"pageRank localThreshold=$lt")
      val lpDef = Clustering.labelPropagation(df, "a", "b", iters = 3,
        localThreshold = lt).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lpCan = Clustering.labelPropagation(df, "a", "b", iters = 3,
        localThreshold = lt, assumeCanonical = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(lpCan == lpDef, s"lpa localThreshold=$lt")
    }
    val triDef = Clustering.triangleStats(df, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val triCan = Clustering.triangleStats(df, "a", "b", assumeCanonical = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(triCan == triDef)
  }
}
