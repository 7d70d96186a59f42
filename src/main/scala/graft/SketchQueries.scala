package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Sketches}
import graft.pipeline.Hashing.duckMd5Long
import graft.sources.TestDataSource

/** Sketch-family gates ([[pipeline.Sketches]]): KMV distinct / overlap,
  * Count-Min frequency, bloom-probe pruning — each estimator deterministic
  * (md5-based) so the DuckDB oracle reproduces the ESTIMATES bit-for-bit,
  * not just the exact quantities they approximate. */
object SketchQueries {

  // spread (size-gated, identity at real scale) — see PipelineQueries.docs
  private def docs(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Projections.spreadInput(
      new TestDataSource(spark, dir).table("documents"),
      org.apache.spark.sql.functions.col("doc_id"))

  private val duckShingles3 =
    "list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_distinct" -> ((s, d) => {
      // approximate COUNT UNIQUE context_id BY event_type: the k=32 KMV
      // sketch estimates each type's distinct-user count from a bounded
      // 32-long state — one partial-agg exchange, never an expand
      val ev = new TestDataSource(s, d).table("events")
      Sketches.kmvDistinct(ev, "event_type", col("user_id").cast("string"), 32)
    }),

    "q_sketch_overlap" -> ((s, d) => {
      // corpus-overlap estimation: Jaccard between the even-doc and
      // odd-doc shingle sets from two bottom-256 sketches built in ONE
      // scan/aggregation (true J ≈ 0.25 on this corpus) — the "how much
      // of snapshot B is already in A" question without a corpus×corpus
      // join
      val g = docs(s, d).select((col("doc_id") % 2).as("side"),
        explode(Dedup.shingles(col("text"), 3)).as("sh"))
      Sketches.kmvOverlap(g, col("side") === 0, col("side") === 1, col("sh"), 256)
    }),

    "q_sketch_cms" -> ((s, d) => {
      // Count-Min document-frequency estimates for the shingles of docs
      // 0-1 against a 4×512 counter table built over the whole corpus —
      // deliberately undersized so bucket collisions (overcount > 0) are
      // witnessed; estimates are exact-reproducible, never below truth
      val t = docs(s, d).select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("sh"))
      val counters = Sketches.cmsCounters(t, col("sh"), depth = 4, width = 512)
      val cand = t.filter(col("doc_id") < 2).select("sh").distinct()
      val est = Sketches.cmsEstimate(counters, cand, col("sh"), depth = 4, width = 512)
        .withColumnRenamed("_v", "shingle")
      val exact = t.join(broadcast(cand), Seq("sh"), "left_semi")
        .groupBy("sh").agg(count(lit(1)).as("exact_count"))
      est.join(exact, est("shingle") === exact("sh"))
        .select(col("shingle"), col("cms_est"), col("exact_count"),
          (col("cms_est") - col("exact_count")).as("overcount"))
    }),

    "q_sketch_rollup" -> ((s, d) => {
      // the sketch ROLLUP property in production shape: per-(type, day)
      // sketches built once, weekly distinct-user estimates derived by
      // MERGING the ≤7 daily sketches — bit-identical to sketching the
      // week directly (the oracle computes the direct form), because
      // bottom-k(union of bottom-ks) = bottom-k(union)
      val ev = new TestDataSource(s, d).allEvents
      val idiv = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        call_function("div", a, b)
      val day = idiv(col("timestamp").cast("long"), lit(86400L))
      val daily = ev.groupBy(col("event_type"), day.as("day"))
        .agg(Sketches.bottomK(
          graft.pipeline.Hashing.md5Long(col("context_id")), 32).as("sk"))
      daily.groupBy(col("event_type"), idiv(col("day"), lit(7L)).as("wk"))
        .agg(collect_list(col("sk")).as("sks"))
        .select(col("event_type"), (col("wk") * 7L * 86400L).as("week_start"),
          Sketches.kmvMergeEstimate(col("sks"), 32).as("est_distinct"))
    }),

    "q_sketch_hist" -> ((s, d) => {
      // histogram p50/p90/p99 of milli-quantized event values per type:
      // 64 equi-width bins over [0, 512000) — bounded mergeable counters
      // vs the exact sibling q_value_percentiles' full value sets
      val ev = new TestDataSource(s, d).table("events")
      Sketches.histogramQuantiles(ev, "event_type",
        round(col("value") * 1000).cast("long"),
        lo = 0L, hi = 512000L, bins = 64, qs = Seq(50, 90, 99))
    }),

    "q_sketch_bloom" -> ((s, d) => {
      // bloom-probe pruning: lineitem filtered by a 512-bit bloom of the
      // flagged partkeys (p_partkey % 97 = 0) — the mask is deliberately
      // undersized so deterministic false positives are witnessed; the
      // probe-side test is a literal-bitmask projection, no join/shuffle
      val src = new TestDataSource(s, d)
      val build = src.table("part").select(col("p_partkey").cast("long").as("key"))
        .filter(col("key") % 97 === 0)
      Sketches.bloomProbeStats(build, col("key"), src.table("lineitem"), col("l_partkey"),
        mBits = 512, nHashes = 3)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_sketch_distinct" ->
      s"""WITH h AS (SELECT event_type, ${duckMd5Long("CAST(user_id AS VARCHAR)")} AS hv FROM events),
         |sk AS (SELECT event_type, (list_sort(list(DISTINCT hv)))[1:32] AS sk FROM h GROUP BY event_type)
         |SELECT event_type, CAST(len(sk) AS BIGINT) AS sketch_size,
         |  CAST(CASE WHEN len(sk) = 0 THEN 0 ELSE sk[least(len(sk), 32)] END AS BIGINT) AS kth_hash,
         |  ${Sketches.duckKmvEstimate("sk", 32)} AS est_distinct
         |FROM sk""".stripMargin,

    "q_sketch_overlap" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |g AS (SELECT doc_id % 2 AS side, unnest($duckShingles3) AS sh FROM t),
         |h AS (SELECT side, ${duckMd5Long("sh")} AS hv FROM g),
         |ska AS (SELECT (list_sort(list(DISTINCT hv)))[1:256] AS sk FROM h WHERE side = 0),
         |skb AS (SELECT (list_sort(list(DISTINCT hv)))[1:256] AS sk FROM h WHERE side = 1),
         |m AS (SELECT ska.sk AS sa, skb.sk AS sb,
         |  (list_sort(list_distinct(ska.sk || skb.sk)))[1:256] AS mk FROM ska, skb),
         |x AS (SELECT sa, sb, mk,
         |  CAST(len(list_filter(mk, v -> list_contains(sa, v) AND list_contains(sb, v))) AS BIGINT) AS matches,
         |  ${Sketches.duckKmvEstimate("mk", 256)} AS union_est,
         |  greatest(CAST(len(mk) AS BIGINT), 1) AS kp FROM m)
         |SELECT CAST(len(sa) AS BIGINT) AS sketch_a, CAST(len(sb) AS BIGINT) AS sketch_b,
         |  matches, union_est,
         |  CAST((matches * 1000000) // kp AS BIGINT) AS jaccard_ppm,
         |  CAST((matches * union_est) // kp AS BIGINT) AS inter_est
         |FROM x""".stripMargin,

    "q_sketch_cms" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |o AS (SELECT doc_id, unnest($duckShingles3) AS sh FROM t),
         |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
         |b AS (SELECT j, ${duckMd5Long("('cms' || CAST(j AS VARCHAR) || '|' || sh)")} % 512 AS bucket FROM o CROSS JOIN js),
         |counters AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT sh FROM o WHERE doc_id < 2),
         |cp AS (SELECT sh, j, ${duckMd5Long("('cms' || CAST(j AS VARCHAR) || '|' || sh)")} % 512 AS bucket FROM cand CROSS JOIN js),
         |est AS (SELECT sh, min(c) AS cms_est FROM cp JOIN counters USING (j, bucket) GROUP BY sh),
         |ex AS (SELECT sh, CAST(count(*) AS BIGINT) AS exact_count FROM o
         |  WHERE sh IN (SELECT sh FROM cand) GROUP BY sh)
         |SELECT est.sh AS shingle, cms_est, exact_count, cms_est - exact_count AS overcount
         |FROM est JOIN ex ON est.sh = ex.sh""".stripMargin,

    // the DIRECT weekly sketch — the rollup from daily sketches must be
    // bit-identical to it
    "q_sketch_rollup" ->
      s"""WITH h AS (SELECT event_type,
         |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 // 7 AS wk,
         |    ${duckMd5Long("CAST(user_id AS VARCHAR)")} AS hv FROM events),
         |sk AS (SELECT event_type, wk, (list_sort(list(DISTINCT hv)))[1:32] AS sk
         |  FROM h GROUP BY 1, 2)
         |SELECT event_type, CAST(wk * 7 * 86400 AS BIGINT) AS week_start,
         |  ${Sketches.duckKmvEstimate("sk", 32)} AS est_distinct
         |FROM sk""".stripMargin,

    "q_sketch_hist" -> {
      def pq(q: Int) =
        s"(0 + (min(CASE WHEN cum >= (n * $q + 99) // 100 THEN bin END) + 1) * 512000 // 64)"
      s"""WITH v AS (SELECT event_type,
         |  least(63, greatest(0, (CAST(round(value * 1000) AS BIGINT) * 64) // 512000)) AS bin
         |  FROM events),
         |c AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
         |cum AS (SELECT event_type, bin,
         |  sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         |  sum(cnt) OVER (PARTITION BY event_type) AS n FROM c)
         |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         |  CAST(${pq(50)} AS BIGINT) AS p50_est,
         |  CAST(${pq(90)} AS BIGINT) AS p90_est,
         |  CAST(${pq(99)} AS BIGINT) AS p99_est
         |FROM cum GROUP BY event_type""".stripMargin
    },

    "q_sketch_bloom" -> {
      def pos(j: Int, keyExpr: String) =
        s"${duckMd5Long(s"('bloom$j|' || CAST($keyExpr AS VARCHAR))")} % 512"
      s"""WITH build AS (SELECT CAST(p_partkey AS BIGINT) AS key FROM part WHERE p_partkey % 97 = 0),
         |bp AS (SELECT DISTINCT pos FROM (
         |  SELECT ${pos(0, "key")} AS pos FROM build
         |  UNION ALL SELECT ${pos(1, "key")} FROM build
         |  UNION ALL SELECT ${pos(2, "key")} FROM build)),
         |probe AS (SELECT CAST(l_partkey AS BIGINT) AS key FROM lineitem),
         |pp AS (SELECT key, ${pos(0, "key")} AS p0, ${pos(1, "key")} AS p1, ${pos(2, "key")} AS p2 FROM probe),
         |c AS (SELECT key,
         |  (p0 IN (SELECT pos FROM bp) AND p1 IN (SELECT pos FROM bp) AND p2 IN (SELECT pos FROM bp)) AS cand
         |  FROM pp)
         |SELECT CAST(count(*) AS BIGINT) AS n_probe,
         |  CAST(count(CASE WHEN cand THEN 1 END) AS BIGINT) AS n_candidates,
         |  CAST(count(CASE WHEN cand AND key IN (SELECT key FROM build) THEN 1 END) AS BIGINT) AS n_true_matches,
         |  CAST(count(CASE WHEN cand THEN 1 END) - count(CASE WHEN cand AND key IN (SELECT key FROM build) THEN 1 END) AS BIGINT) AS n_false_pos,
         |  (SELECT CAST(count(*) AS BIGINT) FROM bp) AS n_bits_set
         |FROM c""".stripMargin
    }
  )
}
