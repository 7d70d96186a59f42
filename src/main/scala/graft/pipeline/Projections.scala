package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry for the spillable tokenized/quantized PROJECTIONS the near-dup
  * family persists (`MEMORY_AND_DISK`) so that one corpus scan feeds a
  * candidate leg plus its confirm legs (`Dedup.minhashNearDups` and kin,
  * `Similarity.cosineNearDups`, `Similarity.lshCosCandidates`).
  *
  * THE CACHING CONTRACT (ADVICE r14): these persists are intentionally NOT
  * unpersisted inside the operator — the returned DataFrame is lazy, and
  * its plan consumes the projection two-to-three times, so an eager
  * unpersist would re-run the dominant shingling/quantize cost per leg.
  * Spark's SQL cache is NOT garbage-collected: `CacheManager` holds every
  * persisted plan strongly until an explicit unpersist, so a long-lived
  * session invoking these operators repeatedly accumulates cached+spilled
  * blocks with no automatic reclamation. This registry is therefore the
  * OWNER of those projections: it holds strong references, and
  * [[Projections.release]] is the explicit boundary such callers invoke
  * after consuming a result. Releasing early is always SAFE (an evicted
  * projection recomputes; it never changes results) — it only costs
  * recompute if the same result is re-consumed afterwards. Short-lived
  * sessions (one job, then stop) can ignore the registry entirely; the
  * blocks die with the session.
  */
object Projections {
  // strong references ON PURPOSE: CacheManager already pins the cached
  // plan + blocks until unpersist, so a weak registry would lose its only
  // handle at the first GC while the blocks live on (r15 review finding);
  // the wrapper Dataset this queue retains is negligible next to them.
  private val refs = new ConcurrentLinkedQueue[DataFrame]()

  /** Persisted-projection registration — operators call this on each
    * projection right after `.persist(...)`. */
  private[graft] def register(df: DataFrame): DataFrame = {
    refs.add(df)
    df
  }

  /** Pre-tokenize spreader for the persisted projections: when the input
    * plan's estimated bytes put its scan UNDER one file split per
    * configured shuffle partition, the whole tokenize/quantize pipeline —
    * and every map side downstream of the persist — inherits the scan's
    * handful of partitions (a 50 MB single-row-group parquet is ONE task;
    * the r17 stage profiles showed 1.1 s single-task shingling stages
    * repeated per leg while 31 cores idled). Repartitioning the RAW rows
    * by id BEFORE the projection spreads both the tokenize and the cached
    * blocks. At real scale the size estimate exceeds the threshold and
    * this is the IDENTITY: the scan's own splits already saturate the
    * cluster, and a corpus-wide exchange of raw text would be pure cost.
    * Plans with no usable size estimate (stats default to huge) are left
    * untouched for the same reason. */
  private[graft] def spread(df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    // a streaming frame has no batch optimizedPlan to size (accessing it
    // throws), and its per-trigger partitioning is the micro-batch
    // planner's job — identity there
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val width = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(width) * maxPart) df.repartition(width, key) else df
  }

  /** Size-derived variant of [[spread]] for GATE INPUT tables (the query
    * definitions' docs/events/embeddings helpers): one partition per
    * `spark.graft.spread.partitionBytes` (default 256 KB) of estimated
    * input, floored at `spark.graft.spread.minPartitions` (default 8),
    * capped at the session width; identity at real scale exactly like
    * [[spread]].
    *
    * Why two widths (r19, measured): a full-width exchange of a sub-MB
    * table costs ~0.2 s of per-task overhead per downstream stage — a net
    * LOSS for the many cheap map pipelines a shared input helper feeds —
    * while the dedicated heavy-projection operators (regex shingling +
    * minhash, prefix-filter df aggregates, media synth+decode, SRP
    * quantize) measurably want the full width their r17 tuning chose
    * (bench A/B: q_dedup_prefix_join 3.75 → 5.45 s and the graph pair
    * builds +1 s each when the internal sites were narrowed to 8, while
    * q_churn_hazard +0.85 s when the events helper was widened to the
    * session width). When both fire, CollapseRepartition keeps the
    * operator's own (outer, full-width) repartition — the helper's sized
    * exchange disappears from the plan. */
  private[graft] def spreadInput(df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val width = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est >= BigInt(width) * maxPart) return df // real scale: identity
    val perPart = spark.conf.get("spark.graft.spread.partitionBytes",
      (256L << 10).toString).toLong
    val minParts = spark.conf.get("spark.graft.spread.minPartitions", "8").toInt
    val w = math.max(minParts.toLong,
      math.min(width.toLong, (est / BigInt(math.max(1L, perPart))).toLong + 1L)).toInt
    df.repartition(w, key)
  }

  /** Unpersist (non-blocking) every registered projection and clear the
    * registry; returns how many were released. The explicit boundary for
    * long-lived sessions — see the caching contract above. */
  def release(): Int = {
    var n = 0
    var df = refs.poll()
    while (df != null) {
      df.unpersist(false)
      n += 1
      df = refs.poll()
    }
    n
  }
}
