package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and domain-weighted data mixing — the step
  * that turns curated corpora into a training mixture (each source gets a
  * weight: <1 downsamples, >1 repeats documents across epochs, à la the
  * published LLM data recipes).
  *
  * Sampling decisions are pure per-row hash arithmetic on the document id
  * ([[Hashing.md5Long]] with a salt), so they are: reproducible across runs
  * and engines (oracle-checkable, unlike `DataFrame.sample`'s RNG),
  * cluster-order-independent (no seed-per-partition coupling), and stable
  * under repartitioning — exactly what a 100 TB mixing job needs. No
  * shuffles anywhere: filter + generator, fused into the scan.
  */
object DataMix {

  private val M = 1000000L

  /** Uniform hash in [0, 1e6) from the salted id — the per-row coin.
    * `concat` (not `concat_ws`) so a NULL id yields a NULL coin: concat_ws
    * SKIPS nulls, which would hash every null id to the constant salt —
    * silently diverging from the `'salt:' || id` oracle spelling, where
    * `||` propagates NULL. Identical output for non-null ids. */
  private[pipeline] def coin(idCol: Column, salt: String): Column =
    pmod(Hashing.md5Long(concat(lit(s"$salt:"), idCol.cast("string"))), lit(M))

  /** Keep a deterministic `rate` fraction of rows (by salted id hash). */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double,
      salt: String = "mix"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(coin(col(idCol), salt) < (rate * M).toLong)
  }

  /** Deterministic train/validation/test SPLIT assignment: each row's salted
    * id hash falls into one of the cumulative `[0,1e6)` ranges the split
    * fractions define, appending a `split` label column. Pure per-row
    * arithmetic — disjoint and exhaustive by construction, stable across
    * runs/engines/partitionings, and adding rows never moves an existing row
    * between splits (the property that keeps a held-out set honest as the
    * corpus grows). Fractions must sum to 1 within 1e-9 and be exact
    * millionths (so the integer range edges represent them exactly).
    * Null ids hash to null and fall through every range test into the LAST
    * split — deterministic, but filter null ids upstream if that matters. */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0), "fractions must be >= 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    // per-fraction, not just the sum: 1/3 + 2/3 round-trips to 1e6 but the
    // individual boundaries would silently shift by a half-millionth
    require(splits.forall { case (_, f) => math.abs(f * M - (f * M).round) < 1e-3 },
      "fractions must be exact millionths")
    val edges = splits.scanLeft(0L) { case (acc, (_, f)) => acc + (f * M).round }
    require(edges.last == M, "fractions must be exact millionths")
    val c = coin(col(idCol), salt)
    val label = splits.zip(edges.tail.dropRight(1)).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), acc) => when(c < hi, name).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** At most `n` survivors per group (every row when the group is smaller),
    * chosen by salted-id hash order — a deterministic stratified subsample
    * ("N docs per domain"), reproducible across runs, engines, and
    * partitionings. Ranking runs through the bounded
    * [[graft.functions.TopKByDot]] aggregate: map-side state ≤ n per
    * (group, partition) and an exchange of ≤ partitions×n rows per group —
    * never a per-group window rank, which would funnel every row of a hot
    * group through a single reducer at 100 TB.
    *
    * Output: (groupCol, idCol, rk) where rk is the 0-based rank in
    * (hash ASC, id ASC) order — stable under corpus growth: adding rows can
    * displace survivors but never reorders two that remain. */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int,
      salt: String = "mix"): DataFrame = {
    require(n > 0, s"n must be > 0, got $n")
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    val idType = df.schema(idCol).dataType
    // the bounded aggregate carries ids as longs; a non-integral id would
    // cast to null, be skipped, and SILENTLY return an empty sample.
    // Compare against the concrete type singletons — simpleString spellings
    // ("tinyint"/"smallint") are easy to get wrong
    require(Seq(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
      .contains(idType),
      s"samplePerGroup needs an integral id column, got $idCol: ${idType.simpleString}")
    // TopKByDot keeps the k LARGEST dots; negate the hash to sample the
    // smallest-hash rows (ties break to the smaller id inside the aggregate).
    // Null-propagating concat like [[coin]] (null ids are skipped by the
    // aggregate regardless)
    val rank = -Hashing.md5Long(concat(lit(s"$salt:"), col(idCol).cast("string")))
    val tk = columnOf(graft.functions.TopKByDot(
      expressionOf(rank), expressionOf(col(idCol).cast("long")),
      expressionOf(lit(0.0).cast("double")), n).toAggregateExpression())
    df.groupBy(col(groupCol)).agg(tk.as("tk"))
      .select(col(groupCol), posexplode(col("tk")).as(Seq("rk", "e")))
      .select(col(groupCol), col("e.id").cast(idType).as(idCol),
        col("rk").cast("long").as("rk"))
  }

  /** Weighted sample of (at most) `n` rows per group, inclusion probability
    * increasing with `weightCol` — PRIORITY SAMPLING (Duffield, Lund &
    * Thorup, JACM 2007): each row draws a uniform hash u and is ranked by
    * u/w (equivalently priority w/u descending); the n smallest ranks per
    * group are the sample. Deterministic: u is the salted-id md5 hash, the
    * rank is the INTEGER quotient u div w (documented floor semantics —
    * u spans 60 bits, so the quotient resolves weights to ~2^60/w
    * distinct levels), ties break to the smaller id. Rows with
    * non-positive or null weights are excluded (they can never be
    * sampled; documented rather than silently hashed).
    *
    * Same 100 TB shape as [[samplePerGroup]]: the bounded TopKByDot
    * aggregate (map-side state ≤ n per (group, partition)), never a
    * per-group window rank.
    *
    * Output: (groupCol, idCol, rk, weight) — rk is the 0-based rank in
    * (u div w ASC, id ASC) order. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, n: Int, salt: String = "wmix"): DataFrame = {
    require(n > 0, s"n must be > 0, got $n")
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
      .contains(idType),
      s"weightedSamplePerGroup needs an integral id column, got $idCol: ${idType.simpleString}")
    val w = col(weightCol).cast("long")
    val u = Hashing.md5Long(concat(lit(s"$salt:"), col(idCol).cast("string")))
    // TopKByDot keeps the n LARGEST dots; negate the rank to keep the n
    // SMALLEST u div w (ties → smaller id inside the aggregate)
    val rank = -call_function("div", u, w)
    val tk = columnOf(graft.functions.TopKByDot(
      expressionOf(rank), expressionOf(col(idCol).cast("long")),
      expressionOf(w.cast("double")), n).toAggregateExpression())
    df.filter(w > 0)
      .groupBy(col(groupCol)).agg(tk.as("tk"))
      .select(col(groupCol), posexplode(col("tk")).as(Seq("rk", "e")))
      .select(col(groupCol), col("e.id").cast(idType).as(idCol),
        col("rk").cast("long").as("rk"),
        col("e.payload").cast("long").as("weight"))
  }

  /** TOKEN-BUDGET mixture — "take exactly `budget` tokens per domain", the
    * shape published LLM data recipes are specified in (token shares, not
    * document counts): documents are ordered by their salted-hash coin
    * (deterministic, unbiased) and taken while the domain's running token
    * total stays under its budget; the document CROSSING the boundary is
    * excluded (`cum_before < budget` keeps totals ≤ budget + one document).
    * Domains absent from `budgets` are dropped.
    *
    * A naive per-domain running sum is a Window over the domain key — a
    * handful of reducers swallowing the corpus. This is TWO-PHASE instead:
    * each document's coin maps to one of `buckets` sub-ranges; per-bucket
    * token totals (a domains×buckets aggregate — small) are collected,
    * turned into per-bucket STARTING OFFSETS on the driver, and joined back
    * broadcast; the remaining within-bucket prefix sum is a Window over
    * `(domain, bucket)` — domains×buckets partitions, each ~1/buckets of a
    * domain. The same offsets-then-local-rank decomposition as
    * `exportShards`, for prefix sums instead of positions — and the same
    * two-scan trade (see [[exportShards]]): persist the input first when
    * the upstream plan is expensive or nondeterministic.
    *
    * Output: the selected rows as `(idCol, domainCol, n_tok, cum_before)`. */
  def takeTokenBudget(df: DataFrame, idCol: String, textCol: String, domainCol: String,
      budgets: Map[String, Long], buckets: Int = 1000,
      salt: String = "budget"): DataFrame = {
    require(buckets > 0 && 1000000L % buckets == 0,
      s"buckets must divide 1e6, got $buckets")
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    // NULL ids dropped like [[exportShards]]: their coin is NULL (by design,
    // see [[coin]]), which would NPE the phase-1 collect and make the order
    // engine-dependent
    val inScope = df.filter(col(domainCol).isin(budgets.keys.toSeq: _*))
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), col(domainCol).as("dom"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"),
        coin(col(idCol), salt).as("h"))
      .withColumn("bkt", (col("h") / lit(1000000L / buckets)).cast("int"))
    // phase 1: per-(domain, bucket) token totals — an aggregate of at most
    // domains×buckets rows; collecting THAT (not data) mirrors
    // Search.searchTopK's literal-weight inlining
    val totals = inScope.groupBy("dom", "bkt").agg(sum("n_tok").as("t"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val offsets = totals.keys.groupBy(_._1).flatMap { case (dom, keys) =>
      val sorted = keys.map(_._2).toSeq.sorted
      val offs = sorted.scanLeft(0L)((acc, b) => acc + totals((dom, b)))
      sorted.zip(offs).map { case (b, off) => (dom, b, off) }
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toDF("dom", "bkt", "off"))
    // phase 2: within-bucket EXCLUSIVE prefix sum — fine-grained partitions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dom", "bkt").orderBy(col("h"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val budgetCol = budgets.foldLeft(lit(0L)) { case (acc, (d, b)) =>
      when(col("dom") === d, lit(b)).otherwise(acc)
    }
    inScope.join(offDf, Seq("dom", "bkt"))
      .withColumn("cum_before", col("off") + coalesce(sum("n_tok").over(w), lit(0L)))
      .filter(col("cum_before") < budgetCol)
      .select(col("id").as(idCol), col("dom").as(domainCol),
        col("n_tok"), col("cum_before"))
  }

  /** Deterministic EXPORT SHARDING — the last step before writing training
    * shards: every row gets `(shard, seq)` where `shard` is its salted-hash
    * bucket (a deterministic global shuffle: hash order is unrelated to
    * ingest order, so each shard is an unbiased corpus sample) and `seq` is
    * its 0-based position within the shard in `(hash, id)` order.
    *
    * Neither a Window over `shard` (nShards reducers swallowing the
    * corpus) nor `repartition(nShards)` (nShards TASKS doing the same) is
    * acceptable at scale. The decomposition is the same offsets-then-local
    * two-phase as [[takeTokenBudget]]: the coin space splits into `buckets`
    * ORDER-ALIGNED sub-ranges (every row of bucket b sorts before every
    * row of bucket b+1 within its shard), per-(shard, bucket) COUNTS — an
    * aggregate of ≤ nShards×buckets rows — are collected and prefix-summed
    * into starting offsets, and `seq` = offset + a streaming counter after
    * a `(shard, bucket)`-keyed repartition: shards×buckets-way parallel,
    * O(1) task memory, any shard size.
    *
    * The two phases each scan the input (counts job, then the main plan) —
    * the same trade as [[takeTokenBudget]] and `Search.searchTopK`: what
    * is collected is aggregate rows, never data. Callers exporting an
    * expensive upstream plan should persist/checkpoint it first (also a
    * correctness requirement if the input is nondeterministic — both
    * passes must see identical rows).
    *
    * Rows with a NULL id are dropped (an export row needs an identity; SQL
    * null-ordering differences would otherwise make `seq`
    * engine-dependent). */
  def exportShards(df: DataFrame, idCol: String, nShards: Int,
      buckets: Int = 1000, salt: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be > 0, got $nShards")
    require(buckets > 0 && 1000000L % buckets == 0,
      s"buckets must divide 1e6, got $buckets")
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
      .contains(idType),
      s"exportShards needs an integral id column, got $idCol: ${idType.simpleString}")
    val keyed = df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        coin(col(idCol), salt).as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("bkt", (col("h") / lit(1000000L / buckets)).cast("int"))
    // phase 1: per-(shard, bucket) row counts → per-bucket starting offsets
    val counts = keyed.groupBy("shard", "bkt").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val offsets = counts.keys.groupBy(_._1).flatMap { case (sh, keys) =>
      val sorted = keys.map(_._2).toSeq.sorted
      val offs = sorted.scanLeft(0L)((acc, b) => acc + counts((sh, b)))
      sorted.zip(offs).map { case (b, off) => (sh, b, off) }
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.{Encoders, Row}
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType)))
    // phase 2: local position within the (shard, bucket) group + offset
    keyed.join(broadcast(offsets.toDF("shard", "bkt", "off")), Seq("shard", "bkt"))
      .repartition(col("shard"), col("bkt"))
      .sortWithinPartitions(col("shard"), col("bkt"), col("h"), col("id"))
      .select(col("id"), col("shard"), col("bkt"), col("off"))
      .mapPartitions { it =>
        // groups sharing a partition arrive contiguously (sorted); the
        // counter resets on each (shard, bucket) boundary
        var curSh = Int.MinValue; var curBk = Int.MinValue; var pos = -1L
        it.map { r =>
          val sh = r.getInt(1); val bk = r.getInt(2)
          if (sh != curSh || bk != curBk) { curSh = sh; curBk = bk; pos = 0L }
          else pos += 1
          Row(r.getLong(0), sh, r.getLong(3) + pos)
        }
      }(Encoders.row(schema))
  }

  /** Weighted mixture: each row is emitted `floor(w)` times plus one more
    * with probability `frac(w)`, where `w` is its domain's weight
    * (`defaultWeight` when absent). Output appends `copy_idx` (0-based) so
    * repeated epochs stay distinguishable downstream. Weights of 0 drop the
    * domain; fractional weights are the deterministic sample above. */
  def mixByDomain(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Double], defaultWeight: Double = 0.0,
      salt: String = "mix"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0), "weights must be >= 0")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (dom, wt)) =>
      when(col(domainCol) === dom, lit(wt)).otherwise(acc)
    }
    val whole = floor(w).cast("long")
    val extra = when(coin(col(idCol), salt) < (pmod(w * M, lit(M.toDouble))).cast("long"), 1L)
      .otherwise(0L)
    df.withColumn("__n", whole + extra)
      .filter(col("__n") > 0)
      .withColumn("copy_idx", explode(expr("sequence(0L, __n - 1)")))
      .drop("__n")
  }
}
