package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular feature engineering for model training — the encodings a
  * training-data pipeline applies after curation: leakage-safe target
  * statistics and the hashing trick. Everything is exact integer
  * arithmetic after milli quantization (the engine-wide oracle
  * discipline).
  */
object Features {

  /** Leave-one-out TARGET ENCODING: each row's category is replaced by
    * the mean target of the OTHER rows of its category —
    * `(Σ_cat − own) div (n_cat − 1)` in milli units — the leakage-safe
    * variant (plain category means leak each row's own label into its
    * feature; LOO is the standard fix, e.g. CatBoost's ordered-statistics
    * family). Singleton categories carry no other evidence and encode
    * NULL (the caller decides the fallback — global mean, prior, drop).
    *
    * Scale shape: one category-grain aggregation (map-side combined),
    * broadcast back over the rows — category cardinality is feature
    * vocabulary, not data. Output: idCol, catCol, value_milli, loo_milli.
    */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
      targetCol: String): DataFrame = {
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val base = df.select(col(idCol), col(catCol),
      expr(s"cast(round($targetCol * 1000) as bigint)").as("value_milli"))
    val sums = base.groupBy(col(catCol))
      .agg(sum(col("value_milli")).as("_s"), count(lit(1)).as("_n"))
    base.join(broadcast(sums), Seq(catCol))
      .select(col(idCol), col(catCol), col("value_milli"),
        when(col("_n") > 1,
          idiv(col("_s") - col("value_milli"), col("_n") - 1)).as("loo_milli"))
  }

  /** Exact-QUANTILE feature binning (the QuantileDiscretizer shape, made
    * exact): thresholds are the `i/nBins` percentiles of the
    * milli-quantized column — ONE map-side-combined aggregate whose
    * result is nBins−1 values (bounded collect) — and each row's bin is
    * `|{i : value ≥ t_i}|`, a single codegen'd sum of comparisons against
    * literal thresholds: no join, no second shuffle, no sampling
    * (`approxQuantile`'s trade). Skewed data can collapse adjacent
    * thresholds; duplicate thresholds then skip bin indices, which is the
    * faithful report (an empty quantile bin IS the skew signal).
    *
    * Output: idCol, value_milli, bin (0-based). */
  def quantileBins(df: DataFrame, idCol: String, valueCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val base = df.select(col(idCol),
      expr(s"cast(round($valueCol * 1000) as bigint)").as("value_milli"))
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val th = base
      .agg(percentile(col("value_milli"), typedLit(ps)).as("t"))
      .head().getSeq[Double](0)
    val bin = th.map(t => when(col("value_milli") >= lit(t), 1L).otherwise(0L))
      .reduce(_ + _)
    base.withColumn("bin", bin)
  }

  /** HASHING-TRICK featurization: bucket an arbitrary (possibly unbounded)
    * categorical feature expression into `nBuckets` hashed slots and count
    * per (entity, bucket) — the fixed-width sparse featurizer (Weinberger
    * et al. 2009) that needs NO vocabulary pass, no dictionary broadcast,
    * and no schema change when new feature values appear. Hash is the
    * engine-portable md5-long, so feature rows are reproducible across
    * engines and runs.
    *
    * One partial+final aggregation on (entity, bucket); collisions are the
    * documented trade (bound them by nBuckets, don't chase them). Output:
    * keyCol, bucket, n. */
  def hashedFeatures(df: DataFrame, keyCol: String, feature: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    df.select(col(keyCol), pmod(Hashing.md5Long(feature), lit(nBuckets.toLong)).as("bucket"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
