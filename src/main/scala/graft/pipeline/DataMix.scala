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

  /** Uniform hash in [0, 1e6) from the salted id — the per-row coin. */
  private def coin(idCol: Column, salt: String): Column =
    pmod(Hashing.md5Long(concat_ws(":", lit(salt), idCol.cast("string"))), lit(M))

  /** Keep a deterministic `rate` fraction of rows (by salted id hash). */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double,
      salt: String = "mix"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(coin(col(idCol), salt) < (rate * M).toLong)
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
