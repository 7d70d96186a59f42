package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band) join: match each fact's value to every dimension band
  * `[lo, hi)` containing it — IP→geo lookup, price tiers, sensor
  * calibration ranges. Spark's built-in answer to a non-equi predicate is
  * a BroadcastNestedLoopJoin (every fact row tested against EVERY band —
  * fine at 10 bands, fatal at 10M).
  *
  * Scalable spelling: chop each band into the fixed-width buckets it
  * covers (`explode(sequence(lo/w, (hi-1)/w))`), bucket each fact value
  * once, EQUI-join on the bucket, and re-check the exact range — the
  * non-equi predicate becomes a hash join plus a residual filter. Cost is
  * ceil(span/w) rows per band on the dimension side; pick `bucketWidth`
  * near the typical band width so that factor stays small. Overlapping
  * bands yield one output row per match (a fact in no band is dropped —
  * inner semantics).
  *
  * Skew note: a bucket hotter than the rest (many bands overlapping one
  * value range) concentrates its hash partition; at 100 TB feed such bands
  * through AQE skew-join or split them before the join. When the exploded
  * band side is small Spark broadcasts it and the fact side never
  * shuffles at all.
  */
object RangeJoin {

  def bandJoin(facts: DataFrame, value: Column, bands: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(bands.columns.contains(loCol) && bands.columns.contains(hiCol),
      s"bands must carry $loCol and $hiCol")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val w = lit(bucketWidth)
    val b = bands
      .filter(col(hiCol) > col(loCol)) // empty bands match nothing
      .withColumn("__bucket",
        explode(sequence(idiv(col(loCol).cast("long"), w),
          idiv(col(hiCol).cast("long") - 1, w))))
    facts
      .withColumn("__v", value.cast("long"))
      .withColumn("__bucket", idiv(col("__v"), w))
      .join(b, Seq("__bucket"))
      .filter(col("__v") >= col(loCol) && col("__v") < col(hiCol))
      .drop("__bucket", "__v")
  }

  /** Interval-OVERLAP join: every left interval `[lLo, lHi)` paired with
    * every right interval `[rLo, rHi)` it overlaps (`lLo < rHi && rLo <
    * lHi`, half-open) — "which sessions overlapped which campaign
    * windows", the interval×interval sibling of [[bandJoin]]'s
    * point×interval.
    *
    * Same bucketization: both sides explode to the fixed-width buckets
    * they cover and equi-join on the bucket. An overlapping pair
    * co-occurs in every bucket their spans share; instead of a distinct
    * pass over the pair space, each pair is CLAIMED exactly once, in the
    * bucket containing the overlap's start `max(lLo, rLo)` (that bucket
    * is always common to both spans), so the join stays append-only —
    * dedup is a filter, not a shuffle. Cost is ceil(span/w) rows per
    * interval per side; pick `bucketWidth` near the typical span. Both
    * inputs must have disjoint column names; empty intervals match
    * nothing (inner semantics). */
  def intervalJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      s"interval join sides must have disjoint columns, both carry " +
        left.columns.toSet.intersect(right.columns.toSet).mkString(", "))
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val w = lit(bucketWidth)
    def exploded(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) > col(lo))
      .withColumn("__bucket",
        explode(sequence(idiv(col(lo).cast("long"), w),
          idiv(col(hi).cast("long") - 1, w))))
    exploded(left, lLo, lHi)
      .join(exploded(right, rLo, rHi).withColumnRenamed("__bucket", "__rb"),
        col("__bucket") === col("__rb"))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__bucket") === idiv(greatest(col(lLo), col(rLo)).cast("long"), w))
      .drop("__bucket", "__rb")
  }
}
