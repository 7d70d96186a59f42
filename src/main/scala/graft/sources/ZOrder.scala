package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-column data-skipping layout:
  * sorting by the bit-interleaving of two scaled keys places rows close in
  * BOTH dimensions into the same files, so Parquet row-group/file min-max
  * stats prune scans filtered on EITHER column. A single-column sort gives
  * perfect pruning on that column and none on any other; Z-order trades a
  * constant factor on each for usable pruning on both — the layout Delta
  * OPTIMIZE ZORDER BY popularized, here as a plain write-time transform.
  *
  * The interleave is the classic mask-spread bit hack expressed in pure
  * Column arithmetic (shifts + AND — whole-stage codegen'd, engine-portable
  * integer ops, reproduced literally by the DuckDB oracle). Keys are scaled
  * to [0, 2^bits) from their collected min/max — a 1-row bounded aggregate,
  * the [[graft.pipeline.Similarity.scalarQuantize]] bounds pattern.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i. */
  private def spread16(x0: Column): Column = {
    var x = x0.bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit values: a's bits at even positions,
    * b's at odd. */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Scale `c` from [lo, hi] to [0, 2^bits): integer arithmetic, hi == lo
    * collapses to 0 (constant columns cannot order anyway). */
  private def scale(c: Column, lo: Long, hi: Long, bits: Int): Column =
    if (hi <= lo) lit(0L)
    else call_function("div",
      (c.cast("long") - lit(lo)) * lit(1L << bits), lit(hi - lo + 1))

  /** The Z-value of two long-castable columns, scaled to 16 bits each from
    * the frame's own min/max (one bounded 1-row collect). */
  def zValue(df: DataFrame, colA: String, colB: String): Column = {
    val r = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head
    interleave16(
      scale(col(colA), r.getLong(0), r.getLong(1), 16),
      scale(col(colB), r.getLong(2), r.getLong(3), 16))
  }

  /** Range-partition into `numFiles` by Z-value and sort within — each
    * output file covers a compact Z-range, i.e. a rectangle-ish region of
    * (colA, colB) space, so min-max stats prune on either column. */
  def clusterByZOrder(df: DataFrame, colA: String, colB: String,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("__z", zValue(df, colA, colB))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
