package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL ranking — the primitive behind sorted-neighborhood
  * blocking, exact top-N cutoffs, and deterministic sharding. A plain
  * `row_number() OVER (ORDER BY ...)` funnels the whole corpus through ONE
  * task (Spark warns and then does it anyway); this is the two-phase shape
  * that scales: range-repartition on the order key, rank WITHIN each
  * partition, then add per-partition offsets (one bounded count row per
  * partition — ≤ `spark.sql.shuffle.partitions` rows on the driver,
  * independent of data size).
  *
  * The rank is independent of where the range partitioner draws its
  * boundaries (the ordering is total as long as `orderCols` ends with a
  * unique tiebreaker — callers must ensure that), so sampling variation
  * never changes the output, only the balance.
  */
object Ranking {

  /** Add a 1-based dense global `_rank` column ordering by `orderCols`
    * ascending. `orderCols` MUST form a total order (end with a unique id);
    * with duplicate full keys the rank is still a valid row numbering but
    * ties break arbitrarily. */
  def globalRank(df: DataFrame, orderCols: Seq[String],
      nPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "globalRank needs at least one order column")
    val spark = df.sparkSession
    val n = if (nPartitions > 0) nPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = orderCols.map(col)
    // localCheckpoint pins the range-partitioner's sampled boundaries: the
    // counts job and the join job below must see the SAME row→partition
    // assignment, which recomputation of a nondeterministic upstream (or a
    // re-sampled partitioner) would not guarantee
    val parted = df.repartitionByRange(n, cols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // bounded driver collect: ONE row per partition, never data rows
    val counts = parted.groupBy("_pid").agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getAs[Int]("_pid"), r.getAs[Long]("_c")))
      .sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("_pid", "_off")
    parted
      .join(broadcast(offDf), "_pid")
      .withColumn("_rank",
        row_number().over(Window.partitionBy(col("_pid"))
          .orderBy(cols: _*)).cast("long") + col("_off"))
      .drop("_pid", "_off")
  }
}
