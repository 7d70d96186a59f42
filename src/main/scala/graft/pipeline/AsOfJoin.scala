package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AS-OF (temporal) join: match every fact row to the LATEST dimension row
  * of the same key with `dim.ts <= fact.ts` (optionally within a
  * tolerance) — "which profile/price/config version was current when this
  * event happened". The canonical operator Spark's built-in joins cannot
  * express without an n² range join or a window over the unioned stream.
  *
  * Execution shape (100 TB-ready, the [[graft.engine.SequenceCompiler]] J1
  * pattern): both sides are column-pruned, tagged, unioned, shuffled ONCE
  * by the key, and matched group-locally in a single sorted carry-forward
  * pass (`flatMapGroups`) — per-key linear time, no pair blowup on hot
  * keys, no global window. Equal timestamps: the dimension row is visible
  * to a same-timestamp fact (`>=`, DuckDB ASOF semantics).
  *
  * Dimension rows must be unique per (key, ts) — pre-aggregate
  * (`max_by`/`arg_max`) if the raw feed has duplicates, which is also what
  * makes the match deterministic.
  *
  * Output: every fact column, then `<dimPrefix><dimTs>` and the prefixed
  * dimension payload columns — all null when no dimension row is at or
  * before the fact (or the match is older than `toleranceSec`).
  *
  * `forward = true` flips the direction: match the EARLIEST dimension row
  * with `dim.ts >= fact.ts` ("the next error after this deploy") — same
  * single shuffle, the group-local scan just runs descending.
  */
object AsOfJoin {

  def asOf(facts: DataFrame, dims: DataFrame, keyCol: String,
      factTs: String, dimTs: String, dimPrefix: String = "asof_",
      toleranceSec: Option[Long] = None, forward: Boolean = false): DataFrame = {
    require(facts.columns.contains(keyCol) && facts.columns.contains(factTs),
      s"facts must carry $keyCol and $factTs")
    require(dims.columns.contains(keyCol) && dims.columns.contains(dimTs),
      s"dims must carry $keyCol and $dimTs")
    toleranceSec.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))

    val factCols = facts.columns.toSeq
    val dimPayload = dims.columns.filterNot(c => c == keyCol || c == dimTs).toSeq

    val factStruct = StructType(facts.schema.fields)
    val dimStruct = StructType(
      dims.schema(dimTs).copy(name = dimTs, dataType = LongType) +:
        dimPayload.map(c => dims.schema(c)))

    val outSchema = StructType(
      facts.schema.fields.toSeq ++
        (StructField(s"$dimPrefix$dimTs", LongType, nullable = true) +:
          dimPayload.map(c => dims.schema(c).copy(
            name = s"$dimPrefix$c", nullable = true))))
    val nDim = 1 + dimPayload.size

    val f = facts.select(
      col(keyCol).cast("string").as("__k"), col(factTs).cast("long").as("__t"),
      lit(1).as("__tag"), struct(factCols.map(col): _*).as("__f"),
      lit(null).cast(dimStruct).as("__d"))
    val dm = dims.select(
      col(keyCol).cast("string").as("__k"), col(dimTs).cast("long").as("__t"),
      lit(0).as("__tag"), lit(null).cast(factStruct).as("__f"),
      struct(col(dimTs).cast("long").as(dimTs) +: dimPayload.map(col): _*).as("__d"))

    f.unionByName(dm)
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        // (ts, tag): dims (tag 0) precede facts at equal ts, so a
        // same-timestamp dimension version is already current. Forward
        // mode scans DESCENDING: by the time a fact is reached, `last`
        // is the dim with the smallest ts >= fact.ts — "the next one".
        val dir = if (forward) -1L else 1L
        val rows = it.toArray.sortBy(r => (dir * r.getLong(1), r.getInt(2)))
        var last: Row = null
        var lastTs = Long.MinValue
        rows.iterator.flatMap { r =>
          if (r.getInt(2) == 0) {
            last = r.getStruct(4); lastTs = r.getLong(1); Iterator.empty
          } else {
            val gap = if (forward) lastTs - r.getLong(1)
              else r.getLong(1) - lastTs
            val ok = last != null && toleranceSec.forall(t => gap <= t)
            val dimVals: Seq[Any] =
              if (ok) last.toSeq else Seq.fill[Any](nDim)(null)
            Iterator.single(Row.fromSeq(r.getStruct(3).toSeq ++ dimVals))
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** SCD-2 interval builder — the inverse view of [[asOf]]: turn a feed of
    * versioned dimension rows into `[valid_from, valid_to)` intervals
    * (`valid_to` null for the current version). An [[asOf]] match at time t
    * is exactly the interval containing t.
    *
    * The `lead` window runs over VERSION rows (per-key version counts are
    * small by construction — this is the dimension, not the fact table),
    * partitioned on the key: one shuffle, bounded per-key state. Rows must
    * be unique per (key, ts) — same determinism precondition as [[asOf]].
    *
    * Output: all input columns with `tsCol` renamed `valid_from`, plus
    * `valid_to`. */
  def scd2(dims: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    require(dims.columns.contains(keyCol) && dims.columns.contains(tsCol),
      s"dims must carry $keyCol and $tsCol")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).cast("long"))
    dims
      .withColumn("valid_to", lead(col(tsCol).cast("long"), 1).over(w))
      .withColumnRenamed(tsCol, "valid_from")
  }
}
