package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ast._

/** Incremental maintenance of aggregate materializations by partial-state
  * merge — the Spark re-expression of the reference's `AggState` partials
  * (`read/aggregate/partial.rs:14-37`, merged per group in
  * `handlers/query/merge/aggregate_stream.rs:131-178`).
  *
  * State relation: one row per group, carrying mergeable partials —
  *  - COUNT / COUNT f      → `st_count` / `st_countf_<f>` (sum-merged longs)
  *  - TOTAL f              → `st_sum_<f>` (sum-merged long, i64 semantics)
  *  - AVG f                → `st_avgsum_<f>` + `st_avgcnt_<f>` (the
  *    reference's `Avg { sum, count }` pair)
  *  - MIN/MAX f            → `st_min_<f>` / `st_max_<f>` (min/max-merged)
  *  - COUNT UNIQUE f       → a side relation of DISTINCT (group, value)
  *    pairs (the relational form of the reference's per-group `HashSet`) —
  *    union+distinct merges, count-per-group finalizes. Scales: state size
  *    is the number of distinct values, and both merge and finalize are
  *    single shuffles on the group key.
  *
  * `finalize(state)` reproduces exactly what [[QueryCompiler]] computes from
  * raw events (same naming, types, ordering, paging), so SHOW over a
  * materialized aggregate needs only the delta rows — not a full recompute.
  */
object AggStateCompiler {

  /** Distinct agg specs that need scalar state (COUNT UNIQUE is side-table). */
  private def scalarSpecs(q: QueryCmd): Seq[AggSpec] =
    q.aggs.distinct.filterNot(_.isInstanceOf[AggSpec.CountUnique])

  def uniqueFields(q: QueryCmd): Seq[String] =
    q.aggs.collect { case AggSpec.CountUnique(f) => f }.distinct

  private def stateCols(spec: AggSpec): Seq[Column] = spec match {
    case AggSpec.Count          => Seq(count(lit(1)).as("st_count"))
    case AggSpec.CountField(f)  => Seq(count(col(f)).as(s"st_countf_$f"))
    case AggSpec.Total(f)       => Seq(sum(col(f).cast("long")).as(s"st_sum_$f"))
    case AggSpec.Avg(f)         => Seq(sum(col(f).cast("long")).as(s"st_avgsum_$f"),
                                       count(col(f).cast("long")).as(s"st_avgcnt_$f"))
    case AggSpec.Min(f)         => Seq(min(col(f)).as(s"st_min_$f"))
    case AggSpec.Max(f)         => Seq(max(col(f)).as(s"st_max_$f"))
    case _: AggSpec.CountUnique => Nil
  }

  private def mergeCols(spec: AggSpec): Seq[Column] = spec match {
    case AggSpec.Count          => Seq(sum(col("st_count")).cast("long").as("st_count"))
    case AggSpec.CountField(f)  => Seq(sum(col(s"st_countf_$f")).cast("long").as(s"st_countf_$f"))
    case AggSpec.Total(f)       => Seq(sum(col(s"st_sum_$f")).cast("long").as(s"st_sum_$f"))
    case AggSpec.Avg(f)         => Seq(sum(col(s"st_avgsum_$f")).cast("long").as(s"st_avgsum_$f"),
                                       sum(col(s"st_avgcnt_$f")).cast("long").as(s"st_avgcnt_$f"))
    case AggSpec.Min(f)         => Seq(min(col(s"st_min_$f")).as(s"st_min_$f"))
    case AggSpec.Max(f)         => Seq(max(col(s"st_max_$f")).as(s"st_max_$f"))
    case _: AggSpec.CountUnique => Nil
  }

  private def finalCol(spec: AggSpec): Column = spec match {
    case AggSpec.Count         => col("st_count").as(spec.outputName)
    case AggSpec.CountField(f) => col(s"st_countf_$f").as(spec.outputName)
    case AggSpec.Total(f)      => coalesce(col(s"st_sum_$f"), lit(0L)).as(spec.outputName)
    case AggSpec.Avg(f) =>
      when(col(s"st_avgcnt_$f") === 0, lit(null))
        .otherwise(col(s"st_avgsum_$f").cast("double") / col(s"st_avgcnt_$f"))
        .as(spec.outputName)
    case AggSpec.Min(f)        => col(s"st_min_$f").as(spec.outputName)
    case AggSpec.Max(f)        => col(s"st_max_$f").as(spec.outputName)
    case u: AggSpec.CountUnique =>
      coalesce(col(s"st_uniq_${u.field}"), lit(0L)).as(spec.outputName)
  }

  /** Partial scalar state over a source slice (full scope at REMEMBER,
    * delta rows at SHOW). */
  def partialState(q: QueryCmd, src: EventSource): DataFrame = {
    val df = QueryCompiler.applyBaseFilters(QueryCompiler.scoped(q, src), q)
    val groupCols = QueryCompiler.bucketColumn(q).toSeq ++ q.groupBy.map(col)
    val aggs = scalarSpecs(q).flatMap(stateCols)
    val safe = if (aggs.isEmpty) Seq(count(lit(1)).as("st_count")) else aggs
    if (groupCols.isEmpty) df.agg(safe.head, safe.tail: _*)
    else df.groupBy(groupCols: _*).agg(safe.head, safe.tail: _*)
  }

  /** DISTINCT (group, value) pairs for one COUNT UNIQUE field. */
  def partialUnique(q: QueryCmd, src: EventSource, field: String): DataFrame = {
    val df = QueryCompiler.applyBaseFilters(QueryCompiler.scoped(q, src), q)
    val groupCols = QueryCompiler.bucketColumn(q).toSeq ++ q.groupBy.map(col)
    df.filter(col(field).isNotNull)
      .select(groupCols :+ col(field).cast("string").as("st_value"): _*)
      .distinct()
  }

  /** Merge two scalar-state relations (old ∪ delta → one row per group). */
  def mergeState(q: QueryCmd, oldState: DataFrame, deltaState: DataFrame): DataFrame = {
    val names = QueryCompiler.groupNames(q)
    val union = oldState.unionByName(deltaState)
    val aggs = scalarSpecs(q).flatMap(mergeCols)
    val safe = if (aggs.isEmpty) Seq(sum(col("st_count")).cast("long").as("st_count")) else aggs
    if (names.isEmpty) union.agg(safe.head, safe.tail: _*)
    else union.groupBy(names.map(col): _*).agg(safe.head, safe.tail: _*)
  }

  /** Merge two distinct-pair relations. */
  def mergeUnique(oldPairs: DataFrame, deltaPairs: DataFrame): DataFrame =
    oldPairs.unionByName(deltaPairs).distinct()

  /** State (+ unique side relations) → the query's final output frame,
    * identical to [[QueryCompiler.compile]] over the raw events. */
  def finalize(q: QueryCmd, state: DataFrame, uniques: Map[String, DataFrame]): DataFrame = {
    val names = QueryCompiler.groupNames(q)
    // count the distinct pairs per group and join onto the state row
    val withUniq = uniqueFields(q).foldLeft(state) { (acc, f) =>
      val counts = {
        val pairs = uniques(f)
        if (names.isEmpty) pairs.agg(count(lit(1)).as(s"st_uniq_$f"))
        else pairs.groupBy(names.map(col): _*).agg(count(lit(1)).as(s"st_uniq_$f"))
      }
      if (names.isEmpty) acc.crossJoin(counts)
      else acc.join(counts, names, "left")
    }
    val out = withUniq.select(names.map(col) ++ q.aggs.map(finalCol): _*)
    QueryCompiler.orderAndPageGroups(out, q, names)
  }
}
