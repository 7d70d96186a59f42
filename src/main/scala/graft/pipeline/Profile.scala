package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style data-quality report every pipeline
  * runs before trusting a new snapshot: per column, row/null/distinct
  * counts and the value range. The reference has no profiling surface;
  * this is the ingest-side QC row the training-data layer needs ("did the
  * crawl refresh halve the id space / null out a column / shift the time
  * range").
  *
  * ONE pass over the table: every per-column statistic is an aggregate in
  * a single wide agg row (Spark plans the exact multi-column distincts as
  * one Expand — input×columns rows, the documented cost of exactness;
  * swap [[Sketches.kmvDistinct]] in when an estimate is enough), then the
  * wide row unpivots with `stack` into one row per column. Min/max are
  * cast to strings AFTER aggregation in the column's own type — profile
  * integral/string columns (quantize doubles first) so the string forms
  * are engine-portable.
  */
object Profile {

  /** Output: column, n_rows, n_nulls, n_distinct, min_value, max_value. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols
      .map(c => s"'$c', __n_$c, __d_$c, __mn_$c, __mx_$c").mkString(", ")
    wide
      .select(col("__rows"),
        expr(s"stack(${cols.size}, $stacked) AS (col_name, __n, n_distinct, min_value, max_value)"))
      .select(col("col_name").as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col("__n")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
