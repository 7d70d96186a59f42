package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ast.CompareCmd

/** N-way comparison queries (`PLOT … VS …`) — runs each side's query and
  * aligns the results (reference `handlers/compare/merge.rs:16`).
  *
  * The reference renders sides side-by-side per metric; here each side's
  * result rows carry a `side` label column and are unioned (long format) —
  * the natural relational shape, which pivots to wide format trivially when
  * a chart frontend needs it. All sides must share the metric (validated at
  * parse time).
  */
object CompareCompiler {
  def compile(cmd: CompareCmd, src: EventSource): DataFrame = {
    require(cmd.queries.nonEmpty, "compare requires at least one query")
    cmd.queries.zip(cmd.labels).map { case (q, label) =>
      QueryCompiler.compile(q, src).withColumn("side", lit(label))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
