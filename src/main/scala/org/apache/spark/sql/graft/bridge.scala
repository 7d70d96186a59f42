/* Bridge into Spark's package-private classic Column API.
 *
 * Spark 4 split Column away from catalyst Expressions; the supported way to
 * wrap a custom Expression as a Column from third-party code is either the
 * function registry or this package-private bridge (the same mechanism
 * Spark's own built-in DSL uses, `classic.ExpressionUtils.column`). Kept to
 * a single file with a single function; everything else lives in `graft.*`.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object bridge {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
