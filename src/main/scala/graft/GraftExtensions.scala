package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ByteStats, DotLong, Md5Long, UnicodeNormalize}

/** Session-extension entry point — the deployment path for the whole
  * library surface on a stock Spark cluster:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions \
  *              --conf spark.graft.data.dir=/data/events ...
  * }}}
  *
  * Injects
  *  - a delegating SQL parser that routes `GRAFT <command>` statements
  *    through the engine's command language ([[parser.CommandParser]] →
  *    [[engine.QueryCompiler]]), so `spark.sql("GRAFT QUERY purchase
  *    WHERE value > 100")` returns the same DataFrame as the library API
  *    while every other statement parses unchanged;
  *  - the library's native Catalyst expressions (`md5long`, `dotl`,
  *    `byte_stats`, `unicode_nfc`) as session functions, codegen'd like
  *    built-ins rather than registered per-session by hand.
  *
  * No reference analog: sneldb owns its whole process, so its command
  * parser IS the front door; on Spark the extension point is how a
  * library becomes part of the session (SparkSessionExtensions is the
  * public API for exactly this).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    GraftExtensions.functions.foreach(e.injectFunction)
  }
}

object GraftExtensions {
  /** (identifier, info, builder) triples for every native expression. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("md5long"),
      new ExpressionInfo(classOf[graft.functions.Md5Long].getName, "md5long"),
      (es: Seq[Expression]) => Md5Long(es.head)),
    (FunctionIdentifier("dotl"),
      new ExpressionInfo(classOf[graft.functions.DotLong].getName, "dotl"),
      (es: Seq[Expression]) => DotLong(es(0), es(1))),
    (FunctionIdentifier("byte_stats"),
      new ExpressionInfo(classOf[graft.functions.ByteStats].getName, "byte_stats"),
      (es: Seq[Expression]) => ByteStats(es.head)),
    (FunctionIdentifier("unicode_nfc"),
      new ExpressionInfo(classOf[graft.functions.UnicodeNormalize].getName, "unicode_nfc"),
      (es: Seq[Expression]) => UnicodeNormalize(es.head, "NFC"))
  )
}
