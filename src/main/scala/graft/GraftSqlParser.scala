package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

import graft.ast.{CompareCmd, QueryCmd, ReplayCmd}
import graft.engine.{CompareCompiler, QueryCompiler}
import graft.sources.TestDataSource

/** Delegating SQL parser injected by [[GraftExtensions]]: a statement of
  * the form `GRAFT <command>` is compiled through the engine's command
  * language against the parquet event binding at `spark.graft.data.dir`;
  * everything else goes to the stock Spark parser untouched.
  *
  * Only read-path commands (QUERY / REPLAY / PLOT … VS) make sense as SQL
  * statements — write-path commands (DEFINE/STORE/FLUSH) need a store and
  * are rejected with a pointer to the [[store.EventStore]] API.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Prefix = "(?is)^\\s*GRAFT\\s+(.*)$".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Prefix(cmd) =>
      val spark = SparkSession.active
      // binding precedence: a live EventStore root wins (the store IS an
      // EventSource — full DEFINE'd-schema semantics, memtable-visible
      // reads); then an explicit parquet event dir; otherwise the
      // session's TEMP VIEWS serve as event types (any DataFrame a user
      // registers becomes command-language-queryable)
      val src: graft.engine.EventSource =
        spark.conf.getOption("spark.graft.store.root") match {
          case Some(root) => GraftSqlParser.storeFor(spark, root)
          case None => spark.conf.getOption("spark.graft.data.dir") match {
            case Some(dir) => new TestDataSource(spark, dir)
            case None      => new graft.sources.CatalogEventSource(spark)
          }
        }
      graft.parser.CommandParser.parse(cmd.trim) match {
        case q: QueryCmd   => QueryCompiler.compile(q, src).queryExecution.logical
        case r: ReplayCmd  => QueryCompiler.compile(r.toQuery, src).queryExecution.logical
        case c: CompareCmd => CompareCompiler.compile(c, src).queryExecution.logical
        case other => throw new IllegalArgumentException(
          s"only read commands run as SQL; use graft.store.EventStore for: $other")
      }
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = sqlText match {
    case Prefix(_) => parsePlan(sqlText)
    case _         => delegate.parseQuery(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // one EventStore per (session-instance, root): opening a store loads the
  // catalog and replays the WAL, which must not happen per statement.
  // Keyed by session too — stores hold their session for frame construction
  private val stores =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), graft.store.EventStore]()

  private[graft] def storeFor(spark: SparkSession,
      root: String): graft.store.EventStore =
    stores.computeIfAbsent((System.identityHashCode(spark), root),
      _ => new graft.store.EventStore(spark, root))
}
