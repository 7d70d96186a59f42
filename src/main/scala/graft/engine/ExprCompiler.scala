package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ast._
import graft.time.TimeParser

/** Compiles WHERE expression trees to Catalyst [[Column]]s.
  *
  * The reference evaluates predicates dynamically over `ScalarValue`s with a
  * numeric-first comparison ladder (sneldb `src/engine/types/mod.rs:245-270`)
  * and compiles the tree to vectorized per-zone filters
  * (`src/engine/core/filter/filter_group.rs`). Here the tree becomes a single
  * Catalyst boolean expression: Spark's BooleanSimplification / NotPropagation
  * and Parquet pushdown replicate the reference's IN→OR expansion, De Morgan
  * and zone-pruning work for free (SURVEY.md §5).
  *
  * Literals are coerced to the column's schema type at compile time, which
  * reproduces the "numeric when both sides are numeric, else lexicographic"
  * behavior without runtime type dispatch.
  */
object ExprCompiler {

  /** Compile against a frame's schema. `resolve` maps a FieldRef to the actual
    * column name (identity for plain queries; prefix-resolution for sequence
    * sides). */
  def compile(expr: Expr, schema: StructType,
              resolve: FieldRef => String = _.name): Column = expr match {
    case Expr.And(l, r) => compile(l, schema, resolve) && compile(r, schema, resolve)
    case Expr.Or(l, r)  => compile(l, schema, resolve) || compile(r, schema, resolve)
    case Expr.Not(e)    => !compile(e, schema, resolve)
    case Expr.In(f, vs) =>
      val name = resolve(f)
      val c = col(name)
      // IN ≡ chain of equalities (reference `filter/in_expansion.rs`); Catalyst's
      // `isin` compiles to an `In` predicate pushed to Parquet.
      c.isin(vs.map(v => litFor(v, dataTypeOf(schema, name))): _*)
    case Expr.Cmp(f, op, v) =>
      val name = resolve(f)
      val c = col(name)
      val l = lit(litFor(v, dataTypeOf(schema, name)))
      op match {
        case CompareOp.Eq  => c === l
        case CompareOp.Neq => c =!= l
        case CompareOp.Gt  => c > l
        case CompareOp.Gte => c >= l
        case CompareOp.Lt  => c < l
        case CompareOp.Lte => c <= l
      }
  }

  private def dataTypeOf(schema: StructType, name: String): DataType =
    schema.fields.find(_.name == name).map(_.dataType)
      .getOrElse(throw new IllegalArgumentException(s"no such field: $name"))

  /** Coerce a parsed literal to the target column type. Numeric strings
    * compare numerically against numeric columns (reference
    * `ScalarValue::compare` ladder); time-typed columns accept ISO strings. */
  private[engine] def litFor(v: Lit, target: DataType): Any = (v, target) match {
    case (Lit.Null, _)              => null
    case (Lit.I64(n), LongType)     => n
    case (Lit.I64(n), IntegerType)  => n.toInt
    case (Lit.I64(n), DoubleType)   => n.toDouble
    case (Lit.I64(n), StringType)   => n.toString
    case (Lit.I64(n), TimestampType) => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(n))
    case (Lit.F64(d), DoubleType)   => d
    case (Lit.F64(d), LongType)     => d.toLong
    case (Lit.F64(d), StringType)   => d.toString
    case (Lit.Bool(b), BooleanType) => b
    case (Lit.Bool(b), StringType)  => b.toString
    case (Lit.Str(s), StringType)   => s
    case (Lit.Str(s), LongType)     =>
      // numeric string vs long column → numeric; ISO time string → epoch seconds
      s.toLongOption
        .orElse(TimeParser.parseToEpochSeconds(s))
        .getOrElse(throw new IllegalArgumentException(s"cannot compare '$s' to integer column"))
    case (Lit.Str(s), DoubleType)   =>
      s.toDoubleOption.getOrElse(throw new IllegalArgumentException(s"cannot compare '$s' to float column"))
    case (Lit.Str(s), BooleanType)  =>
      s.toBooleanOption.getOrElse(throw new IllegalArgumentException(s"cannot compare '$s' to bool column"))
    case (Lit.Str(s), TimestampType) =>
      TimeParser.parseToEpochSeconds(s)
        .map(e => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(e)))
        .getOrElse(throw new IllegalArgumentException(s"cannot compare '$s' to timestamp column"))
    case (Lit.Bool(b), LongType)    => if (b) 1L else 0L
    case (l, t) => throw new IllegalArgumentException(s"cannot compare $l to $t column")
  }

  /** All field names referenced by an expression (for projection pruning and
    * sequence-side splitting). */
  def referencedFields(expr: Expr): Seq[FieldRef] = expr match {
    case Expr.And(l, r) => referencedFields(l) ++ referencedFields(r)
    case Expr.Or(l, r)  => referencedFields(l) ++ referencedFields(r)
    case Expr.Not(e)    => referencedFields(e)
    case Expr.In(f, _)  => Seq(f)
    case Expr.Cmp(f, _, _) => Seq(f)
  }
}
