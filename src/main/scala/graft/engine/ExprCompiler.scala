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
    // null-safe NOT: a null-valued leaf (nullable field, or *-scope union
    // null-fill) compares to SQL null, and `NOT null = null` silently
    // dropped rows the reference keeps (missing/null compares FALSE there,
    // and NOT inverts it — r15 review finding). Wrapping at the NOT
    // boundary — not the leaves — keeps bare comparisons Parquet-pushable
    // (a leaf-level coalesce stripped PushedFilters from every WHERE scan,
    // which the plan-audit gate caught). Nulls at any depth only change
    // the outcome under negation: un-negated null and false both drop.
    case Expr.Not(e)    => coalesce(!compile(e, schema, resolve), lit(true))
    case Expr.In(f, vs) =>
      val name = resolve(f)
      dataTypeOf(schema, name) match {
        // a comparison on a field that doesn't exist matches nothing
        // (reference missing-field ScalarValue compare; scenario
        // query_empty_event_type) — NOT above it still inverts
        case None => lit(false)
        case Some(StringType) =>
          // IN ≡ chain of equalities (reference `filter/in_expansion.rs`).
          // Values with a numeric/bool coercion go through the per-row
          // ladder; plain strings stay one pushdown-friendly `isin`.
          val (laddered, plain) = vs.partition(v => litNum(v).isDefined || litBool(v).isDefined)
          val parts =
            laddered.map(v => stringLadderCmp(name, CompareOp.Eq, v)) ++
            (if (plain.nonEmpty) Seq(col(name).isin(plain.map(rawString): _*)) else Nil)
          parts.reduceOption(_ || _).getOrElse(lit(false))
        case Some(dt) =>
          // Catalyst's `isin` compiles to an `In` predicate pushed to
          // Parquet. Values that don't coerce to the column type match via
          // the string-fallback ladder.
          val (typed, fallback) = vs.partition(v => litFor(v, dt).isDefined)
          val parts =
            (if (typed.nonEmpty) Seq(col(name).isin(typed.map(v => litFor(v, dt).get): _*)) else Nil) ++
            (if (fallback.nonEmpty) Seq(col(name).cast("string").isin(fallback.map(rawString): _*)) else Nil)
          parts.reduceOption(_ || _).getOrElse(lit(false))
      }
    case Expr.Cmp(f, op, v) =>
      val name = resolve(f)
      dataTypeOf(schema, name) match {
        case None => lit(false) // unknown field never matches
        case Some(StringType) => stringLadderCmp(name, op, v)
        case Some(dt) =>
          numericMismatchCmp(name, op, v, dt).getOrElse {
            // Reference parity (`ScalarValue::compare`, sneldb `types/mod.rs:245-270`):
            // when the literal doesn't parse as the column's type, comparison falls
            // back to LEXICOGRAPHIC over stringified values (so `datetime =
            // "not-a-time"` is 0 rows, not an error).
            val (c, l) = litFor(v, dt) match {
              case Some(x) => (col(name), lit(x))
              case None    => (col(name).cast("string"), lit(rawString(v)))
            }
            applyOp(op, c, l)
          }
      }
  }

  /** Reference-ladder NUMERIC comparison for literal/column type mismatches
    * that the typed-literal path mis-handled (r15 review findings):
    *
    *  - a FRACTIONAL double vs an integral column truncated (`count = 3.7`
    *    matched 3; `count >= 3.7` included 3) — the reference compares via
    *    f64, matching nothing at equality and excluding 3;
    *  - an I64 literal beyond Int range wrapped via toInt against int
    *    columns, matching arbitrary wrong rows;
    *  - a NUMERIC STRING with a fraction/exponent vs an integral column
    *    fell to lexicographic ("10" > "9.5" = false) — the reference's f64
    *    rung compares 10 > 9.5 numerically;
    *  - a literal parsing as NaN compares `Ordering::Equal` to everything
    *    (`partial_cmp(..).unwrap_or(Equal)`, types/mod.rs:256-258), so
    *    `= / >= / <=` hold for every row and `> / < / !=` for none.
    *
    * Returns None when the plain typed-literal path is already correct. */
  private def numericMismatchCmp(name: String, op: CompareOp, v: Lit,
      dt: DataType): Option[Column] = {
    val integral = dt == LongType || dt == IntegerType
    // NaN compares Ordering::Equal to every VALUE, but a NULL cell (nullable
    // field, *-scope null-fill) still compares FALSE in the reference —
    // lit(true) matched null rows too and wrongly dropped them under NOT
    // (ADVICE r15). isNotNull keeps null rows on the same 3VL path as every
    // other comparison: drop un-negated, keep under NOT.
    def eqLike = op match {
      case CompareOp.Eq | CompareOp.Gte | CompareOp.Lte => col(name).isNotNull
      case _                                            => lit(false)
    }
    def dblCmp(d: Double): Column =
      if (d.isNaN) eqLike else applyOp(op, col(name).cast("double"), lit(d))
    v match {
      case Lit.F64(d) if d.isNaN && (integral || dt == DoubleType) => Some(eqLike)
      case Lit.F64(d) if integral && (d != math.floor(d) || d.isInfinity ||
          d < Long.MinValue.toDouble || d > Long.MaxValue.toDouble) =>
        Some(dblCmp(d))
      case Lit.I64(n) if dt == IntegerType && (n > Int.MaxValue || n < Int.MinValue) =>
        Some(applyOp(op, col(name).cast("long"), lit(n)))
      case Lit.Str(s) if integral && s.toLongOption.isEmpty &&
          TimeParser.parseToEpochSeconds(s).isEmpty && rustF64(s).isDefined =>
        Some(dblCmp(rustF64(s).get))
      case Lit.Str(s) if dt == DoubleType && rustF64(s).exists(_.isNaN) =>
        Some(eqLike)
      case _ => None
    }
  }

  private def applyOp(op: CompareOp, c: Column, l: Column): Column = op match {
    case CompareOp.Eq  => c === l
    case CompareOp.Neq => c =!= l
    case CompareOp.Gt  => c > l
    case CompareOp.Gte => c >= l
    case CompareOp.Lt  => c < l
    case CompareOp.Lte => c <= l
  }

  /** The literal's coercions along the reference compare ladder
    * (`ScalarValue::{as_i64,as_f64,as_bool}`, `types/mod.rs:188-227`):
    * numeric value when the literal is a number or a numeric string; bool
    * value per the reference's `as_bool` (ints are `!= 0`; floats never). */
  /** Rust `str::parse::<f64>` grammar (the reference's `as_f64` on strings,
    * `types/mod.rs:206-213`): optional sign then decimal/exponent digits or
    * `inf`/`infinity`/`nan` (case-insensitive), NO surrounding whitespace —
    * stricter than Java/Spark parsing, which trims and accepts `7f`/hex. */
  // \A/\z anchors, NOT ^/$: Java's $ (which rlike compiles to) also matches
  // just before a FINAL line terminator, so "7\n" would pass the ^$-anchored
  // gate (and try_cast would trim it to 7.0) while Rust parse::<f64> — and
  // the literal-side String.matches — reject it. \z matches only at the true
  // end of input, keeping row-side and literal-side classification aligned.
  private[engine] val RustFiniteRe = "\\A[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?\\z"
  private[engine] val RustPosInfRe = "\\A\\+?(?i)inf(inity)?\\z"
  private[engine] val RustNegInfRe = "\\A-(?i)inf(inity)?\\z"
  private[engine] val RustNaNRe = "\\A[+-]?(?i)nan\\z"

  /** Parse a literal string exactly as Rust `parse::<f64>` would. */
  private def rustF64(s: String): Option[Double] =
    if (s.matches(RustFiniteRe)) s.toDoubleOption
    else if (s.matches(RustPosInfRe)) Some(Double.PositiveInfinity)
    else if (s.matches(RustNegInfRe)) Some(Double.NegativeInfinity)
    else if (s.matches(RustNaNRe)) Some(Double.NaN)
    else None

  private def litNum(v: Lit): Option[Double] = v match {
    case Lit.I64(n) => Some(n.toDouble)
    case Lit.F64(d) => Some(d)
    case Lit.Str(s) => rustF64(s)
    case _          => None
  }
  private def litBool(v: Lit): Option[Boolean] = v match {
    case Lit.Bool(b) => Some(b)
    case Lit.I64(n)  => Some(n != 0)
    case Lit.Str(s)  => s.toLowerCase match {
      case "true" | "1"  => Some(true)
      case "false" | "0" => Some(false)
      case _             => None
    }
    case _ => None
  }

  /** String-column comparison via the reference's PER-ROW dynamic ladder
    * (`ScalarValue::compare`, `types/mod.rs:245-270`): numeric when BOTH
    * sides parse as numbers (so `strfield > 5` over numeric strings compares
    * NUMERICALLY — "10" > 5 even though "10" < "5" lexicographically), then
    * boolish (`"1"`/`"true"` ≡ true, int literals as `!= 0`), then
    * lexicographic. Rungs whose literal coercion fails are pruned at compile
    * time, so a plain string literal compiles to the bare string comparison
    * (pushdown-friendly). A numeric/bool literal necessarily gives up
    * Parquet predicate pushdown for this conjunct: the matching string set
    * is unbounded ("7", "007", "7.0", " 7" all equal 7), so no static
    * predicate exists — the same column-scan cost the reference pays for
    * its per-row dynamic compare; sibling conjuncts still push down.
    *
    * The numeric rung is gated on the exact Rust `parse::<f64>` grammar
    * ([[RustFiniteRe]] & friends), NOT Spark's `try_cast` acceptance: the
    * reference rejects `" 7"` (whitespace) but accepts `"inf"`/`"nan"`, and
    * its `partial_cmp(..).unwrap_or(Equal)` makes a NaN side compare EQUAL
    * to any number (`types/mod.rs:256-258`) — so `= / >= / <=` hold and
    * `> / < / !=` don't whenever either side is NaN.
    * Known edge vs the reference: integers beyond 2⁵³
    * compare through double here but exactly (u64/i64) there. */
  private def stringLadderCmp(name: String, op: CompareOp, v: Lit): Column = {
    val c = col(name)
    val dv = when(c.rlike(RustFiniteRe), c.try_cast("double"))
      .when(c.rlike(RustPosInfRe), lit(Double.PositiveInfinity))
      .when(c.rlike(RustNegInfRe), lit(Double.NegativeInfinity)) // else null
    val rowNaN = c.rlike(RustNaNRe)
    // NaN ⇒ Ordering::Equal in the reference ladder
    val eqLike = op match {
      case CompareOp.Eq | CompareOp.Gte | CompareOp.Lte => true
      case _                                            => false
    }
    val bv = when(lower(c).isin("true", "1"), lit(true))
      .when(lower(c).isin("false", "0"), lit(false)) // else null
    val rungs = Seq(
      litNum(v).map { n =>
        val cmp =
          if (n.isNaN) lit(eqLike)
          else when(rowNaN, lit(eqLike)).otherwise(applyOp(op, dv, lit(n)))
        (dv.isNotNull || rowNaN, cmp)
      },
      litBool(v).map(b => (bv.isNotNull, applyOp(op, bv, lit(b))))
    ).flatten
    rungs.foldRight(applyOp(op, c, lit(rawString(v)))) {
      case ((cond, cmp), fallthrough) => when(cond, cmp).otherwise(fallthrough)
    }
  }

  private def dataTypeOf(schema: StructType, name: String): Option[DataType] =
    schema.fields.find(_.name == name).map(_.dataType)

  /** Coerce a parsed literal to the target column type; `None` = not
    * coercible, caller falls back to lexicographic string comparison (the
    * last rung of the reference's `ScalarValue::compare` ladder). Numeric
    * strings compare numerically against numeric columns; time-typed columns
    * accept ISO strings. */
  private[engine] def litFor(v: Lit, target: DataType): Option[Any] = (v, target) match {
    case (Lit.Null, _)              => Some(null)
    case (Lit.I64(n), LongType)     => Some(n)
    case (Lit.I64(n), IntegerType)  => Some(n.toInt)
    case (Lit.I64(n), DoubleType)   => Some(n.toDouble)
    case (Lit.I64(n), StringType)   => Some(n.toString)
    case (Lit.I64(n), TimestampType) => Some(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(n)))
    case (Lit.F64(d), DoubleType)   => Some(d)
    case (Lit.F64(d), LongType)     => Some(d.toLong)
    case (Lit.F64(d), StringType)   => Some(d.toString)
    case (Lit.Bool(b), BooleanType) => Some(b)
    case (Lit.Bool(b), StringType)  => Some(b.toString)
    case (Lit.Str(s), StringType)   => Some(s)
    case (Lit.Str(s), LongType)     =>
      // numeric string vs long column → numeric; ISO time string → epoch seconds
      s.toLongOption.orElse(TimeParser.parseToEpochSeconds(s))
    // Rust parse grammar, not Java's (r15): `"7f"`/`" 7"` must NOT coerce
    // (they fall to lexicographic, as the reference rejects them), while
    // `"inf"`/`"-infinity"` DO (NaN is handled by numericMismatchCmp)
    case (Lit.Str(s), DoubleType)   => rustF64(s).filterNot(_.isNaN)
    // the reference's as_bool accepts "1"/"0" alongside "true"/"false"
    // (the same set litBool uses for string columns)
    case (Lit.Str(s), BooleanType)  => litBool(Lit.Str(s))
    case (Lit.I64(n), BooleanType)  => Some(n != 0)
    case (Lit.Str(s), TimestampType) =>
      TimeParser.parseToEpochSeconds(s)
        .map(e => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(e)))
    case (Lit.Bool(b), LongType)    => Some(if (b) 1L else 0L)
    case _                          => None
  }

  /** The literal's natural string form, for the string-comparison fallback. */
  private def rawString(v: Lit): String = v match {
    case Lit.Str(s)  => s
    case Lit.I64(n)  => n.toString
    case Lit.F64(d)  => d.toString
    case Lit.Bool(b) => b.toString
    case Lit.Null    => "null"
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
