package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ast._
import graft.engine.{EventSource, QueryCompiler}
import graft.parser.CommandParser

/** Property test of the string-column dynamic-compare ladder
  * ([[graft.engine.ExprCompiler]]) against a DIRECT Scala model of the
  * reference's `ScalarValue::compare` (sneldb `types/mod.rs:245-270`):
  * try numeric when both sides parse (u64/i64/f64 collapse to an exact
  * BigDecimal compare here — the doubles-only divergence is documented in
  * DIVERGENCES.md #11 and excluded from generation), then boolish
  * (`as_bool`: "true"/"1"/"false"/"0" case-insensitive; ints as `!= 0`),
  * then lexicographic over string representations.
  *
  * The engine path is the real one: command text → parser → compiler →
  * Catalyst filter over a DataFrame, executed on Spark. One batched
  * execution per (op, literal) pair keeps the job count bounded.
  */
class CompareLadderPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- the reference model ----
  /** Numeric interpretation per Rust `parse::<f64>` (as_f64 on strings):
    * NO whitespace trimming, `inf`/`infinity`/`nan` spellings accepted.
    * Finite values keep BigDecimal exactness (the u64/i64 rungs of the
    * ladder); NaN is modeled as None-ordering → `Ordering::Equal`. */
  private sealed trait Num
  private case class Finite(v: BigDecimal) extends Num
  private case object PosInf extends Num
  private case object NegInf extends Num
  private case object ModelNaN extends Num
  private def asNum(s: String): Option[Num] =
    if (s.matches("[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?"))
      try Some(Finite(BigDecimal(s))) catch { case _: Exception => None }
    else if (s.matches("\\+?(?i)inf(inity)?")) Some(PosInf)
    else if (s.matches("-(?i)inf(inity)?")) Some(NegInf)
    else if (s.matches("[+-]?(?i)nan")) Some(ModelNaN)
    else None
  private def numCompare(a: Num, b: Num): Int = (a, b) match {
    case (ModelNaN, _) | (_, ModelNaN) => 0 // partial_cmp → unwrap_or(Equal)
    case (Finite(x), Finite(y))        => x.compare(y)
    case (PosInf, PosInf)              => 0
    case (NegInf, NegInf)              => 0
    case (PosInf, _)                   => 1
    case (_, PosInf)                   => -1
    case (NegInf, _)                   => -1
    case (_, NegInf)                   => 1
  }
  private def asBool(s: String): Option[Boolean] = s.toLowerCase match {
    case "true" | "1"  => Some(true)
    case "false" | "0" => Some(false)
    case _             => None
  }
  /** compare(value, literal) → sign, per the reference ladder. */
  private def modelCompare(value: String, lit: Lit): Int = {
    val litNum: Option[Num] = lit match {
      case Lit.I64(n) => Some(Finite(BigDecimal(n)))
      case Lit.F64(d) => Some(Finite(BigDecimal(d)))
      case Lit.Str(s) => asNum(s)
      case _          => None
    }
    val litBool: Option[Boolean] = lit match {
      case Lit.Bool(b) => Some(b)
      case Lit.I64(n)  => Some(n != 0)
      case Lit.Str(s)  => asBool(s)
      case _           => None
    }
    val litStr: String = lit match {
      case Lit.Str(s)  => s
      case Lit.I64(n)  => n.toString
      case Lit.F64(d)  => d.toString
      case Lit.Bool(b) => b.toString
      case Lit.Null    => "null"
    }
    (asNum(value), litNum) match {
      case (Some(a), Some(b)) => numCompare(a, b)
      case _ =>
        (asBool(value), litBool) match {
          case (Some(a), Some(b)) => a.compare(b)
          case _                  => value.compare(litStr).sign
        }
    }
  }
  private def modelHolds(value: String, op: CompareOp, lit: Lit): Boolean = {
    val c = modelCompare(value, lit)
    op match {
      case CompareOp.Eq  => c == 0
      case CompareOp.Neq => c != 0
      case CompareOp.Gt  => c > 0
      case CompareOp.Gte => c >= 0
      case CompareOp.Lt  => c < 0
      case CompareOp.Lte => c <= 0
    }
  }

  // ---- generators: values that EXERCISE every rung ----
  private val numericish = Gen.oneOf(
    Gen.chooseNum(-1000L, 1000L).map(_.toString),
    Gen.chooseNum(-100.0, 100.0).map(d => f"$d%.3f"),
    Gen.oneOf("0", "1", "-1", "10", "9", "007", "2.50", "2.5"))
  private val boolish = Gen.oneOf("true", "false", "TRUE", "False", "1", "0")
  private val wordy = Gen.oneOf("banana", "apple", "z", "", " ", "9a", "a9",
    "null", "true2", "-",
    // the Rust-parse edge set: whitespace-wrapped numerics are NOT numeric
    // (they fall to lexicographic), inf/infinity/nan spellings ARE, and
    // Java-only forms like a trailing f are not
    " 7", "7 ", " 2.5 ", "NaN", "nan", "-NaN", "inf", "Inf", "-inf",
    "Infinity", "-Infinity", "infinity", "7f", "0x10",
    // trailing line terminators: Java's $ would classify "7\n" numeric on
    // the rlike row side while Rust (and String.matches) reject it — the
    // \A/\z anchors must keep both sides lexicographic here
    "7\n", "2.5\n", "nan\n", "7\r\n")
  private val valueGen: Gen[String] = Gen.frequency(
    (4, numericish), (2, boolish), (4, wordy))

  private val litGen: Gen[Lit] = Gen.frequency[Lit](
    (3, Gen.chooseNum(-50L, 50L).map(Lit.I64(_))),
    (2, Gen.oneOf(Lit.F64(2.5), Lit.F64(-1.0), Lit.F64(0.0))),
    (2, Gen.oneOf(true, false).map(Lit.Bool(_))),
    (4, Gen.oneOf("9", "banana", "true", "0", "2.5", "", "a9",
      "inf", "nan", " 7", "-Infinity").map(Lit.Str(_))))

  private def source(values: Seq[String]): EventSource = new EventSource {
    def eventTypes = Seq("t")
    def frame(tp: String): DataFrame =
      values.zipWithIndex.map { case (v, i) =>
        (s"c$i", "t", i.toLong, i.toLong, v)
      }.toDF("context_id", "event_type", "timestamp", "event_id", "label")
  }

  private def renderLit(l: Lit): String = l match {
    case Lit.Str(s)  => "\"" + s.replace("\"", "") + "\""
    case Lit.I64(n)  => n.toString
    case Lit.F64(d)  => d.toString
    case Lit.Bool(b) => b.toString
    case Lit.Null    => "null"
  }

  test("ladder comparisons agree with the reference model on generated corpora") {
    val ops = Seq("=" -> CompareOp.Eq, "!=" -> CompareOp.Neq, ">" -> CompareOp.Gt,
      ">=" -> CompareOp.Gte, "<" -> CompareOp.Lt, "<=" -> CompareOp.Lte)
    // one fixed generated corpus (deterministic seed); per (op, literal)
    // pair ONE Spark job — 40 literals x 6 ops = 240 tiny local jobs
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val values = sample(Gen.listOfN(60, valueGen), 42L).distinct
    val src = source(values)
    val lits = (1 to 40).map(i => sample(litGen, 1000L + i)).distinct
    for (l <- lits; (opTxt, op) <- ops) {
      val cmd = s"QUERY t WHERE label $opTxt ${renderLit(l)}"
      val got = QueryCompiler
        .compile(CommandParser.parse(cmd).asInstanceOf[QueryCmd], src)
        .collect().map(_.getAs[String]("label")).toSet
      val want = values.filter(v => modelHolds(v, op, l)).toSet
      assert(got == want,
        s"cmd=[$cmd]\n  spark=${got.toSeq.sorted}\n  model=${want.toSeq.sorted}")
    }
  }
}
