package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing for the data-pipeline operators.
  *
  * All hashes are derived from md5 (available and bit-identical in Spark and
  * DuckDB), folded to a 60-bit non-negative long, so every pipeline operator
  * is exactly reproducible by an independent SQL engine — no reliance on
  * Spark's internal murmur `hash()` which is not portable.
  */
object Hashing {

  /** Large prime modulus (fits all intermediate products in a signed i64:
    * p^2 < 2^62, used by the MinHash permutations and band hashes). */
  val P: Long = 2147483647L // 2^31 - 1 (Mersenne)

  /** 60-bit hash of a string column: first 15 hex chars of md5. Backed by
    * the native [[graft.functions.Md5Long]] expression (no hex round-trip;
    * codegen-capable). Value-identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)`. */
  def md5Long(c: Column): Column =
    org.apache.spark.sql.graft.bridge.columnOf(
      graft.functions.Md5Long(org.apache.spark.sql.graft.bridge.expressionOf(c)))

  /** Same hash folded into [0, P). */
  def md5Mod(c: Column): Column = pmod(md5Long(c), lit(P))

  /** DuckDB fragment computing md5Long(expr) (hex parse via list_reduce). */
  def duckMd5Long(expr: String): String =
    s"list_reduce(list_transform(string_split_regex(substr(md5($expr),1,15),''), c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1), (a, b) -> a*16 + b)"

  def duckMd5Mod(expr: String): String = s"(${duckMd5Long(expr)} % $P)"

  /** Deterministic MinHash permutation parameters a_i (odd, nonzero) and b_i,
    * both < P — inlined as literals on both engines. */
  def permA(i: Int): Long = Math.floorMod(1103515245L * (2 * i + 1) + 12345L, P)
  def permB(i: Int): Long = Math.floorMod(1103515245L * (i + 101) + 54321L, P)

  /** JVM-side md5Long — bit-identical to [[md5Long]]; used to PRECOMPUTE
    * constants (e.g. LSH hyperplanes) at plan-build time instead of
    * re-hashing per row. */
  def md5LongJvm(s: String): Long =
    graft.functions.Md5Long.hash(org.apache.spark.unsafe.types.UTF8String.fromString(s))
}
