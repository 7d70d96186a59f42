package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Vectors are quantized to integers (`round(x * 1000)`) before any
  * arithmetic so every dot product is an exact integer sum — bit-identical
  * across engines and partitionings (no FP order dependence), which makes
  * the operators oracle-checkable. Cosine values derived from those exact
  * integers are then deterministic doubles.
  *
  * Scale design:
  *  - [[bruteForceTopK]] broadcasts the (small) query set and streams the
  *    corpus once — the right baseline shape for "k queries vs 100 TB
  *    corpus";
  *  - [[lshTopK]] buckets the corpus by sign-random-projection so each query
  *    only scans its bucket — the scale path when the query set is large;
  *    deterministic hyperplanes derived from md5 so results are reproducible.
  */
object Similarity {

  /** Quantize an array<float/double> to array<long> (milli-units). */
  def quantize(v: Column): Column =
    expr(s"transform(${v.toString}, x -> cast(round(x * 1000) as bigint))")

  /** Exact integer dot product of two array<long> columns. */
  def dotLong(a: Column, b: Column): Column =
    expr(s"aggregate(zip_with(${a.toString}, ${b.toString}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")

  /** Cosine from quantized vectors (deterministic double). */
  def cosineQ(a: Column, b: Column): Column =
    dotLong(a, b) / (sqrt(dotLong(a, a).cast("double")) * sqrt(dotLong(b, b).cast("double")))

  /** Exact top-k neighbors for each query vector by quantized cosine.
    * `queries` must be small (broadcast); the corpus side streams.
    * Output: (query_id, neighbor_id, dot, cosine) — k rows per query,
    * ranked by (dot desc, neighbor_id) for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), quantize(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
    val joined = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", dotLong(col("qv"), col("cv")))
      .withColumn("cosine",
        col("dot") / (sqrt(dotLong(col("qv"), col("qv")).cast("double")) *
                      sqrt(dotLong(col("cv"), col("cv")).cast("double"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot"), round(col("cosine"), 6).as("cosine"))
  }

  /** Sign-random-projection bucket id for hash table `table` over `planes`
    * deterministic hyperplanes. Plane p's component j is an md5-derived value
    * in [-500, 500] — fixed by (table, p, j), engine-portable. The planes are
    * PRECOMPUTED at plan-build time and inlined as literal arrays (hashing
    * them per row cost more than the dot products themselves). */
  def srpBucket(qv: Column, dims: Int, planes: Int, table: Int): Column = {
    val bitExprs = (0 until planes).map { p =>
      val weights = (0 until dims)
        .map(j => Math.floorMod(Hashing.md5LongJvm(s"plane_$table-$p-$j"), 1001L) - 500L)
        .map(w => s"${w}L").mkString("array(", ", ", ")")
      // dot(plane_{table,p}, v) > 0 → bit p
      val terms = s"aggregate(zip_with(${qv.toString}, $weights, (x, w) -> x * w), 0L, (acc, v) -> acc + v)"
      s"if($terms > 0, ${1L << p}L, 0L)"
    }
    expr(bitExprs.mkString(" + "))
  }

  /** LSH-bucketed approximate top-k with `tables` independent hash tables
    * (standard SRP-LSH): each side is exploded to (table, bucket) keys, a
    * query's candidates are the union of its buckets across tables, then
    * exact-ranked. Shuffles on (table, bucket) — never a cross join; recall
    * grows with `tables` at proportional cost. The scale path when the query
    * set is too large to broadcast. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int,
      planes: Int = 4, tables: Int = 8): DataFrame = {
    def withBuckets(df: DataFrame, idName: String, vecName: String): DataFrame = {
      val v = df.select(col(idCol).as(idName), quantize(col(vecCol)).as(vecName))
      val buckets = (0 until tables).map(t =>
        struct(lit(t).as("tbl"), srpBucket(col(vecName), dims, planes, t).as("bkt")))
      v.select(col(idName), col(vecName), explode(array(buckets: _*)).as("tb"))
        .select(col(idName), col(vecName), col("tb.tbl"), col("tb.bkt"))
    }
    val c = withBuckets(corpus, "neighbor_id", "cv")
    val q = withBuckets(queries, "query_id", "qv")
    val joined = c.join(q, Seq("tbl", "bkt"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "qv", "cv")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("dot", dotLong(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot"))
  }
}
