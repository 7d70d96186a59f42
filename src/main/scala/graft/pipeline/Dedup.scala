package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Hashing._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: hash-groupBy on a content key — one shuffle, fully parallel;
  *  - MinHash + LSH: shingle → minhash signature (per-row expressions) →
  *    explode bands → shuffle on (band, band-hash) → candidate pairs →
  *    exact-Jaccard confirm. Never an all-pairs cross join;
  *  - SimHash: 60-bit signature per row (per-row expressions only);
  *  - n-gram Jaccard: the exact confirm step, exposed standalone (only ever
  *    applied to candidate pairs, not the cross product).
  *
  * All hashing is md5-based ([[Hashing]]) so results are engine-portable and
  * exactly reproducible in the DuckDB oracle.
  */
object Dedup {

  /** Normalized content key for exact dedup: lowercase, collapsed whitespace. */
  def contentKey(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact dedup summary: one row per distinct content, keeping the minimum
    * id as the canonical representative. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(contentKey(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingle array (distinct), as strings. */
  def shingles(text: Column, n: Int): Column = {
    val t = s"split(trim(${text.toString}), '\\\\s+')"
    val parts = (0 until n).map(i => s"$t[i+$i]").mkString(", ")
    expr(s"array_distinct(transform(sequence(0, greatest(size($t) - $n, 0)), i -> concat_ws(' ', $parts)))")
  }

  /** Shingle hash array folded into [0, P). */
  def shingleHashes(text: Column, n: Int): Column =
    expr(s"transform(${shingles(text, n).toString}, s -> pmod(cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint), ${P}L))")

  /** MinHash signature: array of `perms` minima of (a_i * h + b_i) mod P. */
  def minhashSignature(hashesCol: Column, perms: Int): Column = {
    val mins = (0 until perms).map { i =>
      expr(s"array_min(transform(${hashesCol.toString}, h -> pmod(${permA(i)}L * h + ${permB(i)}L, ${P}L)))")
    }
    array(mins: _*)
  }

  /** Near-duplicate pairs via MinHash + banded LSH, confirmed by exact
    * Jaccard ≥ `threshold`. `bands` bands of `rowsPerBand` rows; with the
    * default 32×2 the probability of missing a pair at J=0.5 is
    * (1-0.25)^32 ≈ 1e-4. Output: (id_1, id_2, jaccard), id_1 < id_2.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val perms = bands * rowsPerBand
    val withSig = df.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), ngram).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), perms))

    // explode to (band_idx, band_hash, id); band hash packs the band's rows
    // into one i64 without overflow (values < P, P^2 < 2^62)
    val bandCols = (0 until bands).map { b =>
      val packed = (0 until rowsPerBand)
        .map(r => s"sig[${b * rowsPerBand + r}]")
        .reduce((acc, x) => s"($acc * ${P}L + $x)")
      struct(lit(b).as("band_idx"), expr(packed).as("band_hash"))
    }
    val banded = withSig
      .select(col("id"), col("sh"), explode(array(bandCols: _*)).as("band"))
      .select(col("id"), col("sh"), col("band.band_idx"), col("band.band_hash"))

    // candidate pairs: ids sharing any band bucket (shuffle on band hash —
    // no cross join); then confirm with exact Jaccard on the shingle sets
    val l = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_1"), col("sh").as("sh_1"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_2"), col("sh").as("sh_2"))
    val cand = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2", "sh_1", "sh_2")
      .dropDuplicates("id_1", "id_2")

    cand
      .withColumn("inter", size(array_intersect(col("sh_1"), col("sh_2"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_1")) + size(col("sh_2")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_1"), col("id_2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 60-bit SimHash signature over word-token md5 hashes: bit j is set iff
    * the sum of (+1/-1) votes from each token's bit j is positive. Pure
    * per-row expressions; 60 bits (not 64) to stay within a signed i64. */
  def simhash(text: Column, bits: Int = 60): Column = {
    val toks = s"split(trim(${text.toString}), '\\\\s+')"
    val hashes = s"transform($toks, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
    val bitCols = (0 until bits).map { j =>
      val vote = s"aggregate($hashes, 0L, (acc, h) -> acc + if(((h >> $j) & 1) = 1, 1, -1))"
      s"if($vote > 0, ${1L << j}L, 0L)"
    }
    expr(bitCols.mkString("", " + ", ""))
  }

  /** Exact word n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter)
  }
}
