package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination — detect training documents that overlap an
  * evaluation/benchmark set by shared word n-grams (the GPT-3/PaLM-style
  * n-gram collision check, run before training to avoid eval leakage).
  *
  * Scale shape: the benchmark side is small by construction (eval suites are
  * thousands of documents, not billions), so its DISTINCT gram-hash set is
  * broadcast; the 100 TB corpus side is a stateless explode that never
  * shuffles full documents — the only shuffle is the per-doc hit count on
  * the (long id, long count) pairs that survive the semi-join. Gram hashing
  * is [[Hashing.md5Long]], so the whole check is engine-portable and
  * oracle-verifiable.
  */
object Contamination {

  /** Per-document contamination report: documents of `corpus` sharing at
    * least `minHits` distinct `ngram`-grams with ANY benchmark document.
    * Output: `(id, n_grams, n_hits, contamination)` where contamination =
    * n_hits / n_grams rounded to 6 places.
    *
    * @param broadcastBenchmark force-broadcast the benchmark gram set
    *                           (default); disable for an unusually large
    *                           benchmark side and let AQE pick the join
    */
  def contamination(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      ngram: Int = 8, minHits: Int = 1,
      broadcastBenchmark: Boolean = true): DataFrame = {
    val bgRaw = benchmark
      .select(explode(Dedup.shingleHashes(col(benchTextCol), ngram)).as("gram"))
      .distinct()
    val bg = if (broadcastBenchmark) broadcast(bgRaw) else bgRaw

    // ONE pass over the corpus text: the gram array is computed once,
    // `n_grams` is captured BEFORE the explode and rides along as a group
    // key (it is functionally dependent on id), so no second scan/join is
    // needed to recover the denominator. shingleHashes is per-doc distinct,
    // so count(*) after the semi-join is the distinct-gram hit count.
    val cg = corpus
      .select(col(idCol).as("id"), Dedup.shingleHashes(col(textCol), ngram).as("grams"))
      .select(col("id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
    cg.join(bg, Seq("gram"))
      .groupBy("id", "n_grams")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .select(col("id"), col("n_grams"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_grams"), 6).as("contamination"))
  }

  /** Drop contaminated documents from `corpus` (anti-join on the report). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      ngram: Int = 8, minHits: Int = 1): DataFrame = {
    val bad = contamination(corpus, idCol, textCol, benchmark, benchTextCol, ngram, minHits)
      .select(col("id").as(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
