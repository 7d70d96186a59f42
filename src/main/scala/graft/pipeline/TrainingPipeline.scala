package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation — the composite pipeline a 100 TB
  * pretraining corpus actually runs, expressed as ONE Spark plan:
  *
  *   language filter → quality filter → exact dedup → token statistics
  *
  * Shape at scale: every scoring/filter step is a per-row codegen'd
  * expression that fuses into the scan (no UDFs, no shuffles); the only
  * shuffle in the whole pipeline is the dedup's hash partition on
  * `content_key`, whose group sizes are duplicate counts (bounded, skew-free
  * for real corpora). Survivor selection is a `row_number` window rather
  * than a groupBy + self-join: one shuffle instead of two, no join.
  *
  * Composes [[TextAnalysis]] (language-ID, quality, token counting) and
  * [[Dedup.contentKey]] (normalized exact-dup key). Deterministic end to
  * end — the DuckDB oracle replicates it exactly (`q_pipeline_e2e`).
  */
object TrainingPipeline {

  /** Curate `df`: keep rows in `lang` with quality ≥ `minQuality`, drop
    * exact duplicates (canonical survivor = min `idCol` per normalized
    * content), and emit per-document token statistics. */
  def curate(df: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minQuality: Double = 0.5): DataFrame = {
    val scored = df.select(
        col(idCol), col(textCol),
        TextAnalysis.languageId(col(textCol)).as("lang_pred"),
        TextAnalysis.qualityScore(col(textCol)).as("quality"))
      .filter(col("lang_pred") === lang && col("quality") >= minQuality)
      .withColumn("content_key", Dedup.contentKey(col(textCol)))
    val w = Window.partitionBy(col("content_key")).orderBy(col(idCol))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(
        col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("tok_ws"),
        TextAnalysis.bpeishTokenCount(col(textCol)).cast("long").as("tok_bpe"),
        col("quality"))
  }
}
