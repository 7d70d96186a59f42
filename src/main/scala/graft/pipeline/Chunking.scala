package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the step that turns curated documents
  * into fixed-token-budget training sequences (context-window packing's
  * upstream sibling: [[SequencePacking]] packs whole short docs, chunking
  * splits long ones).
  *
  * Pure per-row generator arithmetic: tokenize once, explode the chunk
  * starts, slice — no shuffle, no state, fused into the scan, so the
  * operator streams unchanged over any number of partitions at 100 TB.
  * Chunk boundaries depend only on the document itself (never on
  * partitioning or row order), so output is deterministic and
  * oracle-checkable.
  */
object Chunking {

  /** Split each document into whitespace-token windows of `chunkSize`
    * tokens starting every `stride` tokens (stride < chunkSize ⇒ overlapping
    * chunks; the final chunk may be shorter). Emits one row per chunk:
    * (idCol, chunk_idx, chunk_text, n_tokens).
    *
    * Note the tokenizer parity quirk: an all-whitespace document has ONE
    * empty token (`split(trim(t))` and DuckDB's `regexp_split_to_array`
    * agree), so every document emits at least one chunk.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be > 0, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__w"))
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0), size(col("__w")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "st")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("__w"), col("st") + 1, lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize), size(col("__w")) - col("st")).cast("long").as("n_tokens"))
  }
}
