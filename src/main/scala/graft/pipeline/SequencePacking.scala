package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing — concatenate curated documents into fixed token-budget
  * training sequences (the step between curation and tokenization).
  *
  * Globally optimal bin packing needs total order; at 100 TB nobody does
  * that. The standard scalable scheme — and this implementation — packs
  * greedily WITHIN deterministic buckets: each document is assigned a
  * bucket by salted id hash, buckets are hash-partitioned (each lives
  * wholly in one partition), and a single streaming pass packs each
  * bucket's documents in id order. No driver state, O(1) memory per task
  * (`sortWithinPartitions` + `mapPartitions`, the sanctioned imperative
  * case), and the result is a pure function of (ids, token counts, budget,
  * buckets) — reproducible across runs, cluster layouts, and engines.
  */
object SequencePacking {

  case class PackedSeq(seq_id: Long, doc_ids: Seq[Long], n_docs: Long, n_tokens: Long)

  /** Pack `df`'s documents into sequences of at most `budget` tokens.
    * Documents with `tokenCol` > budget become singleton sequences
    * (truncation is the tokenizer's concern). Output: `(seq_id, doc_ids,
    * n_docs, n_tokens)`; `seq_id` = bucket << 40 | ordinal, unique without
    * coordination.
    *
    * @param buckets number of independent packing streams; size so one
    *                bucket's documents ≪ executor disk (they are only ever
    *                streamed, not held)
    */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, buckets: Int = 64, salt: String = "pack"): Dataset[PackedSeq] = {
    require(budget > 0 && buckets > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        // null-propagating concat: the oracle spells this `'salt:' || id`,
        // and concat_ws would silently hash null ids to the constant salt
        pmod(Hashing.md5Long(concat(lit(s"$salt:"), col(idCol).cast("string"))),
          lit(buckets.toLong)).as("bucket"),
        col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("t"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "id")
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        new Iterator[PackedSeq] {
          private var cur = if (rows.hasNext) Some(rows.next()) else None
          private var ordinal = -1L
          private var lastBucket = -1L
          def hasNext: Boolean = cur.isDefined
          def next(): PackedSeq = {
            val (bucket, _, _) = cur.get
            ordinal = if (bucket == lastBucket) ordinal + 1 else 0L
            lastBucket = bucket
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            var tokens = 0L
            var done = false
            while (!done && cur.exists(_._1 == bucket)) {
              val (_, id, t) = cur.get
              if (ids.nonEmpty && tokens + t > budget) done = true
              else {
                ids += id; tokens += t
                cur = if (rows.hasNext) Some(rows.next()) else None
              }
            }
            PackedSeq((bucket << 40) | ordinal, ids.toSeq, ids.size.toLong, tokens)
          }
        }
      }
  }
}
