package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingest with quarantine — the other half of crawl intake
  * next to the WARC path ([[Multimodal.parseWarcPayloads]]): parse
  * newline-delimited JSON document records against a strict schema and
  * ROUTE rather than drop the failures, so a bad upstream batch is
  * measurable (and replayable) instead of silently shrinking the corpus.
  *
  * Disposition per line:
  *  - `malformed`     — not parseable as JSON (tracked via Spark's
  *                      PERMISSIVE corrupt-record channel, the same
  *                      mechanism `spark.read.json` uses)
  *  - `missing_field` — valid JSON but a required field (`doc_id`,
  *                      `text`) is absent/null
  *  - `ok`            — fully valid
  *
  * Everything is a map-side projection (`from_json` + CASE): no shuffle,
  * no UDF; at 100 TB this is scan-speed schema enforcement.
  */
object JsonIngest {

  /** Required document record schema, plus the corrupt-record channel. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("_corrupt", StringType)))

  /** Parse a JSONL line column; all other input columns ride through.
    * Adds `doc_id`, `text`, `lang`, `status`. */
  def parseJsonl(lines: DataFrame, lineCol: String): DataFrame = {
    val parsed = from_json(col(lineCol), docSchema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))
    lines
      .withColumn("_p", parsed)
      .withColumn("status",
        when(col("_p").isNull || col("_p._corrupt").isNotNull, lit("malformed"))
          .when(col("_p.doc_id").isNull || col("_p.text").isNull, lit("missing_field"))
          .otherwise(lit("ok")))
      .select((lines.columns.map(col).toSeq :+
        col("_p.doc_id").as("doc_id") :+ col("_p.text").as("text") :+
        col("_p.lang").as("lang") :+ col("status")): _*)
  }

  /** Deterministic JSONL synthesis from the documents table for the gate
    * (real `to_json` escaping): doc_id % 13 == 0 → the line is truncated
    * at half length (malformed JSON); else doc_id % 19 == 0 → the `text`
    * field is omitted (missing required field); else a full record. */
  def syntheticJsonl(docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val full = to_json(struct(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"), col(langCol).as("lang")))
    val noText = to_json(struct(col(idCol).cast("long").as("doc_id"),
      col(langCol).as("lang")))
    val truncated = full.substr(lit(1), (length(full) / 2).cast("int"))
    docs.select(col(idCol).cast("long").as("orig_id"),
      when(col(idCol) % 13 === 0, truncated)
        .when(col(idCol) % 19 === 0, noText)
        .otherwise(full).as("line"))
  }
}
