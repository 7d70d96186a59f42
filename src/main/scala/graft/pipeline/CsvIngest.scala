package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV corpus ingest with quarantine — the third intake format next to
  * JSONL ([[JsonIngest]]) and WARC: parse delimited document records
  * through Spark's REAL CSV parser (Univocity via `from_csv` — full RFC
  * 4180 quoting, `""` escapes, embedded delimiters) against a strict
  * schema, and ROUTE failures rather than drop them.
  *
  * Disposition per line:
  *  - `malformed`     — the tokenizer rejected the line (e.g. more fields
  *                      than the schema; PERMISSIVE corrupt-record channel)
  *  - `malformed` also catches SHORT rows: unlike the file reader,
  *                      `from_csv` routes wrong-arity lines through the
  *                      corrupt channel rather than padding nulls
  *  - `missing_field` — parseable but a required field (`doc_id`, `text`)
  *                      is null (e.g. an empty unquoted field)
  *  - `ok`            — fully valid
  *
  * Like the JSONL path this is a map-side projection — no shuffle, no
  * UDF, scan-speed schema enforcement at any corpus size.
  */
object CsvIngest {

  /** Required record schema, plus the corrupt-record channel. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt", StringType)))

  /** Parse a CSV line column; all other input columns ride through.
    * Adds `doc_id`, `text`, `lang`, `n_chars`, `status`. */
  def parseCsv(lines: DataFrame, lineCol: String): DataFrame = {
    // escape = quote ⇒ RFC-4180 `""` doubling (Spark's default escape is
    // backslash, which silently leaves doubled quotes in the data)
    val parsed = from_csv(col(lineCol), docSchema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt",
        "escape" -> "\""))
    lines
      .withColumn("_p", parsed)
      .withColumn("status",
        when(col("_p").isNull || col("_p._corrupt").isNotNull, lit("malformed"))
          .when(col("_p.doc_id").isNull || col("_p.text").isNull,
            lit("missing_field"))
          .otherwise(lit("ok")))
      .select((lines.columns.map(col).toSeq :+
        col("_p.doc_id").as("doc_id") :+ col("_p.text").as("text") :+
        col("_p.lang").as("lang") :+ col("_p.n_chars").as("n_chars") :+
        col("status")): _*)
  }

  /** Deterministic CSV synthesis from the documents table for the gate.
    * The `text` field is made quoting-hostile on purpose — an embedded
    * comma AND embedded double quotes (`c:<text>, "q<id>"`), escaped
    * RFC-style by doubling — so the round trip proves the real parser
    * path, not a split-on-comma. doc_id % 13 == 0 → two junk fields are
    * appended (too many columns → malformed); else doc_id % 19 == 0 →
    * the text field is EMPTY (null required field → missing_field). */
  def syntheticCsv(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, nCharsCol: String): DataFrame = {
    val hostile = concat(lit("c:"), col(textCol),
      lit(", \"q"), col(idCol).cast("string"), lit("\""))
    val esc = regexp_replace(hostile, "\"", "\"\"")
    val full = concat(col(idCol).cast("string"), lit(",\""), esc,
      lit("\","), col(langCol), lit(","), col(nCharsCol).cast("string"))
    docs.select(col(idCol).cast("long").as("orig_id"),
      when(col(idCol) % 13 === 0, concat(full, lit(",9,9")))
        .when(col(idCol) % 19 === 0, concat(col(idCol).cast("string"),
          lit(",,"), col(langCol), lit(","), col(nCharsCol).cast("string")))
        .otherwise(full).as("line"))
  }
}
