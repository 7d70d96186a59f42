package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch-shaped decode / feature-extraction
  * plumbing.
  *
  * The real decode step (image/audio codecs) is STUBBED — those libraries
  * are not in this container — behind [[decodeStub]], a deterministic fake
  * that produces byte-level statistics with the same shape a real extractor
  * would (fixed-length feature vector per item). Everything around it —
  * schema, binary packing, partition-wise batched execution, feature
  * schema — is real Spark plumbing that a production decoder drops into.
  *
  * Scale notes: media blobs stay opaque binary end-to-end (no driver
  * collect); feature extraction is `mapPartitions` with per-partition batch
  * amortization, the Scala analog of `mapInPandas` batches.
  */
object Multimodal {

  /** Media row schema: id + media kind + raw bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("declared_width", IntegerType),
      StructField("declared_height", IntegerType),
      StructField("sample_rate", IntegerType)
    )))))

  /** Pack a text corpus into fake media rows (deterministic: bytes =
    * UTF-8 of the text) — stands in for reading real image/audio files. */
  def packFromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit(64).as("declared_width"),
        lit(64).as("declared_height"),
        lit(16000).as("sample_rate")).as("meta"))

  /** STUB decode: a real implementation would decode the codec and emit
    * pixel/sample features. This deterministic fake emits byte statistics
    * with the same fixed-length shape (8 doubles per item). */
  private def decodeStub(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return Array.fill(8)(0.0)
    val n = bytes.length
    var sum = 0L; var min = 255; var max = 0
    var i = 0
    while (i < n) { val b = bytes(i) & 0xff; sum += b; if (b < min) min = b; if (b > max) max = b; i += 1 }
    val mean = sum.toDouble / n
    Array(n.toDouble, mean, min.toDouble, max.toDouble,
      (bytes(0) & 0xff).toDouble, (bytes(n - 1) & 0xff).toDouble,
      (bytes(n / 2) & 0xff).toDouble, (sum % 997).toDouble)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("features", ArrayType(DoubleType), nullable = false)))

  /** Batch-shaped feature extraction: one decode pass per partition, rows
    * streamed — the mapInPandas analog. Input must have (media_id, kind,
    * bytes). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    media.select("media_id", "kind", "bytes")
      .mapPartitions { it =>
        // per-partition setup would initialize the codec once here
        it.map { r =>
          val feats = decodeStub(r.getAs[Array[Byte]]("bytes"))
          Row(r.getLong(0), r.getString(1), feats.toSeq)
        }
      }(Encoders.row(featureSchema))
  }
}
