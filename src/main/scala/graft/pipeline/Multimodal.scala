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

  /** Feature extraction. The stub decoder's byte statistics are pure
    * arithmetic, so the DEFAULT path is the native codegen'd
    * [[graft.functions.ByteStats]] expression — the scan → stats pipeline
    * stays inside one whole-stage-codegen'd select, no (de)serialization
    * boundary. Input must have (media_id, kind, bytes). */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      org.apache.spark.sql.graft.bridge.columnOf(graft.functions.ByteStats(
        org.apache.spark.sql.graft.bridge.expressionOf(col("bytes")))).as("features"))

  /** Evenly sample `k` frames per media row as bounded byte slices — the
    * video analog of the decode harness. A real implementation would seek
    * the container per frame; the Spark-side plumbing here IS the real
    * thing: deterministic frame offsets (`floor(i·n/k)`), one output row
    * per frame via `posexplode`, and bounded `frameBytes` slices so a row's
    * output is k·frameBytes regardless of blob size (no multi-GB rows).
    * All per-row codegen'd expressions; blobs never leave the executor.
    * Output: `(media_id, frame_idx, frame_offset, frame_len, frame_bytes)`. */
  def sampleFrames(media: DataFrame, k: Int, frameBytes: Int = 256): DataFrame = {
    require(k > 0 && frameBytes > 0)
    media
      .select(col("media_id"), col("meta.n_bytes").as("n"), col("bytes"),
        posexplode(expr(s"sequence(0L, ${k - 1}L)")).as(Seq("frame_idx", "i")))
      .select(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        floor(col("i") * col("n") / k).cast("long").as("frame_offset"),
        least(lit(frameBytes.toLong), col("n") - floor(col("i") * col("n") / k)).as("frame_len"),
        expr(s"substring(bytes, cast(floor(i * n / $k) as int) + 1, $frameBytes)").as("frame_bytes"))
  }

  /** Batch-shaped extraction harness for a REAL decoder: one codec init per
    * partition, rows streamed — the `mapInPandas` analog. A production
    * image/audio decoder replaces `decode` (the default wires in the stub,
    * which keeps this path exercised and output-identical to
    * [[extractFeatures]]). */
  def extractFeaturesWithDecoder(media: DataFrame,
      decode: Array[Byte] => Array[Double] = decodeStub): DataFrame = {
    media.select("media_id", "kind", "bytes")
      .mapPartitions { it =>
        // per-partition setup: a real implementation initializes the codec
        // once here before streaming the rows through it
        it.map { r =>
          val feats = decode(r.getAs[Array[Byte]]("bytes"))
          Row(r.getLong(0), r.getString(1), feats.toSeq)
        }
      }(Encoders.row(featureSchema))
  }
}
