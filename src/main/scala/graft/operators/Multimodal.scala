package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video carried as opaque `binary` with a
  * typed metadata struct.
  *
  * Header-level metadata decode is REAL ([[decodeHeaders]] /
  * [[graft.functions.MediaMeta]] parses PNG/JPEG/GIF/BMP/WAV container
  * bytes natively). Pixel/sample decode still needs a codec library absent
  * from this container, so [[decodeMeta]] remains the clearly-marked
  * deterministic stand-in the correctness gate pins; the schema, batch
  * shape, and partition-parallel `mapPartitions` extraction are the
  * plumbing a production codec plugs into. At scale, decode cost
  * dominates, so the frame keeps the binary column out of every operation
  * that doesn't need it (column pruning does the rest).
  */
object Multimodal {

  /** Real container-header decode: format + dimensions / audio shape from
    * the payload bytes (native expression, garbage-safe). Use over any
    * frame with a `media` binary column.
    */
  def decodeHeaders(media: DataFrame): DataFrame =
    media.withColumn("meta", graft.functions.MediaMeta.media_meta(col("media")))
      .select(col("doc_id"), length(col("media")).cast("long").as("byte_len"),
        col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.sample_rate").as("sample_rate"),
        col("meta.channels").as("channels"), col("meta.bits").as("bits"))

  /** Media table derived from documents: the text bytes stand in for an
    * encoded media payload; `media_kind` is driven by `source`.
    */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      col("n_chars"),
      when(col("source").isin("src0", "src1"), "image")
        .when(col("source") === "src2", "audio")
        .otherwise("video").as("media_kind"))

  /** STUB decode: deterministic fake metadata derived from byte length /
    * n_chars. A real implementation would parse the container header; the
    * column shapes (and the fact decode is a per-row pure projection that
    * codegens) are what matter for the pipeline.
    */
  def decodeMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      length(col("media")).cast("long").as("byte_len"),
      (lit(64) + col("n_chars") % 640).as("width"),
      (lit(64) + (col("n_chars") * 7) % 480).as("height"),
      col("media_kind"))

  final case class MediaRow(doc_id: Long, media: Array[Byte], media_kind: String)
  final case class MediaFeature(doc_id: Long, media_kind: String, histogram: Array[Long])

  /** Partition-parallel feature extraction — the `mapPartitions` shape a
    * real decoder (JNI/ffmpeg/JPEG) runs in: batch-amortized setup per
    * partition, one feature row per media row. STUB feature = 16-bin byte
    * histogram (deterministic).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("doc_id", "media", "media_kind").as[MediaRow].mapPartitions { rows =>
      // per-partition setup would init the decoder here (once, not per row)
      rows.map { r =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < r.media.length) { hist((r.media(i) & 0xff) >> 4) += 1; i += 1 }
        MediaFeature(r.doc_id, r.media_kind, hist)
      }
    }
  }
}
