package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise with `mapPartitions` over a
  * typed Dataset (the Scala analogue of `mapInPandas` batch processing).
  *
  * The actual codec work (JPEG decode, resampling, frame sampling) needs
  * native libraries not present in this environment, so `decodeStub` is a
  * clearly-marked deterministic fake; everything AROUND it — schema, binary
  * payload handling, partition-wise batching, feature-vector output shape —
  * is real and tested. Swap `decodeStub` for a real codec on a cluster.
  *
  * Scale notes: binary payloads ride in the row (parquet binary column),
  * so locality is free; `mapPartitions` amortizes per-batch codec init
  * (one decoder per partition, not per row); metadata stays in columnar
  * form for pushdown-friendly filtering BEFORE decode (e.g. filter on
  * width/format without touching bytes).
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      modality: String,      // image | audio | video
      format: String,        // e.g. jpeg | wav | mp4
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeature(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      feature: Array[Float]) // fixed-width feature vector from "decode"

  /** Synthesize a media table from the documents table: text bytes stand in
    * for an encoded payload; metadata derived deterministically. Real
    * pipelines read (path, bytes) from parquet/tar shards instead. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").alias("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).alias("modality"),
      element_at(array(lit("jpeg"), lit("wav"), lit("mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).alias("format"),
      encode(col("text"), "UTF-8").alias("payload"),
      (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int").alias("width"),
      (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int").alias("height"),
      (col("n_chars") * 10).alias("duration_ms"))

  /** STUB decode: a real implementation would decode `payload` with an
    * image/audio codec and emit a model-ready feature vector. This fake is
    * deterministic in the payload bytes so tests are stable. */
  private def decodeStub(row: MediaRow, featDim: Int): MediaFeature = {
    val feat = new Array[Float](featDim)
    var acc = 1125899906842597L
    var i = 0
    while (i < row.payload.length) {
      acc = acc * 31 + row.payload(i); i += 1
    }
    i = 0
    while (i < featDim) {
      val h = acc ^ (i.toLong * 0x9E3779B97F4A7C15L)
      feat(i) = ((h % 1000L).toFloat) / 1000.0f
      i += 1
    }
    MediaFeature(row.media_id, row.modality, row.payload.length.toLong, feat)
  }

  /** Partition-wise feature extraction: one "decoder" per partition.
    * Columnar metadata filters should be applied BEFORE calling this. */
  def extractFeatures(media: DataFrame, featDim: Int = 8): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would happen here (once, not per row)
      rows.map(r => decodeStub(r, featDim))
    }
  }

  /** Frame-sampling plan for video rows: rows explode into (media_id,
    * frame_idx) tasks WITHOUT duplicating payload bytes across frames —
    * the decode stage re-reads the payload once per row, not per frame. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)),
          lit(everyMs))).alias("frame_ts_ms"))
}
