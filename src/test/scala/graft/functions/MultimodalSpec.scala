package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "an image payload", 16L), (1L, "audio bytes here", 16L),
    (2L, "a video payload!", 16L))
    .toDF("doc_id", "text", "n_chars")

  test("synthetic media carries binary payload + typed metadata") {
    val m = Multimodal.syntheticMedia(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getString(1) === "image" && m(0L).getString(2) === "jpeg")
    assert(m(1L).getString(1) === "audio")
    assert(m(2L).getString(1) === "video")
    assert(new String(m(0L).getAs[Array[Byte]]("payload"), "UTF-8") ===
      "an image payload")
  }

  test("feature extraction is deterministic in the payload bytes") {
    val f1 = Multimodal.extractFeatures(Multimodal.syntheticMedia(docs), 8)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(Multimodal.syntheticMedia(docs), 8)
      .collect().sortBy(_.media_id)
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length === 8))
    assert(f1.forall(_.n_bytes === 16L))
  }

  test("frame sampling explodes only video rows, one row per sample tick") {
    val frames = Multimodal.sampleFrames(
      Multimodal.syntheticMedia(docs), everyMs = 50)
    val byMedia = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byMedia.keySet === Set(2L))         // only the video row
    assert(byMedia(2L) === (160L - 1) / 50 + 1) // ticks at 0,50,100,150
  }
}
