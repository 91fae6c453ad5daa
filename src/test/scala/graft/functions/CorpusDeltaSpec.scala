package graft.functions

import graft.SparkSpec

class CorpusDeltaSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDelta classifies added/removed/changed/unchanged by content") {
    val old = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept the same"),
      (4L, "whitespace   form")).toDF("doc_id", "text")
    val neu = Seq(
      (2L, "gamma delta EDITED"), (3L, "kept the same"),
      (4L, "Whitespace form"),          // normalizes identical
      (5L, "brand new")).toDF("doc_id", "text")
    val r = CorpusDelta.snapshotDelta(old, neu, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r === Map(1L -> "removed", 2L -> "changed", 3L -> "unchanged",
      4L -> "unchanged", 5L -> "added"))
  }

  test("snapshotDelta: fingerprints survive on the present side only") {
    val old = Seq((1L, "gone")).toDF("doc_id", "text")
    val neu = Seq((2L, "here")).toDF("doc_id", "text")
    val rows = CorpusDelta.snapshotDelta(old, neu, "doc_id", "text").collect()
    val by = rows.map(x => x.getLong(0) -> x).toMap
    assert(by(1L).getString(2) != null && by(1L).isNullAt(3))
    assert(by(2L).isNullAt(2) && by(2L).getString(3) != null)
  }
}
