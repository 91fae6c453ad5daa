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

  test("datacard state: merge(state(A), state(B)) assembles the EXACT " +
      "one-shot artifact — including a dup group split across snapshots " +
      "that neither snapshot sees alone") {
    val docs = Seq(
      // s1: a dup pair SPLIT across the snapshots (ids 1, 11), plus a
      // singleton per side
      (1L, "the same duplicated content here", "s1"),
      (2L, "a unique document in snapshot a", "s1"),
      (11L, "the same duplicated content here", "s1"),
      (12L, "another unique document entirely", "s1"),
      // s2: no dups, two languages so the argmax has work to do
      (3L, "the quick brown fox and the lazy dog were here", "s2"),
      (13L, "le chat et le chien sont dans le jardin", "s2"),
      (14L, "the cat and the dog are in the garden again", "s2")
    ).toDF("doc_id", "text", "source")
    val a = docs.filter($"doc_id" < 10)
    val b = docs.filter($"doc_id" >= 10)
    def card(st: CorpusDelta.DatacardState) =
      CorpusDelta.datacardFromState(st)
        .collect().map(_.toString).sorted.toSeq
    val merged = CorpusDelta.mergeDatacardState(
      CorpusDelta.datacardState(a, "text", "source"),
      CorpusDelta.datacardState(b, "text", "source"))
    val oneShot = CorpusDelta.datacardState(docs, "text", "source")
    assert(card(merged) === card(oneShot))
    // the split dup is invisible per-snapshot but surfaces at merge
    def dupPpm(st: CorpusDelta.DatacardState) =
      CorpusDelta.datacardFromState(st)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(dupPpm(CorpusDelta.datacardState(a, "text", "source"))("s1") === 0L)
    assert(dupPpm(CorpusDelta.datacardState(b, "text", "source"))("s1") === 0L)
    assert(dupPpm(merged)("s1") === 500000L) // 2 of 4 s1 docs duplicated
  }

  test("datacard DELETE: state(A ∪ B) ⊖ state(B) ≡ state(A) frame for " +
      "frame; a wholly-deleted source vanishes like a rebuild's") {
    val docs = Seq(
      (1L, "the same duplicated content here", "s1"),
      (2L, "a unique document in snapshot a", "s1"),
      (11L, "the same duplicated content here", "s1"),
      (12L, "another unique document entirely", "s1"),
      (3L, "the quick brown fox and the lazy dog were here", "s2"),
      (13L, "le chat et le chien sont dans le jardin", "s2"),
      (14L, "the cat and the dog are in the garden again", "s2"),
      // s3 exists ONLY in the deleted snapshot — must drop entirely
      (21L, "doomed source lone document", "s3")
    ).toDF("doc_id", "text", "source")
    val keep = docs.filter($"doc_id" < 10)
    val gone = docs.filter($"doc_id" >= 10)
    def frames(st: CorpusDelta.DatacardState): Seq[Seq[String]] =
      Seq(st.src, st.fp, st.lang)
        .map(_.collect().map(_.toString).sorted.toSeq)
    val shrunk = CorpusDelta.deleteDatacardState(
      CorpusDelta.datacardState(docs, "text", "source"),
      CorpusDelta.datacardState(gone, "text", "source"))
    assert(frames(shrunk) === frames(
      CorpusDelta.datacardState(keep, "text", "source")))
    // deleting a doc-half of a split dup pair de-duplicates the card
    val card = CorpusDelta.datacardFromState(shrunk)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(card("s1") === 0L) // dup partner deleted → no dups left
    assert(!card.contains("s3"))
  }

  test("datacard DELETE of an unseen snapshot fails LOUDLY") {
    val docs = Seq((1L, "known content", "s1")).toDF("doc_id", "text", "source")
    val phantom = Seq((9L, "phantom content", "s1"))
      .toDF("doc_id", "text", "source")
    val shrunk = CorpusDelta.deleteDatacardState(
      CorpusDelta.datacardState(docs, "text", "source"),
      CorpusDelta.datacardState(phantom, "text", "source"))
    val ex = intercept[Exception] { shrunk.fp.collect() }
    assert(ex.getMessage.contains("deleteDatacardState") ||
      Option(ex.getCause).exists(
        _.getMessage.contains("deleteDatacardState")))
  }
}
