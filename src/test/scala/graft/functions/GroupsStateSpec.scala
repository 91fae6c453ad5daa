package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental exact-dup group state: append ∪ ≡ rebuild EXACTLY, with
  * duplicate groups deliberately spanning the snapshot boundary. */
class GroupsStateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma"),
    (2L, "alpha  beta\tgamma"), // whitespace-normalized dup of 1
    (3L, "unique one"),
    (4L, "shared text"),
    (5L, "shared text"),
    (6L, "shared text"),        // group of 3 spanning both snapshots
    (7L, "unique two")
  ).toDF("doc_id", "text")

  private def state(df: org.apache.spark.sql.DataFrame) =
    Dedup.exactGroupsState(df, "doc_id", "text")

  test("merge of snapshot states equals the whole-corpus rebuild " +
      "row-for-row, including groups that span the boundary") {
    val old = docs.filter($"doc_id" <= 4)
    val neu = docs.filter($"doc_id" > 4)
    val merged = Dedup.mergeGroupsState(state(old), state(neu))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val rebuilt = state(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(merged === rebuilt)
    // the boundary-spanning group resolved to the OLD snapshot's min id
    val shared = rebuilt.filter(_._3 === 3L)
    assert(shared.length === 1 && shared.head._2 === 4L)
    // the whitespace variants collapsed (group of 2, keep_id 1)
    assert(rebuilt.count(_._3 === 2L) === 1)
  }

  test("merging with an empty state is the identity; merge is " +
      "commutative") {
    val empty = state(docs.filter(lit(false)))
    val s = state(docs)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(Dedup.mergeGroupsState(s, empty)) === rows(s))
    assert(rows(Dedup.mergeGroupsState(empty, s)) === rows(s))
    val a = state(docs.filter($"doc_id" % 2 === 0))
    val b = state(docs.filter($"doc_id" % 2 === 1))
    assert(rows(Dedup.mergeGroupsState(a, b)) ===
      rows(Dedup.mergeGroupsState(b, a)))
  }

  test("DELETE: state ⊖ delta equals the rebuild without the docs, " +
      "including the keep_id repair when the canonical member dies") {
    // delete docs 1 (keep of the whitespace pair — forces a re-min to 2),
    // 4 (keep of the shared-text trio — re-min to 5) and 3 (its whole
    // group vanishes)
    val deleted = docs.filter($"doc_id".isin(1L, 3L, 4L))
    val survivors = docs.filter(!$"doc_id".isin(1L, 3L, 4L))
    val got = Dedup.deleteFromGroupsState(state(docs), deleted,
        "doc_id", "text", survivors)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val rebuilt = state(survivors)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got === rebuilt)
    // the repairs really happened: keeps are now 2 and 5
    assert(got.map(_._2).toSet === rebuilt.map(_._2).toSet)
    assert(got.exists(_._2 === 2L) && got.exists(_._2 === 5L))
    // and group 3's fingerprint is gone entirely
    assert(got.size === rebuilt.size)
  }

  test("DELETE of docs the state never saw fails LOUDLY") {
    val phantom = Seq((99L, "never ingested text")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.deleteFromGroupsState(state(docs), phantom, "doc_id", "text",
        docs).collect()
    }
    assert(ex.getMessage.contains("deleteFromGroupsState") ||
      Option(ex.getCause).exists(
        _.getMessage.contains("deleteFromGroupsState")))
  }

  test("keep-repair with an inconsistent survivors frame (remaining " +
      "members absent) fails LOUDLY, not keep_id = NULL") {
    // delete group {4,5,6}'s keep (doc 4) but hand a survivors frame
    // that is missing docs 5 and 6 — the repair min has nothing to
    // re-min from even though group_size stays positive
    val gone = docs.filter($"doc_id" === 4)
    val badSurvivors = docs.filter($"doc_id" < 4 || $"doc_id" === 7)
    val ex = intercept[Exception] {
      Dedup.deleteFromGroupsState(state(docs), gone, "doc_id", "text",
        badSurvivors).collect()
    }
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("")
    assert(msg(ex).contains("missing the remaining members") ||
      Option(ex.getCause).exists(c =>
        msg(c).contains("missing the remaining members")))
  }

  test("delete then re-append round-trips to the original state") {
    val half = docs.filter($"doc_id" <= 4)
    val gone = docs.filter($"doc_id" > 4)
    val shrunk = Dedup.deleteFromGroupsState(state(docs), gone,
      "doc_id", "text", half)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(Dedup.mergeGroupsState(shrunk, state(gone))) ===
      rows(state(docs)))
  }

  test("three-way incremental chain equals one rebuild (associativity)") {
    val s1 = state(docs.filter($"doc_id" <= 2))
    val s2 = state(docs.filter($"doc_id".between(3, 5)))
    val s3 = state(docs.filter($"doc_id" > 5))
    val chained = Dedup.mergeGroupsState(
      Dedup.mergeGroupsState(s1, s2), s3)
      .collect().map(_.toString).sorted.toSeq
    assert(chained === state(docs).collect().map(_.toString).sorted.toSeq)
  }
}
