package graft.functions

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // doc 2 is an exact duplicate of doc 1 (cosine 1.0), doc 3 orthogonal
  private val cands = Seq(
    (0L, 1L, 0.90, Seq(1f, 0f, 0f, 0f)),
    (0L, 2L, 0.85, Seq(1f, 0f, 0f, 0f)),
    (0L, 3L, 0.50, Seq(0f, 1f, 0f, 0f))
  ).toDF("query_id", "doc_id", "rel", "v")

  test("mmr demotes near-duplicates of already-selected results") {
    val out = Similarity.mmrRerank(cands, "query_id", "doc_id", "rel", "v",
        k = 2, lam = 0.5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // round 1: pure relevance → doc 1 (0.45); round 2: doc 2 scores
    // 0.425 − 0.5·1.0 < doc 3's 0.25 − 0 → the orthogonal doc wins
    assert(out(0) === ((1, 1L, 0.45)))
    assert(out(1) === ((2, 3L, 0.25)))
  }

  test("mmr with lambda = 1 reduces to pure relevance order") {
    val out = Similarity.mmrRerank(cands, "query_id", "doc_id", "rel", "v",
        k = 3, lam = 1.0)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(out === Array(1L, 2L, 3L))
  }

  test("mmr exhausts small shortlists and breaks ties by doc id") {
    val tied = Seq(
      (0L, 7L, 0.8, Seq(1f, 0f, 0f, 0f)),
      (0L, 5L, 0.8, Seq(0f, 0f, 1f, 0f))
    ).toDF("query_id", "doc_id", "rel", "v")
    val out = Similarity.mmrRerank(tied, "query_id", "doc_id", "rel", "v",
        k = 5, lam = 1.0)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out === Array((1, 5L), (2, 7L))) // only 2 rows; 5 before 7 on tie
  }

  test("mmr keeps queries independent") {
    val two = cands.unionByName(
      Seq((1L, 9L, 0.3, Seq(0f, 0f, 0f, 1f))).toDF("query_id", "doc_id", "rel", "v"))
    val out = Similarity.mmrRerank(two, "query_id", "doc_id", "rel", "v",
        k = 1, lam = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out === Set((0L, 1L), (1L, 9L)))
  }

  test("mmr rejects bad parameters") {
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(cands, "query_id", "doc_id", "rel", "v", 0, 0.5)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(cands, "query_id", "doc_id", "rel", "v", 1, 1.5)
    }
  }
}
