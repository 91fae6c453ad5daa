package graft.functions

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def e12(rank: Long, c: Long = 60L): Long = 1000000000000L / (c + rank)

  test("rrf fuses two rankings with exact integer scores") {
    val lex = Seq((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
      .toDF("query_id", "rank", "doc_id")
    val vec = Seq((0L, 1, 11L), (0L, 2, 13L))
      .toDF("query_id", "rank", "doc_id")
    val out = Fusion.rrf(Seq(lex, vec), "query_id", "doc_id", "rank", k = 10)
      .collect()
      .map(r => r.getLong(2) -> (r.getInt(1), r.getLong(3), r.getLong(4)))
      .toMap
    // doc 11: lex rank 2 + vec rank 1 → the only 2-hit doc, fused rank 1
    assert(out(11L) === ((1, e12(2) + e12(1), 2L)))
    assert(out(10L) === ((2, e12(1), 1L)))       // best single-hit doc
    assert(out(13L) === ((3, e12(2), 1L)))
    assert(out(12L) === ((4, e12(3), 1L)))
  }

  test("rrf breaks exact ties by doc_id and respects k") {
    // docs 5 and 7 both only rank 1 in one ranking → identical scores
    val a = Seq((0L, 1, 7L)).toDF("query_id", "rank", "doc_id")
    val b = Seq((0L, 1, 5L)).toDF("query_id", "rank", "doc_id")
    val out = Fusion.rrf(Seq(a, b), "query_id", "doc_id", "rank", k = 1)
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 5L) // lower doc_id wins the tie at k=1
  }

  test("rrf keeps queries independent") {
    val a = Seq((0L, 1, 10L), (1L, 1, 20L)).toDF("query_id", "rank", "doc_id")
    val b = Seq((0L, 1, 10L), (1L, 1, 21L)).toDF("query_id", "rank", "doc_id")
    val out = Fusion.rrf(Seq(a, b), "query_id", "doc_id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    assert(out.toSet === Set((0L, 10L, 2L), (1L, 20L, 1L), (1L, 21L, 1L)))
  }

  test("fewer than two rankings is rejected") {
    val a = Seq((0L, 1, 10L)).toDF("query_id", "rank", "doc_id")
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq(a), "query_id", "doc_id", "rank", k = 10)
    }
  }

  private def rboOf(a: Seq[(Long, Int, Long)], b: Seq[(Long, Int, Long)],
                    k: Int): Map[Long, (Long, Long)] =
    Fusion.rbo(a.toDF("query_id", "rank", "doc_id"),
        b.toDF("query_id", "rank", "doc_id"),
        "query_id", "doc_id", "rank", k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("rbo: identical top-10 rankings read exactly 1 - 0.9^10") {
    val run = (1 to 10).map(r => (0L, r, 100L + r))
    // sum_d 9^(d-1) 10^(12-d) = 10^12 (1 - 0.9^10), an exact integer
    assert(rboOf(run, run, 10) === Map(0L -> ((651321559900L, 10L))))
  }

  test("rbo: disjoint rankings read zero and keep the query row") {
    val a = (1 to 3).map(r => (0L, r, 10L + r))
    val b = (1 to 3).map(r => (0L, r, 90L + r))
    assert(rboOf(a, b, 10) === Map(0L -> ((0L, 0L))))
  }

  test("rbo: hand-checked k=2 with one shared doc at depth 2") {
    // a = [x, y], b = [z, y]: overlap 0 at depth 1, {y} at depth 2
    // term = floor(9^1 * 10^10 * 1 / 2) = 45e9
    val a = Seq((0L, 1, 1L), (0L, 2, 2L))
    val b = Seq((0L, 1, 3L), (0L, 2, 2L))
    assert(rboOf(a, b, 2) === Map(0L -> ((45000000000L, 1L))))
  }

  test("rbo: top-weighting — agreement at rank 1 outscores the same " +
      "agreement buried at rank k") {
    val a = (1 to 5).map(r => (0L, r, 10L + r))
    val bHead = Seq((0L, 1, 11L)) ++ (2 to 5).map(r => (0L, r, 90L + r))
    val bTail = (1 to 4).map(r => (0L, r, 90L + r)) :+ ((0L, 5, 15L))
    val head = rboOf(a, bHead, 5)(0L)._1
    val tail = rboOf(a, bTail, 5)(0L)._1
    assert(head > tail * 3, s"head $head vs tail $tail")
  }
}
