package graft.functions

import graft.SparkSpec

class LpaSpec extends SparkSpec {
  import spark.implicits._

  private def communities(edges: Seq[(Long, Long)], rounds: Int = 3) =
    Lpa.communities(edges.toDF("id_a", "id_b"), "id_a", "id_b", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a clique converges to its smallest member's label") {
    val m = communities(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two dense families joined by one bridge edge stay separate") {
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4-10: CC merges them,
    // LPA keeps two communities because each side's majority wins
    val a = for (x <- 1L to 4L; y <- (x + 1) to 4L) yield (x, y)
    val b = for (x <- 10L to 13L; y <- (x + 1) to 13L) yield (x, y)
    val m = communities(a ++ b ++ Seq((4L, 10L)))
    assert(Set(1L, 2L, 3L).map(m) == Set(1L))
    assert(Set(11L, 12L, 13L).map(m) == Set(10L))
    assert(m(4L) == 1L && m(10L) == 10L)
    // contrast: connected components would put all 8 nodes in ONE group
    val cc = Dedup.componentsFromPairs(
      (a ++ b ++ Seq((4L, 10L))).toDF("id_a", "id_b"))
    assert(cc.select("comp").distinct().count() == 1)
  }

  test("deterministic tie-break: equal counts pick the smallest label") {
    // path 1-2-3: node 2 sees labels {1, 3} once each → picks 1
    val m1 = communities(Seq((1L, 2L), (2L, 3L)), rounds = 1)
    assert(m1(2L) == 1L)
  }

  test("reversed duplicate edges do not double-vote") {
    // node 2's neighborhood: {1 (listed twice reversed), 3, 4, 5} where
    // 3,4,5 all carry label 3's... use: 2-1 twice vs 2-3 once → without
    // dedup 1 would win 2-1; with dedup it is a 1-vs-1 tie → smallest (1).
    // Make it discriminating: edges (2,10),(10,2),(2,3),(2,4) after round 1
    // node 2 sees {10, 3, 4} once each → picks 3; a double-counted (2,10)
    // would pick 10.
    val m = communities(Seq((2L, 10L), (10L, 2L), (2L, 3L), (2L, 4L)),
      rounds = 1)
    assert(m(2L) == 3L)
  }
}
