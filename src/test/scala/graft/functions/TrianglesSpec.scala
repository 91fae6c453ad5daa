package graft.functions

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def counts(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every node sits in C(3,2) = 3 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a path has edges but no triangles — empty report") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
  }

  test("triangle + pendant bridge: only the cycle nodes count") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L))
    assert(counts(g) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub star closed by one rim edge finds exactly that triangle once") {
    // hub 1 connects to 2..6; the single rim edge (2, 3) closes one triangle
    val g = (2L to 6L).map(v => (1L, v)) :+ (2L, 3L)
    assert(counts(g) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("duplicate input edges do not double-count") {
    val g = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(counts(g) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("reversed edges are canonicalized; self-loops dropped") {
    val g = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (4L, 4L))
    assert(counts(g) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  private def kcore(pairs: Seq[(Long, Long)], k: Int,
                    rounds: Int): Map[Long, Long] =
    Triangles.kCorePeel(pairs.toDF("id_a", "id_b"), "id_a", "id_b", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-core peel dissolves a chain round by round") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    // round 1 drops endpoints, round 2 drops the middle edge
    assert(kcore(chain, k = 2, rounds = 1) === Map(2L -> 1L, 3L -> 1L))
    assert(kcore(chain, k = 2, rounds = 2) === Map.empty)
  }

  test("2-core keeps the cycle, sheds the pendant halo") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L), (9L, 10L))
    assert(kcore(g, k = 2, rounds = 3) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k = 1 keeps every non-isolated node") {
    val g = Seq((1L, 2L), (3L, 4L))
    assert(kcore(g, k = 1, rounds = 3) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}
