package graft.functions

import graft.SparkSpec

/** Bradley-Terry preference ranking: pair-frame bookkeeping, agreement
  * with an independent in-memory MM iteration under the same integer
  * µ-ladder, and the dominance ordering a ranking must respect. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private val L = 1000000000000L

  /** Independent reference: same fixed-point, plain Scala maps. */
  private def refBt(comps: Seq[(String, String)],
                    iters: Int): Map[String, Long] = {
    val items = comps.flatMap(c => Seq(c._1, c._2)).distinct
    val nij = scala.collection.mutable.Map.empty[(String, String), Long]
    val wins = scala.collection.mutable.Map.empty[String, Long]
    comps.foreach { case (w, l) =>
      nij((w, l)) = nij.getOrElse((w, l), 0L) + 1
      nij((l, w)) = nij.getOrElse((l, w), 0L) + 1
      wins(w) = wins.getOrElse(w, 0L) + 1
    }
    var s = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      s = items.map { i =>
        val den = items.filter(_ != i).map { j =>
          nij.get((i, j)).fold(0L)(n => n * L / (s(i) + s(j)))
        }.sum
        i -> (if (den == 0) s(i) else wins.getOrElse(i, 0L) * L / den)
      }.toMap
    }
    s
  }

  private val comps = Seq(
    ("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"),
    ("a", "c"), ("a", "c"), ("c", "a"),
    ("b", "c"), ("b", "c"), ("c", "b"), ("c", "b"))

  test("pairFrame: symmetric games and one-sided wins per orientation") {
    val got = Preference
      .pairFrame(comps.toDF("w", "l"), "w", "l")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("a", "b")) === ((4L, 3L)))
    assert(got(("b", "a")) === ((4L, 1L)))
    assert(got(("a", "c")) === ((3L, 2L)))
    assert(got(("b", "c")) === ((4L, 2L)))
    assert(got(("c", "b")) === ((4L, 2L)))
  }

  test("btScores matches the independent MM reference exactly (3 iters)") {
    val got = Preference.btScores(comps.toDF("w", "l"), "w", "l", iters = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    val ref = refBt(comps, 3)
    assert(got === ref)
  }

  test("wins and games totals are the raw comparison bookkeeping") {
    val got = Preference.btScores(comps.toDF("w", "l"), "w", "l", iters = 1)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("a") === ((5L, 7L))) // 4 vs b (3 wins), 3 vs c (2 wins)
    assert(got("b") === ((3L, 8L)))
    assert(got("c") === ((3L, 7L)))
  }

  test("a dominant item outranks a dominated one") {
    // d beats e 9:1; e beats f 9:1 -> strict order d > e > f
    val chain = (1 to 9).flatMap(_ => Seq(("d", "e"), ("e", "f"))) ++
      Seq(("e", "d"), ("f", "e"))
    val s = Preference.btScores(chain.toDF("w", "l"), "w", "l", iters = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(s("d") > s("e") && s("e") > s("f"))
  }
}
