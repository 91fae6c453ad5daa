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

  test("games over the 64-bit ladder bound fail LOUDLY, not silently") {
    import org.apache.spark.sql.functions._
    // 9 000 001 identical comparisons: games(x) = 9 000 001 >= the bound
    val big = spark.range(9000001L)
      .select(lit("x").as("w"), lit("y").as("l"))
    val ex = intercept[Exception] {
      Preference.btScores(big, "w", "l", iters = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("overflow")))
  }

  test("promptPairs: per-prompt top-vs-bottom with exact rates") {
    val comps = Seq(
      // p1: a 3/4 = 750000, b 1/3 = 333333, c 0/1 = 0 -> (a, c)
      ("p1", "a", "b"), ("p1", "a", "b"), ("p1", "b", "a"), ("p1", "a", "c"),
      // p2: x 1/1, y 0/1 -> (x, y)
      ("p2", "x", "y"),
      // p3: even split d 1/2 = e 1/2 -> strict gate drops the prompt
      ("p3", "d", "e"), ("p3", "e", "d")
    ).toDF("prompt", "w", "l")
    val got = Preference.promptPairs(comps, "prompt", "w", "l")
      .as[(String, String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === Map(
      "p1" -> (("a", "c", 750000L, 0L)),
      "p2" -> (("x", "y", 1000000L, 0L))))
  }

  test("promptPairs ties break deterministically; rejected is the true minimum") {
    // q1: g 5/9, z 5/9 (EXACT tie at the top -> lowest item g), f 2/6 ->
    //     pair (g, f), emitted because 5·6 > 2·9
    val q1 = Seq.fill(2)(("q1", "f", "g")) ++ Seq(("q1", "g", "f")) ++
      Seq.fill(4)(("q1", "g", "z")) ++ Seq.fill(2)(("q1", "z", "g")) ++
      Seq.fill(3)(("q1", "z", "f"))
    // q2: h 2/3 (666666 ppm), i 3/7 (428571), j 2/4 (500000) -> (h, i):
    //     the rejected side must be the MINIMUM rate, not just any loser
    val q2 = Seq.fill(2)(("q2", "h", "i")) ++ Seq(("q2", "i", "h")) ++
      Seq.fill(2)(("q2", "i", "j")) ++ Seq.fill(2)(("q2", "j", "i"))
    val got = Preference.promptPairs((q1 ++ q2).toDF("prompt", "w", "l"),
      "prompt", "w", "l").as[(String, String, String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("q1" -> (("g", "f")), "q2" -> (("h", "i"))))
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

  /** Independent Krippendorff reference: exact BigInt arithmetic with the
    * engine's floors — per-unit terms `(2·o1·o2·10⁸) div (n_u−1)` summed,
    * alpha `10⁶ − (do·(n−1)·10⁶) div (2·n₁·n₂·10⁸)`. */
  private def refAlpha(cs: Seq[(String, String)]): Option[Long] = {
    val units = cs.map { case (w, l) =>
      (Seq(w, l).min, Seq(w, l).max, if (w <= l) 1L else 0L)
    }.groupBy(t => (t._1, t._2)).values
      .map(g => (g.map(_._3).sum, g.size.toLong))
      .filter(_._2 >= 2).toSeq
    val n = units.map(_._2).sum
    val n1 = units.map(_._1).sum
    val n2 = n - n1
    if (n1 == 0 || n2 == 0) None
    else {
      val doSum = units.map { case (o1, nu) =>
        (BigInt(2) * o1 * (nu - o1) * 100000000L) / (nu - 1)
      }.sum
      Some((BigInt(1000000) -
        doSum * (n - 1) * 1000000L / (BigInt(2) * n1 * n2 * 100000000L))
        .toLong)
    }
  }

  test("krippendorffAlpha matches the exact BigInt reference") {
    // the shared fixture + one single-rating unit (x, y) that must be
    // excluded as unpairable without disturbing anything else
    val cs = comps :+ (("x", "y"))
    val got = Preference.krippendorffAlpha(cs.toDF("w", "l"), "w", "l")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    assert(got._1 === 3L)  // 3 pairable units — (x, y) dropped
    assert(got._2 === 11L) // their 11 ratings
    // hand floors: (a,b) o=3,1 over n=4 -> 2e8; (a,c) o=2,1 over 3 -> 2e8;
    // (b,c) o=2,2 over 4 -> 8e8/3 = 266666666
    assert(got._5 === 666666666L)
    assert(got._6 === refAlpha(cs))
    // this fixture genuinely disagrees more than chance: negative alpha
    assert(got._6.exists(_ < 0))
  }

  test("krippendorffAlpha: perfect within-unit agreement reads 10^6") {
    val cs = Seq.fill(3)(("a", "b")) ++ Seq.fill(2)(("c", "b"))
    val got = Preference.krippendorffAlpha(cs.toDF("w", "l"), "w", "l")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    assert(got._5 === 0L && got._6 === Some(1000000L))
  }

  test("krippendorffAlpha: a one-category log has no defined alpha (NULL)") {
    val cs = Seq.fill(4)(("a", "b")) // every rating is "low item wins"
    val got = Preference.krippendorffAlpha(cs.toDF("w", "l"), "w", "l")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    assert(got._4 === 0L && got._6 === None)
  }

  // exact BigInt reference for the GENERAL-nominal alpha: per-unit
  // (n_u² − Σ o_uc²) µ8-floored terms, margins over pairable units only
  private def refAlphaNominal(
      ratings: Seq[(String, String)]): (Long, Long, Long, Long, Option[Long]) = {
    val byUnit = ratings.groupBy(_._1).filter(_._2.size >= 2)
    val units = byUnit.values.map { rs =>
      val o = rs.groupBy(_._2).map(_._2.size.toLong)
      (rs.size.toLong, o.map(x => BigInt(x) * x).sum)
    }.toSeq
    val n = units.map(_._1).sum
    val catCounts = byUnit.values.flatten.groupBy(_._2).map(_._2.size.toLong)
    val sc = catCounts.map(x => BigInt(x) * x).sum
    val doSum = units.map { case (nu, ss) =>
      ((BigInt(nu) * nu - ss) * 100000000L) / (nu - 1)
    }.sum
    val de = BigInt(n) * n - sc
    val alpha =
      if (de == 0) None
      else Some((BigInt(1000000) -
        doSum * (n - 1) * 1000000L / (de * 100000000L)).toLong)
    (units.size.toLong, n, catCounts.size.toLong, doSum.toLong, alpha)
  }

  test("krippendorffAlphaNominal matches the BigInt reference at 3+ " +
      "categories with per-unit multiplicity") {
    val rs = Seq(
      ("u1", "yes"), ("u1", "yes"), ("u1", "no"),
      ("u2", "no"), ("u2", "maybe"), ("u2", "maybe"), ("u2", "maybe"),
      ("u3", "yes"), ("u3", "maybe"),
      ("u4", "no"), ("u4", "no"),
      ("u5", "yes")) // unpairable — must drop from terms AND margins
    val got = Preference.krippendorffAlphaNominal(rs.toDF("u", "c"), "u", "c")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    val ref = refAlphaNominal(rs)
    assert(got === ref)
    assert(got._1 === 4L && got._2 === 11L && got._3 === 3L)
  }

  test("krippendorffAlphaNominal reduces EXACTLY to the binary alpha on " +
      "a two-category log") {
    // the shared comparison fixture re-expressed as (unit, category)
    // ratings: unit = unordered pair, category = low/high winner — the
    // binary operator's own derivation
    val cs = comps :+ (("x", "y"))
    val rs = cs.map { case (w, l) =>
      val (i, j) = if (w <= l) (w, l) else (l, w)
      (s"$i|$j", if (w <= l) "low" else "high")
    }
    val nom = Preference.krippendorffAlphaNominal(rs.toDF("u", "c"), "u", "c")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    val bin = Preference.krippendorffAlpha(cs.toDF("w", "l"), "w", "l")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    assert(nom._1 === bin._1 && nom._2 === bin._2)
    assert(nom._4 === bin._5) // identical µ8 disagreement sums
    assert(nom._5 === bin._6) // identical alpha
  }

  // exact BigInt reference for the INTERVAL alpha (squared-difference
  // disagreement in moment form)
  private def refAlphaInterval(
      ratings: Seq[(String, Long)]): (Long, Long, Long, Option[Long]) = {
    val byUnit = ratings.groupBy(_._1).filter(_._2.size >= 2)
    val units = byUnit.values.map { rs =>
      val vs = rs.map(_._2)
      (vs.size.toLong, vs.map(BigInt(_)).sum, vs.map(v => BigInt(v) * v).sum)
    }.toSeq
    val n = units.map(_._1).sum
    val s1 = units.map(_._2).sum
    val s2 = units.map(_._3).sum
    val doSum = units.map { case (nu, u1, u2) =>
      ((BigInt(nu) * u2 - u1 * u1) * 200000000L) / (nu - 1)
    }.sum
    val de = BigInt(n) * s2 - s1 * s1
    val alpha =
      if (de == 0) None
      else Some((BigInt(1000000) -
        doSum * (n - 1) * 1000000L / (de * 200000000L)).toLong)
    (units.size.toLong, n, doSum.toLong, alpha)
  }

  test("krippendorffAlphaInterval matches the BigInt reference on a " +
      "numeric rating log") {
    val rs = Seq(
      ("u1", 5L), ("u1", 7L), ("u1", 6L),
      ("u2", 1L), ("u2", 1L),
      ("u3", 9L), ("u3", 2L), ("u3", 2L), ("u3", 3L),
      ("u4", 4L)) // unpairable
    val got = Preference.krippendorffAlphaInterval(rs.toDF("u", "v"), "u", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(got === refAlphaInterval(rs))
    assert(got._1 === 3L && got._2 === 9L)
  }

  test("krippendorffAlphaInterval on {0,1} ratings IS the binary alpha") {
    // the binary comparison fixture as numeric ratings: unit = pair,
    // value = 1 when the low item won — v² = v makes both moment forms
    // collapse to 2·o1·o2, so all shared columns must agree exactly
    val cs = comps :+ (("x", "y"))
    val rs = cs.map { case (w, l) =>
      val (i, j) = if (w <= l) (w, l) else (l, w)
      (s"$i|$j", if (w <= l) 1L else 0L)
    }
    val iv = Preference.krippendorffAlphaInterval(rs.toDF("u", "v"), "u", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head
    val bin = Preference.krippendorffAlpha(cs.toDF("w", "l"), "w", "l")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    assert(iv._1 === bin._1 && iv._2 === bin._2)
    assert(iv._3 === bin._5) // identical µ8 disagreement sums
    assert(iv._4 === bin._6) // identical alpha
  }

  test("krippendorffAlphaInterval: constant ratings are NULL; squared " +
      "distance punishes far disagreement more than near") {
    val const = Seq(("u1", 3L), ("u1", 3L), ("u2", 3L), ("u2", 3L))
    val g1 = Preference.krippendorffAlphaInterval(const.toDF("u", "v"),
        "u", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(g1._3 === 0L && g1._4 === None)
    // same margins, same units — only the WITHIN-unit spread differs;
    // pairing far values within units must read lower alpha
    val near = Seq(("a", 1L), ("a", 2L), ("b", 9L), ("b", 10L))
    val far = Seq(("a", 1L), ("a", 10L), ("b", 9L), ("b", 2L))
    def alpha(rs: Seq[(String, Long)]) =
      Preference.krippendorffAlphaInterval(rs.toDF("u", "v"), "u", "v")
        .as[(Long, Long, Long, Option[Long])].collect().head._4.get
    assert(alpha(near) > alpha(far))
  }

  test("krippendorffAlphaNominal: single-category log is NULL, perfect " +
      "agreement reads 10^6") {
    val one = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "a"))
    val g1 = Preference.krippendorffAlphaNominal(one.toDF("u", "c"), "u", "c")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(g1._4 === 0L && g1._5 === None)
    val perfect = Seq(("u1", "a"), ("u1", "a"), ("u2", "b"), ("u2", "b"),
      ("u3", "c"), ("u3", "c"))
    val g2 = Preference.krippendorffAlphaNominal(perfect.toDF("u", "c"),
        "u", "c")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(g2._4 === 0L && g2._5 === Some(1000000L))
  }
}
