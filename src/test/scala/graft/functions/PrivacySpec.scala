package graft.functions

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // quasi group ("a", 1): 3 rows, 2 sensitive values
    ("a", 1L, "en"), ("a", 1L, "en"), ("a", 1L, "de"),
    // quasi group ("a", 2): 5 rows, all same sensitive value
    ("a", 2L, "en"), ("a", 2L, "en"), ("a", 2L, "en"),
    ("a", 2L, "en"), ("a", 2L, "en"),
    // quasi group ("b", 1): singleton
    ("b", 1L, "zh")
  ).toDF("src", "bucket", "lang")

  test("kAnonymityReport flags small groups and homogeneous groups") {
    val out = Privacy.kAnonymityReport(rows, Seq("src", "bucket"), "lang",
        k = 3, l = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("a", 1L)) === ((3L, 2L, 0L)))  // big enough, diverse enough
    assert(out(("a", 2L)) === ((5L, 1L, 1L)))  // homogeneity attack: l < 2
    assert(out(("b", 1L)) === ((1L, 1L, 1L)))  // re-identifiable: n < 3
  }

  test("constant sensitive + l = 1 degrades to pure k-anonymity") {
    val out = Privacy.kAnonymityReport(
        rows.withColumn("c", org.apache.spark.sql.functions.lit("x")),
        Seq("src", "bucket"), "c", k = 3, l = 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(out(("a", 1L)) === 0L)
    assert(out(("a", 2L)) === 0L)
    assert(out(("b", 1L)) === 1L)  // only the singleton is at risk
  }

  test("empty quasiCols is rejected") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(rows, Nil, "lang", 3, 2)
    }
  }

  test("deleteImpact: per-table affected counts with duplicate subjects " +
      "collapsed; untouched table reports zero") {
    import spark.implicits._
    val victims = Seq(1L, 1L, 2L).toDF("uid") // dup in the request list
    val ev = Seq(1L, 1L, 2L, 3L, 4L).toDF("user_id")
    val other = Seq(7L, 8L).toDF("k")
    val out = Privacy.deleteImpact(Seq(
        ("ev", ev, "user_id"), ("other", other, "k")), victims, "uid")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 3 of 5 event rows reference subjects 1/2 → floor(3e6/5)
    assert(out("ev") === ((5L, 3L, 600000L)))
    assert(out("other") === ((2L, 0L, 0L)))
  }

  test("pseudonymize: stable salted tokens preserve joins across tables; " +
      "salts and digest modes differ; separator kills ambiguity") {
    import spark.implicits._
    val ev = Seq((1L, "click"), (1L, "buy"), (2L, "click"))
      .toDF("user_id", "event_type")
    val cust = Seq((1L, "Ann"), (2L, "Bo"), (3L, "Cy"))
      .toDF("user_id", "name")
    val pEv = Privacy.pseudonymize(ev, Seq("user_id"), "s1")
    val pCust = Privacy.pseudonymize(cust, Seq("user_id"), "s1")
    // referential integrity survives: the join keys still line up
    val joined = pEv.join(pCust, "user_id")
    assert(joined.count() === 3L)
    assert(joined.filter($"name" === "Ann").count() === 2L)
    // the raw id is gone and the token is the md5 prefix of salt␁id
    val tok1 = pCust.filter($"name" === "Ann").select("user_id")
      .as[String].head()
    val md5s1 = java.security.MessageDigest.getInstance("MD5")
      .digest("s1\u00011".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(tok1 === md5s1.take(15))
    // a different salt yields disjoint tokens (no cross-export linkage)
    val pOther = Privacy.pseudonymize(cust, Seq("user_id"), "s2")
    assert(pOther.join(pCust, "user_id").count() === 0L)
    // full-digest mode keeps all 32 hex chars
    val full = Privacy.pseudonymize(cust, Seq("user_id"), "s1",
      fullDigest = true).select("user_id").as[String].collect()
    assert(full.forall(_.length === 32))
    // separator: (salt "a", id "bc") never collides with (salt "ab", "c")
    val x = Privacy.pseudonymize(Seq("bc").toDF("id"), Seq("id"), "a")
      .as[String].head()
    val y = Privacy.pseudonymize(Seq("c").toDF("id"), Seq("id"), "ab")
      .as[String].head()
    assert(x !== y)
  }

  test("dpNoiseTable: thresholds strictly increase, cover the 48-bit " +
      "space, and match the two-sided geometric shape") {
    val eps = 693147L // ln 2 => alpha = 0.5
    val t = Privacy.dpNoiseTable(eps)
    assert(t.last._1 === (1L << 48))
    assert(t.map(_._1) === t.map(_._1).sorted)
    assert(t.map(_._1).distinct.size === t.size)
    // noise values strictly increase and both tails reach deep (rows the
    // 48-bit draw cannot resolve are dropped, so the ends may trim)
    val ks = t.map(_._2)
    assert(ks === ks.sorted && ks.distinct.size === ks.size)
    assert(ks.head <= -40L && ks.last >= 40L, s"${ks.head}..${ks.last}")
    // P(0) mass = (1-a)/(1+a) = 1/3 at alpha = 1/2, within table rounding
    val widths = t.map(_._1).zip(0L +: t.map(_._1)).map { case (h, l) => h - l }
    val p0 = widths(ks.indexOf(0L)).toDouble / (1L << 48)
    assert(math.abs(p0 - 1.0 / 3) < 1e-6, s"p0=$p0")
  }

  test("dpNoisyCounts: deterministic per (key, salt), fresh draw under a " +
      "fresh salt, clamped at zero, noise bounded by the table support") {
    val eps = 693147L
    val rows = (1 to 400).flatMap(k => Seq.fill(3)(s"key$k")).toDF("k")
    val out1 = Privacy.dpNoisyCounts(rows, Seq("k"), "salt-a", eps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out2 = Privacy.dpNoisyCounts(rows, Seq("k"), "salt-a", eps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out1 === out2) // replayable release
    val outB = Privacy.dpNoisyCounts(rows, Seq("k"), "salt-b", eps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out1 !== outB) // a new salt is a new draw
    val kMax = Privacy.dpNoiseTable(eps).last._2
    val noises = out1.values.map(_ - 3L)
    assert(noises.forall(n => n >= -3L && n <= kMax)) // clamp floor is 0
    // the draw is roughly centred: mean |noise| for alpha=.5 is ~1
    val meanAbs = noises.map(n => math.abs(n).toDouble).sum / noises.size
    assert(meanAbs < 3.0, s"meanAbs=$meanAbs")
  }
}
