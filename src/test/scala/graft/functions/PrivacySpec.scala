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
}
