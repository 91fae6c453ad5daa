package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-stage aggregation equals direct aggregation") {
    // one hub key with 10k rows, several cold keys
    val df = spark.range(10000).select(lit("hub").as("k"), col("id").as("v"))
      .union(spark.range(50).select(
        concat(lit("cold"), (col("id") % 5).cast("string")).as("k"),
        col("id").as("v")))
    val direct = df.groupBy("k").agg(
        count(when(col("v").isNotNull, 1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val salted = Skew.saltedAgg(df, Seq("k"), spread = col("v"), salts = 16,
        Seq(("n", "count", col("v")), ("s", "sum", col("v")),
          ("mn", "min", col("v")), ("mx", "max", col("v"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted === direct)
  }

  test("salted set aggregation dedups across salt partitions") {
    val df = Seq(("k", "a"), ("k", "b"), ("k", "a"), ("k", "c")).toDF("k", "v")
    val r = Skew.saltedAgg(df, Seq("k"), spread = col("v"), salts = 4,
      Seq(("st", "set", col("v")))).collect()(0)
    assert(r.getSeq[String](1) === Seq("a", "b", "c"))
  }

  test("skewReport: exact shares, skew factor, and suggested salts") {
    // 90 hot + 5 + 5 rows over 3 keys: mean key = 33 rows
    val df = (Seq.fill(90)("hot") ++ Seq.fill(5)("a") ++ Seq.fill(5)("b"))
      .toDF("k")
    val rows = Skew.skewReport(df, col("k"), topK = 10)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows(0) === ((1, "hot", 90L, 900000L, 2L, 2L))) // 90·3/100 = 2
    assert(rows(1) === ((2, "a", 5L, 50000L, 0L, 1L)))     // below-mean → 1
    assert(rows(2) === ((3, "b", 5L, 50000L, 0L, 1L)))     // tie → key asc
    assert(rows.length === 3)
  }

  test("saltedJoin equals the plain inner join, incl. dup build keys " +
      "and dropped probe keys") {
    val probe = Seq((1L, "hot"), (2L, "hot"), (3L, "cold"), (4L, "gone"))
      .toDF("id", "k")
    val build = Seq(("hot", 10L), ("hot", 20L), ("cold", 30L))
      .toDF("k", "v")
    val salted = Skew.saltedJoin(probe, build, "k", col("id"), salts = 4)
      .select("id", "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    val plain = probe.join(build, Seq("k")).select("id", "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(salted === plain)
    assert(salted.count(_._2 == "hot") === 4) // 2 probe × 2 build rows
  }

  test("saltedJoin spreads a hub key over multiple salt lanes") {
    val probe = (1L to 200L).map(i => (i, "hub")).toDF("id", "k")
    val lanes = probe
      .withColumn("_salt", Skew.salt(8, col("k"), col("id")))
      .select("_salt").distinct().count()
    assert(lanes >= 6, s"expected the hub rows on most of 8 lanes, got $lanes")
  }

  test("skewReport clamps suggested salts to maxSalts and honors topK") {
    val df = (Seq.fill(1000)("mega") ++ (0 until 10).map(i => s"c$i"))
      .toDF("k")
    val rows = Skew.skewReport(df, col("k"), topK = 2, maxSalts = 8)
      .collect()
    assert(rows.length === 2)
    // mega: 1000·11/1010 = 10 → clamped to 8
    assert(rows(0).getString(1) === "mega")
    assert(rows(0).getLong(5) === 8L)
  }

  test("joinForecast: fanout = left x right per key, ranked desc, " +
      "keys missing on either side drop") {
    import spark.implicits._
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")      // counts 3, 1, 1
    val r = Seq(1L, 1L, 2L, 2L, 2L, 7L).toDF("k")  // counts 2, 3, 1
    val rows = Skew.joinForecast(l, $"k", r, $"k", topK = 10).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // key 1: 3×2=6; key 2: 1×3=3; keys 3 and 7 have no partner
    assert(rows.toSeq === Seq((1L, 3L, 2L, 6L), (2L, 1L, 3L, 3L)))
  }
}
