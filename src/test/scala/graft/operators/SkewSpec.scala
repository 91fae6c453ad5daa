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
}
