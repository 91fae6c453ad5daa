package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave (driver-side bit math). */
  private def morton(vals: Seq[Long], bits: Int): Long = {
    val n = vals.length
    var z = 0L
    for (i <- vals.indices; j <- 0 until bits)
      z |= ((vals(i) >> j) & 1L) << (j * n + i)
    z
  }

  test("zValue matches the reference interleave on a value grid") {
    val rows = for (a <- 0L to 40L by 7; b <- 0L to 300L by 31) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zValue(Seq(col("a"), col("b")), 16).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === morton(Seq(r.getLong(0), r.getLong(1)), 16),
        s"a=${r.getLong(0)} b=${r.getLong(1)}")
    }
  }

  test("zValue is order-sensitive: columns map to distinct bit lanes") {
    // (a=1, b=0) and (a=0, b=1) must differ — bit lanes don't collide
    val df = Seq((1L, 0L), (0L, 1L)).toDF("a", "b")
      .select(Layout.zValue(Seq(col("a"), col("b")), 4).as("z"))
    assert(df.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("zBucketSpans tightens BOTH columns' spans (the skipping property)") {
    // uniform 64×64 grid; 16 buckets = top-4 z bits = a 4×4 tile grid, so
    // every bucket spans exactly 1/4 of each column's domain
    val rows = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val out = Layout.zBucketSpans(rows.toDF("a", "b"), "a", "b",
      bits = 6, prefixBits = 4).collect()
    assert(out.length === 16)
    out.foreach { r =>
      assert(r.getLong(1) === 64 * 64 / 16) // n_rows per tile
      assert(r.getLong(3) - r.getLong(2) === 15, "a-span must be a 16-tile")
      assert(r.getLong(5) - r.getLong(4) === 15, "b-span must be a 16-tile")
    }
    // a single-column sort would have left b spanning 0..63 in every file
  }

  test("zValue rejects degenerate configs") {
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a")), 16)
    }
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a"), col("b")), 32)
    }
  }
}
