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

  /** Reference Hilbert xy2d — the classic rotate-and-recurse loop the DFA
    * table was derived from. */
  private def xy2d(order: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertValue matches the classic xy2d loop on a value grid") {
    val rows = for (a <- 0L to 300L by 13; b <- 0L to 300L by 17) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.hilbertValue(col("a"), col("b"), 16).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === xy2d(16, r.getLong(0), r.getLong(1)),
        s"a=${r.getLong(0)} b=${r.getLong(1)}")
    }
  }

  test("native graft_hilbert expression is bit-identical to the HOF fold " +
      "and stays inside codegen") {
    val rows = for (a <- 0L to 1000L by 37; b <- 0L to 1000L by 41) yield (a, b)
    val df = rows.toDF("a", "b").select(
      Layout.hilbertValue(col("a"), col("b"), 16).as("native"),
      Layout.hilbertValueHof(col("a"), col("b"), 16).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
    // the dispatch actually picked the native expression (extensions are
    // registered in the shared test session)
    val plan = rows.toDF("a", "b")
      .select(Layout.hilbertValue(col("a"), col("b"), 16))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_hilbert"), plan)
  }

  test("hilbert curve is a bijection that moves one 4-adjacent step") {
    // full 16×16 grid: distances are a permutation of 0..255 and every
    // consecutive pair of curve positions is Manhattan-distance 1 —
    // the locality property Morton does NOT have (quadrant jumps)
    val rows = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(Layout.hilbertValue(col("a"), col("b"), 4).as("h"),
        col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until 256L))
    got.sliding(2).foreach { case Array((_, (ax, ay)), (_, (bx, by))) =>
      assert((ax - bx).abs + (ay - by).abs === 1)
    }
  }

  test("hilbertBucketSpans: 4 buckets tile the grid into exact quadrants") {
    val rows = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val out = Layout.hilbertBucketSpans(rows.toDF("a", "b"), "a", "b",
      bits = 5, prefixBits = 2).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getLong(1) === 32 * 32 / 4)
      assert(r.getLong(3) - r.getLong(2) === 15, "a-span must be a quadrant")
      assert(r.getLong(5) - r.getLong(4) === 15, "b-span must be a quadrant")
    }
  }

  test("rankZorderSpans balances cells under extreme value skew where " +
      "raw z-order crowds one bucket") {
    import spark.implicits._
    // a is pathologically skewed: 99% of mass at tiny values, a long tail
    val rows = (1 to 396).map(i => (i % 4 * 1.0, (i % 16).toDouble)) ++
      Seq((1e9, 0.0), (2e9, 1.0), (3e9, 2.0), (4e9, 3.0))
    val df = rows.toDF("a", "b")
    val out = Layout.rankZorderSpans(df, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // quartile ranks split the 400 rows into balanced cells: no single
    // bucket may hold more than ~2x the even share (400/16 = 25)
    assert(out.values.max <= 100,
      s"rank z-order must not crowd one cell: $out")
    assert(out.values.sum === 400L)
  }

  test("rankZorderSpans plan carries NO percentile aggregate — the " +
      "thresholds are bisected literals (the 100 TB plan is the plan)") {
    val rows = (1 to 100).map(i => (i * 1.5, (i % 10).toDouble))
    val df = Layout.rankZorderSpans(rows.toDF("a", "b"), "a", "b")
    val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("percentile"),
      s"threshold percentile leaked back into the plan:\n$plan")
    assert(df.collect().map(_.getLong(1)).sum === 100L)
  }
}
