package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic one-scan column profiler (beyond-parity) — the "what is in this
  * table" report an ingest pipeline runs on every new source before
  * wiring it into a mixture: per column, null count, distinct count, and
  * min/max. The whole profile is ONE aggregation over one scan; the
  * per-column fan-out to rows happens AFTER aggregation on a single-row
  * frame (the corpus_checks shape), so the corpus is never re-read per
  * column.
  *
  * min/max aggregate on the column's NATIVE type (lexicographic-on-string
  * would mis-order numerics) and cast to string only for the report.
  * `approx = true` swaps the exact distincts for HLL sketches — the
  * 100 TB default, same policy as `Sampling.corpusStats`: the exact mode
  * multiplies the scan through Catalyst's Expand (one stream per distinct
  * column), which is the oracle-checkable small-SF mode only. */
object Profile {

  def columnProfile(df: DataFrame, cols: Seq[String],
                    approx: Boolean = false): DataFrame = {
    def distinctOf(c: Column) =
      if (approx) approx_count_distinct(c) else count_distinct(c)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_n_$c"),
        distinctOf(col(c)).as(s"_d_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val all = count(lit(1)).as("_rows") +: aggs
    val wide = df.agg(all.head, all.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("_rows").as("n_rows"),
        (col("_rows") - col(s"_n_$c")).as("n_nulls"),
        col(s"_d_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"),
        col(s"_max_$c").as("max_value"))
    }
    wide.select(explode(array(rows: _*)).as("_p")).select(col("_p.*"))
  }

  /** EXACT quantiles of an integral column WITHOUT a sort — the scale
    * answer to "exact percentile needs a single-buffer sort" (the cost
    * dominating layout_rank_zorder's oracle mode, and the reason
    * `approx_percentile` is this engine's documented 100 TB default when
    * approximation is acceptable; this operator is for when it is NOT —
    * billing thresholds, SLA cut-offs, contractual percentiles).
    *
    * Semantics: the type-1 (lower) sample quantile — the k-th order
    * statistic with k = max(1, ⌈q·n⌉) — an actual data value, no
    * interpolation, so it is engine-exact by construction (DuckDB twin:
    * `ORDER BY v LIMIT 1 OFFSET k−1`).
    *
    * Algorithm: driver-side bisection on the VALUE domain. One pass
    * computes (n, min, max); then each round runs ONE conditional-count
    * aggregate (`count(v ≤ mid_q)` for every still-open quantile
    * simultaneously — a single scan regardless of |qs|) and halves each
    * bracket toward the smallest value whose rank reaches k. ⌈log₂
    * range⌉ rounds — ≤ 63 ever, ~30-40 for micro-unit money domains —
    * each a map-side-combined scalar aggregate: no shuffle beyond the
    * 1-row fold, no sort anywhere, driver state is |qs| scalar brackets.
    * At 100 TB that is ~35 cheap scans vs one impossible global sort —
    * and the scans drop to ~10 if the caller pre-filters to a coarse
    * histogram bucket first.
    *
    * Output: (q_ppm, k, value), |qs| rows, ordered by q_ppm. */
  def exactQuantilesBisect(df: DataFrame, valueCol: String,
                           qsPpm: Seq[Long]): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 1 && q <= 1000000),
      s"quantiles must be in (0, 1] ppm: $qsPpm")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("long")
    val base = df.select(v.as("_v")).filter(col("_v").isNotNull)
    val head = base.agg(count(lit(1)), min(col("_v")), max(col("_v")))
      .collect()(0)
    val n = head.getLong(0)
    if (n == 0) return Seq.empty[(Long, Long, Long)]
      .toDF("q_ppm", "k", "value")
    // k = max(1, ceil(q·n/10⁶)) in exact integer arithmetic
    val ks = qsPpm.map(q => math.max(1L, (q * n + 999999L) / 1000000L))
    var lo = Array.fill(qsPpm.size)(head.getLong(1))
    var hi = Array.fill(qsPpm.size)(head.getLong(2))
    while (lo.indices.exists(i => lo(i) < hi(i))) {
      val open = lo.indices.filter(i => lo(i) < hi(i))
      // one scan counts every open bracket's midpoint simultaneously
      val mids = open.map { i =>
        // floor midpoint, safe for any long range (no (lo+hi)/2 overflow)
        lo(i) + (hi(i) - lo(i)) / 2
      }
      val counts = base.agg(
          count(when(col("_v") <= mids.head, 1)),
          open.tail.zipWithIndex.map { case (_, j) =>
            count(when(col("_v") <= mids(j + 1), 1)) }: _*)
        .collect()(0)
      open.zipWithIndex.foreach { case (i, j) =>
        // rank(mid) ≥ k ⇒ the k-th order statistic is ≤ mid
        if (counts.getLong(j) >= ks(i)) hi(i) = mids(j)
        else lo(i) = mids(j) + 1
      }
    }
    qsPpm.indices.map(i => (qsPpm(i), ks(i), lo(i)))
      .toDF("q_ppm", "k", "value")
      .orderBy(col("q_ppm"))
  }

  /** GROUPED [[exactQuantilesBisect]] for BOUNDED-cardinality group
    * columns (languages, sources, priorities — driver state is one
    * bracket per (group, quantile), so |groups| must be driver-small;
    * an unbounded group column wants the per-group percentile window
    * instead). Each round is still ONE scan: a single aggregate carrying
    * a conditional counter per open (group, quantile) pair, map-side
    * combined. Replaces the "grouped exact percentile needs a per-group
    * sort buffer" cost for dashboard-grade exact cuts at corpus scale.
    * Output: (group, q_ppm, k, value) ordered by (group, q_ppm). */
  def exactQuantilesBisectByGroup(df: DataFrame, groupCol: String,
                                  valueCol: String,
                                  qsPpm: Seq[Long]): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 1 && q <= 1000000),
      s"quantiles must be in (0, 1] ppm: $qsPpm")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("_g"),
        col(valueCol).cast("long").as("_v"))
      .filter(col("_g").isNotNull && col("_v").isNotNull)
    val heads = base.groupBy(col("_g"))
      .agg(count(lit(1)), min(col("_v")), max(col("_v")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .sortBy(_._1)
    case class Bracket(g: String, qPpm: Long, k: Long,
                       var lo: Long, var hi: Long)
    val brackets = for {
      (g, (n, mn, mx)) <- heads.toSeq
      q <- qsPpm
    } yield Bracket(g, q, math.max(1L, (q * n + 999999L) / 1000000L), mn, mx)
    while (brackets.exists(b => b.lo < b.hi)) {
      val open = brackets.filter(b => b.lo < b.hi)
      val mids = open.map(b => b.lo + (b.hi - b.lo) / 2)
      val counters = open.zip(mids).map { case (b, m) =>
        count(when(col("_g") === lit(b.g) && col("_v") <= lit(m), 1))
      }
      val row = base.agg(counters.head, counters.tail: _*).collect()(0)
      open.zip(mids).zipWithIndex.foreach { case ((b, m), j) =>
        if (row.getLong(j) >= b.k) b.hi = m else b.lo = m + 1
      }
    }
    brackets.map(b => (b.g, b.qPpm, b.k, b.lo))
      .toDF(groupCol, "q_ppm", "k", "value")
      .orderBy(col(groupCol), col("q_ppm"))
  }
}
