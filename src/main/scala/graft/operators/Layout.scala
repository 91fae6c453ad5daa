package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout (beyond-parity): interleave the bits
  * of several scan-predicate columns into one clustering key so a SINGLE
  * sort order gives file/row-group min-max pruning on ALL of them at once.
  *
  * Why this matters at 100 TB: parquet skipping is driven by per-file and
  * per-row-group min/max statistics. Sorting by one column makes its
  * ranges tight but leaves every other predicate column spanning the full
  * domain in every file — a filter on the second column reads everything.
  * Z-ordering bounds every participating column's span per file at
  * roughly domain/2^(prefixBits/n), so each of the n columns prunes.
  *
  * Spark shape: the z-value is a pure bit-arithmetic `Column` (codegen'd,
  * no UDF). The write path is `df.repartitionByRange(N, zValue)` followed
  * by `sortWithinPartitions(zValue)` — one range shuffle, after which
  * parquet's own row-group stats do the pruning; no custom reader needed.
  * The interleave is also exactly reproducible in SQL, so the layout
  * decision itself is differentially testable (bucket → span report).
  */
object Layout {

  /** Morton z-value: bit j of `cols(i)` moves to position j*n + i.
    * Columns must be non-negative and fit in `bits` bits (callers
    * rank- or bucket-normalize first at scale; raising `bits` beyond
    * 63/n overflows the long). Pure shift/mask arithmetic — stays inside
    * whole-stage codegen and constant-folds per bit position. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, "zValue needs at least two columns")
    require(bits * n <= 62, s"bits=$bits over $n columns overflows a long")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
      j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** 2D Hilbert-curve transition table as a 16-entry lookup:
    * index = state·4 + xBit·2 + yBit, value = digit·4 + nextState.
    * Derived from (and property-tested against) the classic rotate-and-
    * recurse xy2d algorithm; the DFA form processes bits MSB-first with a
    * 2-bit running state, which is what makes a FOLD implementation
    * possible — the classic loop's coordinate rewriting would otherwise
    * blow up an unrolled expression tree ~5× per bit. */
  private[graft] val hilbertTable: Array[Long] =
    Array(1L, 4L, 14L, 8L, 0L, 15L, 5L, 9L, 10L, 6L, 12L, 3L, 11L, 13L, 7L, 2L)

  /** Hilbert distance of (x, y) on a 2^bits × 2^bits curve — the
    * locality-preserving alternative to [[zValue]]: every curve step moves
    * to a 4-adjacent cell, so equal-size key ranges cover more compact
    * (≈ square) regions than Morton's quadrant jumps, i.e. tighter
    * per-file min/max spans for the same file count.
    *
    * Dispatches to the native codegen'd expression (`graft_hilbert`, a
    * tight 2-long DFA loop inside WholeStageCodegen) when
    * `GraftExtensions` is registered; the `aggregate`-HOF fold
    * ([[hilbertValueHof]]) remains as the extension-free fallback and the
    * bit-parity reference — HOFs evaluate interpreted and materialize a
    * per-row index array, which made layout_hilbert a top-5 bench cost.
    * Columns must be non-negative and fit `bits` bits (same contract as
    * [[zValue]]). */
  def hilbertValue(xc: Column, yc: Column, bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 62, s"bad bits=$bits")
    val registered = org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.catalog.functionExists("graft_hilbert"))
    if (registered)
      call_function("graft_hilbert", xc.cast("long"), yc.cast("long"),
        lit(bits))
    else hilbertValueHof(xc, yc, bits)
  }

  /** The HOF-fold reference implementation of [[hilbertValue]] — one
    * `aggregate` over the bit positions threading the packed
    * (distance, state) accumulator; a single fixed-size expression
    * whatever `bits` is. Kept as the no-extensions fallback and the
    * parity pin for the native expression. */
  private[graft] def hilbertValueHof(xc: Column, yc: Column,
                                     bits: Int): Column = {
    val x = xc.cast("long")
    val y = yc.cast("long")
    // acc packs (d << 2) | state; start d=0, state=0
    val acc = aggregate(
      sequence(lit(bits - 1), lit(0), lit(-1)),
      lit(0L),
      (acc, i) => {
        val ii = i.cast("int")
        val xi = call_function("shiftright", x, ii).bitwiseAND(lit(1L))
        val yi = call_function("shiftright", y, ii).bitwiseAND(lit(1L))
        val idx = acc.bitwiseAND(lit(3L)) * lit(4L) + xi * lit(2L) + yi
        val p = element_at(lit(hilbertTable), (idx + lit(1L)).cast("int"))
        // acc' = (((d << 2) | digit) << 2) | nextState
        shiftleft(shiftleft(shiftright(acc, 2), 2)
          .bitwiseOR(shiftright(p, 2)), 2)
          .bitwiseOR(p.bitwiseAND(lit(3L)))
      })
    shiftright(acc, 2)
  }

  /** [[zBucketSpans]]'s twin for the Hilbert layout: bucket = the top
    * `prefixBits` bits of the Hilbert distance (the files of a range-
    * partitioned hilbert-sorted write), with both columns' min/max per
    * bucket. Same single-shuffle shape; ≤ 2^prefixBits output rows. */
  def hilbertBucketSpans(df: DataFrame, a: String, b: String,
                         bits: Int, prefixBits: Int): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"prefixBits=$prefixBits outside [1, ${2 * bits}]")
    val h = hilbertValue(col(a), col(b), bits)
    df.select(shiftright(h, 2 * bits - prefixBits).as("bucket"),
        col(a), col(b))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(a)).as("min_a"), max(col(a)).as("max_a"),
        min(col(b)).as("min_b"), max(col(b)).as("max_b"))
  }

  /** Per-bucket span report for a two-column z-layout: assign each row the
    * file bucket `z >> (2·bits − prefixBits)` (the top `prefixBits` bits of
    * the curve — exactly the files a range-partitioned z-sorted write
    * produces), then report each bucket's row count and BOTH columns'
    * min/max. Tight spans on both columns = both predicates prune.
    *
    * One shuffle (the groupBy), partial aggregation map-side; output is
    * ≤ 2^prefixBits rows regardless of input size. */
  def zBucketSpans(df: DataFrame, a: String, b: String,
                   bits: Int, prefixBits: Int): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"prefixBits=$prefixBits outside [1, ${2 * bits}]")
    val z = zValue(Seq(col(a), col(b)), bits)
    df.select(shiftright(z, 2 * bits - prefixBits).as("bucket"),
        col(a), col(b))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(a)).as("min_a"), max(col(a)).as("max_a"),
        min(col(b)).as("min_b"), max(col(b)).as("max_b"))
  }

  /** RANK-normalized z-order spans — the skew-proof form of
    * [[zBucketSpans]] and the documented 100 TB prep: raw value
    * interleaving lets a skewed column crowd the curve (most rows share
    * the top bits and one file takes everything), so each column is first
    * bucketed by its own EXACT quartiles into a 2-bit rank, and the CURVE
    * interleaves the ranks. By construction every z cell holds
    * between-the-quantiles mass — balanced files regardless of value
    * distribution.
    *
    * The quartiles come from
    * [[graft.functions.Profile.exactQuantileValues]] — the sort-free
    * value-domain bisection, both columns searched in lock-step over one
    * persisted 2-column µ-unit projection (`floor(v·10⁶)` makes the
    * double columns integral; floor of the bit-identical double is
    * cross-engine-safe). So the thresholds cost ~10 conditional-count
    * scans of a cached long pair — never a single-buffer `percentile`
    * sort — and the final plan is a per-row CASE over LITERAL cut points
    * + bit arithmetic + one bucket aggregate. The oracle-checked plan is
    * itself the 100 TB plan. */
  def rankZorderSpans(df: DataFrame, a: String, b: String): DataFrame = {
    val mu = df.select(col(a), col(b),
      floor(col(a) * lit(1000000d)).as("_ua"),
      floor(col(b) * lit(1000000d)).as("_ub"))
    val qs = Seq(250000L, 500000L, 750000L)
    val th = graft.functions.Profile.exactQuantileValues(
      mu, Seq("_ua", "_ub"), qs)
    def rank(u: Column, c: String): Column =
      when(u <= th((c, qs(0))), 0L)
        .when(u <= th((c, qs(1))), 1L)
        .when(u <= th((c, qs(2))), 2L)
        .otherwise(3L)
    mu.select(col(a), col(b),
        rank(col("_ua"), "_ua").as("_ra"),
        rank(col("_ub"), "_ub").as("_rb"))
      .select(col(a), col(b),
        (shiftleft(shiftright(col("_ra"), 1), 3)
          .bitwiseOR(shiftleft(shiftright(col("_rb"), 1), 2))
          .bitwiseOR(shiftleft(col("_ra").bitwiseAND(lit(1L)), 1))
          .bitwiseOR(col("_rb").bitwiseAND(lit(1L)))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(a)).as("min_a"), max(col(a)).as("max_a"),
        min(col(b)).as("min_b"), max(col(b)).as("max_b"))
  }
}
