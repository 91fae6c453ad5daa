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
}
