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
}
