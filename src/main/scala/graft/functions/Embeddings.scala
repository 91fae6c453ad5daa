package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column health profiling (beyond-parity): the monitoring pass
  * a vector pipeline runs before trusting a new embedding batch — dead or
  * collapsed dimensions, per-dimension drift, exploded scales.
  *
  * Everything is integer-exact: components quantize to micro-units
  * (`round(x·10⁶)` — float→double widening is exact and the rounded
  * product is engine-identical), sums ride DECIMAL(38,0) (order-free, no
  * fp accumulation drift), and derived moments are floor divisions. So
  * the profile hash-matches any other engine and is invariant to
  * partitioning / speculative re-execution.
  *
  * Scale: one posexplode (rows × dims) feeding one hash aggregate with
  * `dims` groups — partial aggregation collapses every task to ≤ dims
  * partial rows, so the shuffle moves O(tasks · dims) tiny rows no matter
  * the corpus size. No window, no join, no driver state. */
object Embeddings {

  /** Per-dimension moments: (dim, n, mean_us, var_us2, min_us, max_us,
    * n_zero). `var_us2` is the population variance in (micro-unit)² —
    * computed as (n·Σx² − (Σx)²) div n², entirely in DECIMAL so the
    * squared sums cannot overflow or round. A dimension with
    * `var_us2 = 0` is dead; `n_zero = n` means it is exactly zero. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame = {
    val vUs = round(col("_v").cast("double") * lit(1000000d), 0)
      .cast("long")
    val expl = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "_v")))
      .select(col("dim").cast("long").as("dim"), vUs.as("v_us"))
    val dec = col("v_us").cast("decimal(38,0)")
    val agg = expl.groupBy(col("dim")).agg(
      count(lit(1)).as("n"),
      sum(dec).as("_s"),
      sum(dec * col("v_us")).as("_sq"),
      min(col("v_us")).as("min_us"),
      max(col("v_us")).as("max_us"),
      count(when(col("v_us") === 0, 1)).as("n_zero"))
    val n = col("n").cast("decimal(38,0)")
    agg.select(
      col("dim"), col("n"),
      Sampling.intDiv(col("_s"), n).as("mean_us"),
      Sampling.intDiv(n * col("_sq") - col("_s") * col("_s"), n * n)
        .as("var_us2"),
      col("min_us"), col("max_us"), col("n_zero"))
  }
}
