package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys at scale.
  *
  * AQE's skew-join splitting covers join skew; aggregation skew (one hub
  * key holding a large fraction of rows — the "every lineitem under one
  * order" shape) still funnels a whole key into one reducer. `saltedAgg`
  * breaks that with the standard two-stage trick: aggregate on
  * (key, salt) first — spreading the hot key over `salts` reducers — then
  * merge the partials per key with `AggExpr.merge` semantics.
  *
  * Only mergeable fns make sense here: count/sum/min/max/set/list (the
  * same merge algebra the reference used for its hand-rolled partial
  * aggregation — base/translator.py:283-298).
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of the key columns TOGETHER
    * WITH the spread column. The spread column must vary WITHIN a hot key
    * (a row id, a child FK — anything non-constant per key); a constant
    * spread would leave the hot key on few reducers no matter what is
    * hashed. Hashing the keys alongside decorrelates salt assignment
    * across different hot keys sharing a spread value. */
  def salt(salts: Int, parts: Column*): Column =
    pmod(xxhash64(parts: _*), lit(salts.toLong))

  /** Key-skew diagnostic for a prospective shuffle key — the profiling
    * pass that decides between a plain shuffle, a broadcast, and
    * [[saltedAgg]] BEFORE the expensive job runs. Reports the topK
    * heaviest keys with exact counts, integer-ppm share of all rows,
    * the skew factor vs the mean key (n_rows div mean-rows-per-key —
    * NOT n_rows·n_keys/total, whose product overflows a long once
    * rows×keys passes 2^63, reachable at 100 TB), and a suggested salt
    * fan-out (skew factor clamped to [1, maxSalts] — one reducer per
    * mean-key-worth of rows).
    *
    * One groupBy(key) + a broadcast single-row total; the top-k is
    * `orderBy().limit()` — TakeOrderedAndProject, a per-partition partial
    * top-k then one k-sized merge, so even a billions-of-keys domain
    * never sorts on one reducer. Only the k winners reach the rank
    * window. All ratios are integer (div), so the report is
    * engine-exact. */
  def skewReport(df: DataFrame, key: Column, topK: Int,
                 maxSalts: Long = 256L): DataFrame = {
    val counts = df.groupBy(key.cast("string").as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(sum(col("n_rows")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts.crossJoin(broadcast(totals))
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_rows").desc, col("key").asc)
    top
      .withColumn("share_ppm", expr("(1000000L * n_rows) div total_rows"))
      .withColumn("skew_x",
        expr("n_rows div greatest(total_rows div n_keys, 1L)"))
      .withColumn("suggested_salts",
        least(greatest(col("skew_x"), lit(1L)), lit(maxSalts)))
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("key"), col("n_rows"), col("share_ppm"),
        col("skew_x"), col("suggested_salts"))
  }

  /** Salted equi-join for skewed keys — the manual fallback when AQE's
    * skew-join split cannot help (e.g. the skewed side feeds a window, or
    * the optimizer's stats miss the hub key). The build side is REPLICATED
    * once per salt (explode of a literal sequence — dimension-sized ×
    * salts, still tiny), the probe side gets a stable per-row salt, and
    * the join key becomes (key, salt) — the hub key's rows spread over
    * `salts` reducers instead of funneling into one.
    *
    * Semantics: exactly an inner equi-join on `key` (each probe row meets
    * each matching build row exactly once, under the one salt it drew) —
    * which is what makes it differentially testable against the plain
    * join. Build-side duplicate keys multiply as usual. */
  /** JOIN-skew forecast: before running an equi-join, rank keys by their
    * expected output fanout `left_count × right_count` — the diagnostic
    * that predicts a straggler reducer (one hub key producing 10⁹ rows)
    * while it is still cheap to fix (salt, filter, or pre-aggregate).
    * Two per-key counts + one inner join of the two count frames
    * (key-cardinality-sized, not data-sized) + TakeOrdered top-k. */
  def joinForecast(left: DataFrame, leftKey: Column,
                   right: DataFrame, rightKey: Column,
                   topK: Int): DataFrame = {
    val lc = left.groupBy(leftKey.as("key"))
      .agg(count(lit(1)).as("left_rows"))
    val rc = right.groupBy(rightKey.as("key"))
      .agg(count(lit(1)).as("right_rows"))
    lc.join(rc, Seq("key"))
      .select(col("key"), col("left_rows"), col("right_rows"),
        (col("left_rows").cast("decimal(38,0)") * col("right_rows"))
          .cast("long").as("out_rows"))
      .orderBy(col("out_rows").desc, col("key"))
      .limit(topK)
  }

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 spread: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"bad salts=$salts")
    val p = probe.withColumn("_salt", salt(salts, col(key), spread))
    val b = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage salted aggregation.
    * `aggs` = (outputName, fn, inputColumn) with fn ∈ AggExpr's set.
    * Stage 1 groups by (key..., salt) — hot keys fan out over `salts`
    * partitions; stage 2 merges partials per key. */
  def saltedAgg(df: DataFrame, keys: Seq[String], spread: Column, salts: Int,
                aggs: Seq[(String, String, Column)]): DataFrame = {
    val stage1 = df
      .withColumn("_salt", salt(salts, keys.map(col) :+ spread: _*))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.map { case (n, fn, c) => AggExpr.agg(fn, c).alias(n) }.head,
        aggs.tail.map { case (n, fn, c) => AggExpr.agg(fn, c).alias(n) }: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(aggs.map { case (n, fn, _) => AggExpr.merge(fn, col(n)).alias(n) }.head,
        aggs.tail.map { case (n, fn, _) => AggExpr.merge(fn, col(n)).alias(n) }: _*)
  }
}
