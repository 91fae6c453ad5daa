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
