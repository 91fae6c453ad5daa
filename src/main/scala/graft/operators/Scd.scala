package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history building (beyond-parity): turn
  * a stream of per-key state OBSERVATIONS into versioned rows with
  * validity ranges — the dimension-table shape every warehouse join
  * expects, and the gaps-and-islands collapse that deduplicates repeated
  * observations of the same state.
  *
  * One window sort per key does everything: lag detects state changes
  * (null-safe, so null-valued state columns collapse correctly), lead
  * assigns each surviving change-row its successor's timestamp as the
  * exclusive end of validity. Cost is a single shuffle on the key plus a
  * per-key sort — the same shape as sessionization; per-key skew equals
  * that key's observation count. */
object Scd {

  /** Type-2 history. `obs` must be unique per (key, tsUs) — pre-reduce
    * multi-observations (the query layer aggregates per day first).
    *
    * Output: (key, stateCols…, valid_from_us, valid_to_us, is_current)
    * with [valid_from_us, valid_to_us) half-open, the current row's
    * valid_to_us null, is_current as 0/1. */
  def history(obs: DataFrame, key: String, tsUs: String,
              stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "stateCols must be non-empty")
    val w = Window.partitionBy(key).orderBy(tsUs)
    val state = struct(stateCols.map(col): _*)
    val changed = obs
      .withColumn("_keep", not(lag(state, 1).over(w) <=> state))
      .filter(col("_keep"))
    changed
      .withColumn("valid_from_us", col(tsUs))
      .withColumn("valid_to_us", lead(col(tsUs), 1).over(w))
      .withColumn("is_current",
        col("valid_to_us").isNull.cast("long"))
      .select((key +: stateCols).map(col) ++
        Seq(col("valid_from_us"), col("valid_to_us"), col("is_current")): _*)
  }

  /** Latest-wins UPSERT (the MERGE INTO shape): base ∪ updates, one row
    * per key, highest `versionCol` wins. The pick is a single
    * `max(struct(version, payload))` hash aggregate — no per-key sort
    * window, so a hot key is just a big aggregation group; version ties
    * fall through to the payload's lexicographic order (deterministic,
    * never engine-dependent). Both frames must share the base's schema. */
  def upsertLatest(base: DataFrame, updates: DataFrame,
                   keyCols: Seq[String], versionCol: String): DataFrame = {
    val payloadCols = base.columns.filterNot(keyCols.contains).toSeq
    val payload = struct(payloadCols.map(col): _*)
    base.unionByName(updates)
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col(versionCol).as("_v"), payload.as("_p"))).as("_b"))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"_b._p.$c").as(c)): _*)
  }
}
