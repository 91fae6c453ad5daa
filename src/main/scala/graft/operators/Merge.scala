package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO (SCD type-1 upsert) as a SNAPSHOT REWRITE — the Spark-first
  * form of the warehouse staple that open-source Spark only offers
  * through table formats: instead of mutating rows in place, one
  * full-outer join on the key produces the next snapshot, which is the
  * shape that scales (per-row mutation APIs serialize; a join
  * repartitions both sides once and writes straight through).
  *
  * Semantics per output row:
  *   matched        → shared non-key columns take the UPDATE's value
  *                    when non-null, else carry the target's
  *                    (null-in-update means "no change", the SCD-1 rule);
  *   update-only    → inserted (target-only columns null);
  *   target-only    → carried forward (update-only columns null).
  * Column set = target ∪ update columns, target order first. Updates
  * must be key-unique (pre-aggregate a change log with e.g. max_by —
  * a duplicate update key would fan the join out). */
object Merge {
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(target.columns.contains(key) && updates.columns.contains(key),
      s"merge key $key must exist on both sides")
    val t = target.as("_t")
    val u = updates.as("_u")
    val tCols = target.columns.filterNot(_ == key)
    val uCols = updates.columns.filterNot(_ == key)
    val outCols = col(key) +: (
      tCols.map { c =>
        if (uCols.contains(c))
          coalesce(col(s"_u.$c"), col(s"_t.$c")).as(c)
        else col(s"_t.$c").as(c)
      } ++ uCols.filterNot(tCols.contains).map(c => col(s"_u.$c").as(c)))
    t.join(u, Seq(key), "full_outer").select(outCols: _*)
  }
}
