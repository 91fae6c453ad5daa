package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diff — the batch complement of the ETL
  * side's per-index CDC gating (`pipeline/MappingDeps`): given two corpus
  * snapshots, classify every document as added / removed / changed /
  * unchanged by CONTENT (whitespace-normalized md5, the same identity
  * exact dedup uses), so an incremental pipeline re-processes exactly the
  * delta instead of the corpus. A crawl re-fetch that returns byte-
  * different but token-identical text is `unchanged` here — which is the
  * point: downstream features are functions of the normalized tokens.
  *
  * Scale shape: one full-outer equi-join on the document id — fact-to-
  * fact, so it shuffles both sides once on the join key (with id-bucketed
  * snapshot storage the exchange disappears entirely: write snapshots
  * `bucketBy(id)` and the join is zipped partitions). Fingerprints are
  * per-row codegen'd expressions computed in the scan stage; nothing is
  * collected, nothing is quadratic.
  *
  * Output: (idCol, status, old_fp, new_fp) — fps null on the absent side.
  */
object CorpusDelta {

  def snapshotDelta(oldSnap: DataFrame, newSnap: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol),
      TextFunctions.contentFingerprint(col(textCol)).as("old_fp"))
    val n = newSnap.select(col(idCol),
      TextFunctions.contentFingerprint(col(textCol)).as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }
}
