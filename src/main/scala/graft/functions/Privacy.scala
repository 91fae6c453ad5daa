package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk profiling for training corpora (beyond-parity): before a
  * corpus ships to training, quantify re-identification risk from its
  * released metadata — k-anonymity (Sweeney 2002) over the quasi-identifier
  * columns, plus distinct-l diversity (Machanavalli et al. 2007) of a
  * sensitive attribute inside each quasi-identifier group.
  *
  * A row is k-anonymous if at least k−1 other rows share its full
  * quasi-identifier tuple; a group is l-diverse if the sensitive attribute
  * takes ≥ l distinct values inside it. Groups failing either bound are
  * the ones to generalize (coarsen a bucket), suppress, or drop before
  * release — the report names them directly.
  *
  * Scale shape: one hash aggregation over the quasi tuple (map-side
  * partial on count; count_distinct adds the standard distinct expand but
  * only over the grouped frame), output is |distinct quasi tuples| rows —
  * corpus-size-independent for bounded-cardinality identifiers. No
  * windows, no joins, no driver-side state.
  */
object Privacy {

  /** Per-quasi-group anonymity report: (quasiCols…, group_n, l_distinct,
    * at_risk) where at_risk = 1 iff group_n < k OR l_distinct < l.
    * `sensitive` is the attribute whose within-group diversity protects
    * against homogeneity attacks (pass a constant column and l = 1 to run
    * pure k-anonymity). */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitive: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        count_distinct(col(sensitive)).as("l_distinct"))
      .withColumn("at_risk",
        (col("group_n") < k || col("l_distinct") < l).cast("long"))
  }
}
