package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded synchronous label propagation (Raghavan et al. 2007) over the
  * near-duplicate candidate graph (beyond-parity) — community detection
  * that, unlike connected components, respects DENSITY: a chain of
  * borderline matches bridging two dense duplicate families splits into
  * two communities (each node adopts its neighborhood's majority label)
  * where [[Dedup.connectedComponents]] would collapse the lot into one.
  * The two reports together are the standard dedup audit: CC for the
  * conservative merge, LPA for "is this component actually one family?".
  *
  * Determinism (LPA is notoriously order-dependent; this one is not):
  *   - synchronous rounds — every update reads the PREVIOUS round's
  *     labels, never a mix;
  *   - argmax tie-break is total: highest neighbor-label count first,
  *     then smallest label;
  *   - a fixed round budget (not convergence) — label oscillation, the
  *     classic synchronous-LPA failure, cannot prevent termination and
  *     every engine computes the identical fixed trajectory.
  *
  * Scale: per round one equi-join of the edge list against the label
  * frame (both keyed/shuffled on node id) and two hash aggregates whose
  * map-side partials bound the shuffle by the per-task distinct
  * (node, label) count. Lineage is truncated every round (the iterative-
  * DataFrame rule); the edge list is checkpointed once and reused. Input
  * is the CANDIDATE pair frame — already bounded by the dedup caps —
  * never the corpus. */
object Lpa {

  /** (id, community) for every node of the pair graph after `rounds`
    * synchronous label-propagation rounds. */
  def communities(pairs: DataFrame, idA: String, idB: String,
                  rounds: Int): DataFrame = {
    require(rounds >= 1, s"bad rounds=$rounds")
    val und = pairs
      .select(least(col(idA), col(idB)).as("u"),
        greatest(col(idA), col(idB)).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
    val sym = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .transform(Frames.truncate)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .transform(Frames.truncate)
    for (_ <- 1 to rounds) {
      val neigh = sym
        .join(labels.select(col("id").as("dst"), col("lbl").as("nlbl")),
          Seq("dst"))
        .groupBy(col("src"), col("nlbl")).agg(count(lit(1)).as("c"))
      // majority neighbor label, smallest-label tie-break (total order)
      val top = neigh.groupBy(col("src"))
        .agg(max_by(col("nlbl"), struct(col("c"), -col("nlbl"))).as("_new"))
      labels = labels
        .join(top.select(col("src").as("id"), col("_new")), Seq("id"),
          "left_outer")
        .select(col("id"), coalesce(col("_new"), col("lbl")).as("lbl"))
        .transform(Frames.truncate)
    }
    labels.select(col("id"), col("lbl").as("community"))
  }
}
