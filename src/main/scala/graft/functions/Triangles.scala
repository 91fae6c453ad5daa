package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting over an undirected pair graph (beyond-parity)
  * — the local-clustering signal that separates a tight near-duplicate
  * family (template + all its copies, pairwise-similar) from a chain of
  * transitive borderline matches. On the dedup candidate graph a node in
  * many triangles sits inside a dense family; a bridge node with edges but
  * no triangles is the false-positive shape worth auditing before a whole
  * component is collapsed.
  *
  * Algorithm: degree-ordered orientation (Suri & Vassilvitskii WWW'11) —
  * each undirected edge points from its lower-(degree, id) endpoint to the
  * higher one, so every wedge is enumerated at its lowest-degree apex and
  * a hub of degree d generates O(d) oriented out-edges spread over its
  * neighbors instead of O(d²) wedges at itself ("the curse of the last
  * reducer"). Each triangle is found exactly once: it has exactly one
  * vertex with out-edges to the other two in the orientation.
  *
  * Cost: two joins (wedge build on the oriented apex, wedge close against
  * the canonical edge set) + one explode/groupBy for per-node counts. The
  * input is a CANDIDATE pair frame (already bounded by the dedup caps) —
  * never the corpus. */
object Triangles {

  /** Per-node triangle participation counts. `pairs` must be canonical
    * undirected edges (idA < idB, distinct). Output: (node, n_triangles)
    * for nodes in ≥ 1 triangle. */
  def perNode(pairs: DataFrame, idA: String, idB: String): DataFrame = {
    // the edge set feeds THREE consumers (degrees, orientation, the wedge-
    // closing join) — persist it or the upstream candidate pipeline runs
    // three times (the PageRank persist rule)
    val und = pairs.select(col(idA).as("u"), col(idB).as("v")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("_du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("_dv")), Seq("v"))
      .select(
        when(col("_du") < col("_dv") ||
          (col("_du") === col("_dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst")))
          .as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
    val wedges = oriented.as("a")
      .join(oriented.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.src").as("apex"), col("a.dst").as("x"),
        col("b.dst").as("y"))
    // the closing edge is looked up in CANONICAL orientation: x < y holds
    // by the wedge's own ordering
    val tris = wedges.join(und,
      wedges("x") === und("u") && wedges("y") === und("v"))
    tris
      .select(explode(array(col("apex"), col("x"), col("y"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
