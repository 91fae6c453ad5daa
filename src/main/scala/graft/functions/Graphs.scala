package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded traversal analytics over an undirected pair graph
  * (beyond-parity) — companions of the dedup candidate graph built by
  * `Dedup.ngramJaccardPairs`/`lshCandidates`. These answer the two
  * questions a takedown / contamination audit asks: "which documents sit
  * within k near-dup hops of a flagged set" (blast radius) and "how is
  * connectivity distributed" (degree histogram — a heavy tail means a few
  * boilerplate hubs dominate the candidate volume).
  *
  * Both take the PAIR frame, never the corpus; every round is one
  * join + one distinct with per-round `localCheckpoint` lineage
  * truncation (the componentsFromPairs rule). */
object Graphs {

  /** Minimal hop distance (≤ `rounds`) from a seed set over undirected
    * edges — BFS as `rounds` frontier expansions. The bounded round count
    * is the declared semantics (the PageRank-iters pattern), which keeps
    * an external SQL oracle able to unroll the exact same rounds; at a
    * 100 TB graph the frontier join shuffles pair-frame-sized data per
    * round and nothing is ever collected.
    *
    * Output: (node, dist) for every reached node, dist 0 = seed. Seeds
    * not present in the edge set still appear at dist 0 (flagged docs
    * with no near-dups are still flagged). */
  def bfsDistances(pairs: DataFrame, idA: String, idB: String,
                   seeds: DataFrame, seedCol: String,
                   rounds: Int = 3): DataFrame = {
    val und = pairs
      .select(col(idA).as("u"), col(idB).as("v"))
      .filter(col("u") =!= col("v"))
    val nbrs = und.union(und.select(col("v"), col("u"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var visited = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .transform(Frames.truncate)
    var frontier = visited
    var r = 1
    while (r <= rounds) {
      val next = nbrs.join(frontier.withColumnRenamed("node", "u"), Seq("u"))
        .select(col("v").as("node"))
        .distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(r.toLong))
        .transform(Frames.truncate)
      visited = visited.union(next).transform(Frames.truncate)
      frontier = next
      r += 1
    }
    nbrs.unpersist(false)
    visited
  }

  /** LOCAL BRIDGES of the pair graph: edges whose endpoints share NO
    * common neighbor — on a near-dup candidate graph these are exactly
    * the chain links that merge two otherwise-unrelated families when
    * components are collapsed (the transitive-merge risk the k-core and
    * triangle reports approach from the density side; this is the
    * per-edge audit list). An edge is in a triangle iff its endpoints
    * share a neighbor, so bridges = edges ∖ triangle-edges: one
    * wedge join (degree-bounded by the candidate caps upstream) + one
    * anti-join. Output: (id_a < id_b) bridge edges. */
  def localBridges(pairs: DataFrame, idA: String,
                   idB: String): DataFrame = {
    val und = pairs
      .select(least(col(idA), col(idB)).as("u"),
        greatest(col(idA), col(idB)).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nbrs = und.union(und.select(col("v"), col("u")))
    val sharing = nbrs.as("a")
      .join(nbrs.as("b"), col("a.v") === col("b.v") &&
        col("a.u") < col("b.u"))
      .select(col("a.u").as("u"), col("b.u").as("v"))
      .distinct()
    val out = und.join(sharing, Seq("u", "v"), "left_anti")
      .select(col("u").as("id_a"), col("v").as("id_b"))
    // bridge edges are bounded by the (cap-bounded) pair-graph edge count
    Frames.sealRelease(out, und)
  }

  /** Log₂-bucketed degree histogram of the pair graph: bucket b holds
    * nodes with degree in [2^(b-1), 2^b). The bucket id is
    * `length(bin(degree))` — a pure string-length-of-binary expression
    * both engines share, no libm log anywhere. One degree aggregation +
    * one |buckets|-sized aggregate; output is corpus-size-independent. */
  def degreeHistogram(pairs: DataFrame, idA: String,
                      idB: String): DataFrame = {
    val und = pairs
      .select(least(col(idA), col(idB)).as("u"),
        greatest(col(idA), col(idB)).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg
      .groupBy(length(bin(col("degree"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("degree")).as("min_degree"),
        max(col("degree")).as("max_degree"))
  }
}
