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

  /** Common-neighbor link prediction (Liben-Nowell & Kleinberg, CIKM'03)
    * over an undirected graph: candidate pairs are NON-adjacent nodes
    * sharing ≥ 1 neighbor, scored by common-neighbor count and neighbor
    * Jaccard — the crawl-frontier "which hosts probably link soon" / ER
    * "which records probably co-refer" primitive.
    *
    * Scale shape: candidates come from a WEDGE join (adjacency joined to
    * itself on the center node), never from all pairs. A hub of degree d
    * emits d² wedges, so each node's adjacency list is CAPPED at
    * `maxNeighbors` by deterministic order (smallest neighbor first —
    * the hot-bucket cap rule; mirrored in oracles) before the join.
    * Common-neighbor counts are therefore computed over the CAPPED
    * adjacency (a lower bound once the cap binds — the standard screen
    * tradeoff); only the Jaccard DENOMINATOR uses true degrees. Existing
    * edges are removed with one left_anti against the (symmetric) edge
    * set; the global top-k has a total tie-break order.
    *
    * Output: (id_a < id_b, cn, deg_a, deg_b, jaccard_ppm). */
  def linkPredict(edges: DataFrame, src: String, dst: String,
                  maxNeighbors: Int = 64, topK: Int = 20): DataFrame = {
    require(maxNeighbors >= 1 && topK >= 1)
    val und = edges
      .select(col(src).as("u"), col(dst).as("v"))
      .filter(col("u") =!= col("v"))
      .select(explode(array(struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("degree"))
    val capped = und
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("u")).orderBy(col("v"))))
      .filter(col("_rn") <= maxNeighbors)
      .select(col("u"), col("v"))
    val wedges = capped.as("a").join(capped.as("b"), Seq("u"))
      .filter(col("a.v") < col("b.v"))
      .select(col("a.v").as("id_a"), col("b.v").as("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("cn"))
    val cand = wedges.join(und,
        wedges("id_a") === und("u") && wedges("id_b") === und("v"),
        "left_anti")
    val out = cand
      .join(deg.select(col("node").as("id_a"), col("degree").as("deg_a")),
        Seq("id_a"))
      .join(deg.select(col("node").as("id_b"), col("degree").as("deg_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("cn"), col("deg_a"),
        col("deg_b"),
        Sampling.intDiv(col("cn") * lit(1000000L),
          col("deg_a") + col("deg_b") - col("cn")).as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("cn").desc, col("id_a"),
        col("id_b"))
      .limit(topK)
    Frames.sealRelease(out, und)
  }
}
