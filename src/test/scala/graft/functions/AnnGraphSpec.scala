package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic NN-descent graph: recall against brute-force truth on
  * clustered data, refinement actually improving on the LSH init, graph
  * shape invariants, and bit-determinism across partitionings. */
class AnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** 4 well-separated clusters × 40 points, deterministic jitter. */
  private def corpus() = {
    val rows = for {
      c <- 0 until 4
      i <- 0 until 40
    } yield {
      val id = (c * 40 + i).toLong
      val center = Array.tabulate(dim)(d => if (d == c * 2) 10.0f else 1.0f)
      val v = center.zipWithIndex.map { case (x, d) =>
        x + ((id * 31 + d * 17) % 7 - 3).toFloat * 0.05f
      }
      (id, v.toSeq)
    }
    rows.toDF("nid", "nv")
  }

  private def graphOf(rounds: Int, parts: Int = 4) =
    Similarity.nnDescentGraph(corpus().repartition(parts), "nid", "nv",
      k = 5, rounds = rounds, bits = 4, dim = dim, initWindow = 3)

  private def recallOf(rounds: Int): Double = {
    val c = corpus()
    val approx = graphOf(rounds)
      .select(col("node_id").as("query_id"), col("neighbor_id"))
    val exact = Similarity.bruteForceTopK(c, "nid", "nv",
      c.select(col("nid").as("qid"), col("nv").as("qv")), "qid", "qv", k = 5)
    val r = Similarity.recallAtK(approx, exact)
      .agg(sum(col("n_hit")).cast("double") / sum(col("n_exact")))
      .as[Double].head()
    r
  }

  test("refinement rounds monotonically lift recall to the high-recall " +
      "regime (the NN-descent selling point)") {
    val r0 = recallOf(0)
    val r2 = recallOf(2)
    val r4 = recallOf(4)
    assert(r2 > r0, s"refinement did not improve: init=$r0, r2=$r2")
    assert(r4 > r2, s"round 4 did not improve: r2=$r2, r4=$r4")
    assert(r4 >= 0.85, s"recall@5 after 4 rounds = $r4 (r0=$r0, r2=$r2)")
  }

  test("graph shape: every node present, at most k ranked neighbors, " +
      "no self-edges, ranks contiguous from 1") {
    val g = graphOf(2).cache()
    assert(g.filter(col("node_id") === col("neighbor_id")).count() === 0)
    val per = g.groupBy(col("node_id"))
      .agg(count(lit(1)).as("n"), min(col("rank")).as("lo"),
        max(col("rank")).as("hi"))
    assert(per.count() === 160)
    assert(per.filter(col("n") > 5 || col("lo") =!= 1 ||
      col("hi") =!= col("n")).count() === 0)
    g.unpersist()
  }

  test("bit-deterministic across partitionings") {
    val a = graphOf(2, parts = 1).collect().map(_.toString).sorted.toSeq
    val b = graphOf(2, parts = 7).collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
