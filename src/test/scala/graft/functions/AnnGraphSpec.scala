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

  test("realistic-corpus floor: the production build config (buildK=20, " +
      "initWindow=8, 2 rounds) reaches recall >= 0.6 on the near-random " +
      "driver embeddings — the regime where a k-wide frontier saturates " +
      "at ~0.25") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val g = Similarity.nnDescentGraph(c, "nid", "nv", k = 5, rounds = 2,
        bits = 4, dim = 64, initWindow = 8, buildK = 20)
      .select(col("node_id").as("query_id"), col("neighbor_id"))
    val qs = c.select(col("nid").as("qid"), col("nv").as("qv"))
    val exact = Similarity.bruteForceTopK(c, "nid", "nv", qs,
      "qid", "qv", k = 5)
    val r = Similarity.recallAtK(g, exact)
      .agg(sum(col("n_hit")).cast("double") / sum(col("n_exact")))
      .as[Double].head()
    assert(r >= 0.6, s"corpus-wide recall@5 = $r on the realistic corpus")
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

  /** Smooth ring manifold — the NAVIGABLE corpus a graph walk needs:
    * every vector unique, 5-NN graph ≈ angular neighbors, connected.
    * (The clustered corpus above is deliberately degenerate for beam
    * purposes: its period-7 jitter makes duplicate groups whose 5-NN
    * cliques have no outgoing edges — good for testing seeding, useless
    * for testing navigation.) */
  private def ringCorpus(n: Int = 160) = {
    val rows = (0 until n).map { i =>
      val th = 2.0 * math.Pi * i / n
      val v = Array(10.0 * math.cos(th), 10.0 * math.sin(th),
        1.0, 1.0, 1.0, 1.0, 1.0, 1.0).map(_.toFloat)
      (i.toLong, v.toSeq)
    }
    rows.toDF("nid", "nv")
  }

  test("beam search over the refined graph reaches brute-truth recall " +
      "from the multi-entry seed set (navigable manifold)") {
    val c = ringCorpus()
    val g = Similarity.nnDescentGraph(c, "nid", "nv", k = 5, rounds = 4,
      bits = 4, dim = dim, initWindow = 3)
    val qs = c.filter(col("nid") % 10 === 0)
      .select(col("nid").as("qid"), col("nv").as("qv"))
    val approx = Similarity.graphBeamSearch(g, c, "nid", "nv", qs,
        "qid", "qv", k = 5, beamWidth = 8, steps = 14, bits = 6, dim = dim)
      .select(col("query_id"), col("neighbor_id"))
    val exact = Similarity.bruteForceTopK(c, "nid", "nv", qs,
      "qid", "qv", k = 5)
    val per = Similarity.recallAtK(approx, exact).collect()
    val r = per.map(_.getLong(2)).sum.toDouble / per.map(_.getLong(1)).sum
    assert(r >= 0.85, s"beam recall@5 = $r")
  }

  test("two-table init keeps the graph connected across bucket walls: " +
      "ring nodes get BOTH-sided neighborhoods") {
    // single-table regression shape: on the ring, a node at an LSH-bucket
    // boundary kept only one-sided edges (89 -> {90..94}) because
    // neighbor-of-neighbor refinement cannot cross an init component.
    // With two tables every node's graph top-5 must be {±1, ±2} plus one
    // of ±3 (the d=3 cosines tie in exact math and split by float ULPs,
    // so either side is a correct rank-5) for at least 95% of nodes.
    val n = 160
    val g = Similarity.nnDescentGraph(ringCorpus(n), "nid", "nv", k = 5,
      rounds = 6, bits = 4, dim = dim, initWindow = 3)
    val got = g.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val perfect = (0 until n).count { i =>
      def pos(d: Int) = ((i + d) % n + n) % n.toLong
      val core = Set(pos(1), pos(-1), pos(2), pos(-2))
      got.get(i.toLong).exists(s =>
        core.subsetOf(s) && (s - pos(3) - pos(-3)) == core)
    }
    assert(perfect >= (n * 0.95).toInt,
      s"only $perfect/$n nodes have both-sided angular top-5")
  }

  test("appendToGraph: incremental insert tracks the full rebuild " +
      "(recall within 0.05) and keeps every shape invariant") {
    val n = 160
    val full = ringCorpus(n)
    val old = full.filter(col("nid") % 8 =!= 3)
    val neu = full.filter(col("nid") % 8 === 3)
    val g0 = Similarity.nnDescentGraph(old, "nid", "nv", k = 5,
      rounds = 4, bits = 4, dim = dim, initWindow = 3)
    val appended = Similarity.appendToGraph(g0, old, neu, "nid", "nv",
      k = 5, rounds = 4, bits = 4, dim = dim, initWindow = 3).cache()
    val rebuilt = Similarity.nnDescentGraph(full, "nid", "nv", k = 5,
      rounds = 4, bits = 4, dim = dim, initWindow = 3)
    // shape invariants on the appended graph
    assert(appended.filter(col("node_id") === col("neighbor_id")).count() === 0)
    val per = appended.groupBy(col("node_id"))
      .agg(count(lit(1)).as("n"), min(col("rank")).as("lo"),
        max(col("rank")).as("hi"))
    assert(per.count() === n)
    assert(per.filter(col("n") > 5 || col("lo") =!= 1 ||
      col("hi") =!= col("n")).count() === 0)
    // recall vs brute truth: append within 0.05 of the rebuild
    val qs = full.select(col("nid").as("qid"), col("nv").as("qv"))
    val truth = Similarity.bruteForceTopK(full, "nid", "nv", qs,
      "qid", "qv", k = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def recallOf(g: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(
          g.select(col("node_id").as("query_id"), col("neighbor_id")), truth)
        .agg(sum(col("n_hit")).cast("double") / sum(col("n_exact")))
        .as[Double].head()
    val ra = recallOf(appended)
    val rr = recallOf(rebuilt)
    truth.unpersist()
    appended.unpersist()
    assert(ra >= rr - 0.05, s"append recall $ra vs rebuild $rr")
  }

  test("deleteFromGraph: prune + re-insert repair tracks the rebuild on " +
      "the survivors (recall within 0.05); deleted ids vanish from BOTH " +
      "edge sides; shape invariants hold") {
    val n = 160
    val full = ringCorpus(n)
    val gFull = Similarity.nnDescentGraph(full, "nid", "nv", k = 5,
      rounds = 4, bits = 4, dim = dim, initWindow = 3)
    val gone = full.filter(col("nid") % 8 === 3)
    val remaining = full.filter(col("nid") % 8 =!= 3)
    val repaired = Similarity.deleteFromGraph(gFull, full,
      gone.select(col("nid")), "nid", "nv",
      k = 5, rounds = 4, bits = 4, dim = dim, initWindow = 3).cache()
    // takedown contract: deleted ids appear NOWHERE — not as nodes, not
    // as anyone's neighbor
    assert(repaired.filter(col("node_id") % 8 === 3 ||
      col("neighbor_id") % 8 === 3).count() === 0)
    // shape invariants: every survivor served, no self loops, contiguous
    // ranks, lists cut at k
    assert(repaired.filter(col("node_id") === col("neighbor_id"))
      .count() === 0)
    val per = repaired.groupBy(col("node_id"))
      .agg(count(lit(1)).as("n"), min(col("rank")).as("lo"),
        max(col("rank")).as("hi"))
    assert(per.count() === remaining.count())
    assert(per.filter(col("n") > 5 || col("lo") =!= 1 ||
      col("hi") =!= col("n")).count() === 0)
    // recall vs brute truth on the survivors: within 0.05 of a rebuild
    val qs = remaining.select(col("nid").as("qid"), col("nv").as("qv"))
    val truth = Similarity.bruteForceTopK(remaining, "nid", "nv", qs,
      "qid", "qv", k = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def recallOf(g: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(
          g.select(col("node_id").as("query_id"), col("neighbor_id")), truth)
        .agg(sum(col("n_hit")).cast("double") / sum(col("n_exact")))
        .as[Double].head()
    val rebuilt = Similarity.nnDescentGraph(remaining, "nid", "nv", k = 5,
      rounds = 4, bits = 4, dim = dim, initWindow = 3)
    val rd = recallOf(repaired)
    val rr = recallOf(rebuilt)
    truth.unpersist()
    repaired.unpersist()
    assert(rd >= rr - 0.05, s"delete recall $rd vs rebuild $rr")
  }

  test("deleteFromGraph of ids the graph never linked is the exact " +
      "identity (inherits append's empty-delta identity)") {
    val old = ringCorpus(80)
    val g0 = Similarity.nnDescentGraph(old, "nid", "nv", k = 5,
      rounds = 2, bits = 4, dim = dim, initWindow = 3, buildK = 10)
    val phantom = old.filter(col("nid") < 0).select(col("nid"))
    val out = Similarity.deleteFromGraph(g0, old, phantom, "nid", "nv",
      k = 5, rounds = 2, bits = 4, dim = dim, initWindow = 3, buildK = 10)
    assert(out.collect().map(_.toString).sorted.toSeq ===
      g0.collect().map(_.toString).sorted.toSeq)
  }

  test("appendToGraph with an EMPTY delta is the exact identity — " +
      "untouched nodes keep sims AND ranks verbatim (buildK path too)") {
    val old = ringCorpus(80)
    // buildK > k exercises the widened-frontier path: internal cuts at
    // buildK, published artifact still k-wide — an empty delta must stay
    // a byte-exact identity through it
    val g0 = Similarity.nnDescentGraph(old, "nid", "nv", k = 5,
      rounds = 2, bits = 4, dim = dim, initWindow = 3, buildK = 10)
    val empty = old.filter(col("nid") < 0)
    val appended = Similarity.appendToGraph(g0, old, empty, "nid", "nv",
      k = 5, rounds = 2, bits = 4, dim = dim, initWindow = 3, buildK = 10)
    assert(appended.collect().map(_.toString).sorted.toSeq ===
      g0.collect().map(_.toString).sorted.toSeq)
  }

  test("multi-entry seeding reaches graph regions a single global entry " +
      "cannot (disconnected components stay servable)") {
    val c = corpus()
    // a deliberately DISCONNECTED graph: edges only within each cluster
    // (node -> next two ids in the same 40-block). A walk from any single
    // entry point can never leave that entry's cluster.
    val intra = (for {
      cl <- 0 until 4
      i <- 0 until 40
      d <- 1 to 2
    } yield ((cl * 40 + i).toLong, (cl * 40 + (i + d) % 40).toLong))
      .toDF("node_id", "neighbor_id")
    // one query per cluster, offset so the query is not its own answer
    val qs = c.filter(col("nid") % 40 === 7)
      .select(col("nid").as("qid"), col("nv").as("qv"))
    val res = Similarity.graphBeamSearch(intra, c, "nid", "nv", qs,
        "qid", "qv", k = 3, beamWidth = 8, steps = 5, bits = 4, dim = dim)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"))
      .collect()
    assert(res.length === 4)
    // every query's best hit must come from ITS OWN cluster — only
    // possible if every cluster's component received an entry seed
    res.foreach { row =>
      val q = row.getLong(0); val n = row.getLong(1)
      assert(q / 40 === n / 40,
        s"query $q served from foreign cluster by neighbor $n")
    }
  }
}
