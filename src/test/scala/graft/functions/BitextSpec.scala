package graft.functions

import graft.SparkSpec

/** Margin-based bitext mining: planted-parallel-pair recall of the
  * bucketed miner vs the exact capless criterion, self-pair suppression,
  * and the recall-report bookkeeping. */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Deterministic pseudo-random unit-ish vectors (seeded — no wall-clock
    * randomness in specs). */
  private def randVec(rnd: scala.util.Random): Array[Float] =
    Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)

  // 40 planted pairs: query i (id 2i) has a near-identical partner on the
  // odd side (id 2i+1, 5% noise); plus 120 odd-side distractors
  private lazy val (queriesDf, corpusDf) = {
    val rnd = new scala.util.Random(7)
    val planted = (0 until 40).map { i =>
      val v = randVec(rnd)
      val noisy = v.map(x => x + (rnd.nextDouble().toFloat * 2 - 1) * 0.05f)
      ((2L * i, v), (2L * i + 1, noisy))
    }
    val distractors = (0 until 120).map(j => (1001L + 2 * j, randVec(rnd)))
    (planted.map(_._1).toDF("qid", "qv"),
      (planted.map(_._2) ++ distractors).toDF("nid", "nv"))
  }

  test("planted-pair recall of the bucketed miner clears 0.8") {
    val exact = Similarity.bitextMarginExact(corpusDf, "nid", "nv",
      queriesDf, "qid", "qv", marginMu = 100000L)
    val mined = Similarity.bitextMarginMine(corpusDf, "nid", "nv",
      queriesDf, "qid", "qv", bits = 6, dim = dim, marginMu = 100000L)
    val rep = Similarity.bitextRecallReport(mined, exact).collect()(0)
    // the exact criterion recovers (nearly) all planted pairs...
    assert(rep.getAs[Long]("n_exact") >= 35L)
    // ...and the Hamming-1 bucket probes recover >= 80% of those
    assert(rep.getAs[Long]("recall_ppm") >= 800000L)
    // bookkeeping: hits can never exceed either side
    assert(rep.getAs[Long]("n_hit") <=
      math.min(rep.getAs[Long]("n_exact"), rep.getAs[Long]("n_mined")))
  }

  test("exact top-1 is the planted partner for the overwhelming majority") {
    val exact = Similarity.bitextMarginExact(corpusDf, "nid", "nv",
      queriesDf, "qid", "qv", marginMu = 0L)
      .as[(Long, Long, Double, Long)].collect()
    val partnered = exact.count { case (src, dst, _, _) => dst == src + 1 }
    assert(partnered >= 38)
  }

  test("overlapping sides: self-pairs are suppressed, genuine pairs survive") {
    // corpus = queries ∪ planted partners under ONE id namespace: without
    // the self-pair filter every query's best hit would be itself at
    // sim 1.0 and the margin criterion would suppress all real pairs
    val overlap = queriesDf.select($"qid".as("nid"), $"qv".as("nv"))
      .unionByName(corpusDf)
    val mined = Similarity.bitextMarginMine(overlap, "nid", "nv",
      queriesDf, "qid", "qv", bits = 6, dim = dim, marginMu = 100000L)
      .as[(Long, Long, Double, Long)].collect()
    assert(mined.nonEmpty)
    assert(mined.forall { case (src, dst, _, _) => dst != src })
    // with self-matches gone the planted partner is the best hit again
    assert(mined.count { case (src, dst, _, _) => dst == src + 1 } >=
      (mined.length * 8) / 10)
  }

  test("maxBucket caps the corpus side deterministically (stable-hash order)") {
    import org.apache.spark.sql.functions._
    // 12 corpus vectors in ONE bucket (same sign pattern), maxBucket 2:
    // only the two stable-hash-lowest ids can ever be scored — the cap is
    // a pure function of the ids, not of data order
    val base = Array.fill(dim)(0.5f)
    val corpus = (0 until 12)
      .map(i => (100L + i, base.map(x => x + i * 1e-4f)))
      .toDF("nid", "nv")
    val qs = Seq((1L, base)).toDF("qid", "qv")
    val mined = Similarity.bitextMarginMine(corpus, "nid", "nv",
      qs, "qid", "qv", bits = 6, dim = dim, marginMu = 0L, maxBucket = 2)
      .as[(Long, Long, Double, Long)].collect()
    val kept = corpus
      .select(col("nid"), Sampling.stableBucket(col("nid"), 1 << 30).as("h"))
      .as[(Long, Long)].collect().sortBy(t => (t._2, t._1)).take(2)
      .map(_._1).toSet
    assert(mined.nonEmpty)
    assert(mined.forall(r => kept(r._2)))
  }

  test("recall report denominator guards: empty inputs yield zeros, not nulls") {
    val empty = Seq.empty[(Long, Long)].toDF("src_id", "dst_id")
    val rep = Similarity.bitextRecallReport(empty, empty).collect()(0)
    assert(rep.getAs[Long]("n_exact") == 0L &&
      rep.getAs[Long]("precision_ppm") == 0L &&
      rep.getAs[Long]("recall_ppm") == 0L)
  }
}
