package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Ranking-metrics eval: perfect/inverted runs, unjudged docs as rel 0,
  * exact discount-ladder arithmetic vs a BigInt reference. */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  // pool: 6 docs for query 0 with grades 3,3,2,1,0,0
  private val rels = Seq((0L, "d1", 3L), (0L, "d2", 3L), (0L, "d3", 2L),
    (0L, "d4", 1L), (0L, "d5", 0L), (0L, "d6", 0L))
    .toDF("q", "doc", "rel")

  private def runOf(order: Seq[String]) =
    order.zipWithIndex.map { case (d, i) => (0L, i + 1, d) }
      .toDF("q", "rank", "doc")

  private def metricsOf(order: Seq[String], k: Int = 4) =
    RankEval.metrics(runOf(order), "q", "rank", "doc", rels, "rel", k)
      .select(col("dcg_mu"), col("idcg_mu"), col("ndcg_ppm"),
        col("mrr_ppm"), col("prec_ppm"), col("n_rel_pool"))
      .as[(Long, Long, Long, Long, Long, Long)].head()

  test("the ideal-order run scores NDCG exactly 10^6") {
    val (dcg, idcg, ndcg, mrr, prec, pool) =
      metricsOf(Seq("d1", "d2", "d3", "d4"))
    assert(dcg === idcg && ndcg === 1000000L)
    assert(mrr === 1000000L) // first result is relevant
    assert(prec === 750000L) // 3 of 4 at rel ≥ 2
    assert(pool === 3L)
  }

  test("an inverted run matches the BigInt reference exactly") {
    val order = Seq("d5", "d6", "d4", "d3") // rels 0, 0, 1, 2
    val (dcg, idcg, ndcg, mrr, prec, _) = metricsOf(order)
    val disc = RankEval.discountsMu(4)
    val refDcg = Seq(0L, 0L, 1L, 3L).zip(disc).map { case (g, d) => g * d }.sum
    val refIdcg = Seq(7L, 7L, 3L, 1L).zip(disc).map { case (g, d) => g * d }.sum
    assert(dcg === refDcg && idcg === refIdcg)
    assert(ndcg === (BigInt(refDcg) * 1000000 / refIdcg).toLong)
    assert(mrr === 250000L)  // first rel ≥ 2 at rank 4
    assert(prec === 250000L) // 1 of 4
  }

  test("docs missing from the judgments count as rel 0") {
    val (dcg, _, _, mrr, prec, _) = metricsOf(Seq("zz", "d1", "yy", "d3"))
    val disc = RankEval.discountsMu(4)
    assert(dcg === 7L * disc(1) + 3L * disc(3))
    assert(mrr === 500000L)
    assert(prec === 500000L)
  }

  test("a query with judged-but-irrelevant pool gets mrr/prec 0") {
    val weakRels = Seq((1L, "a", 1L), (1L, "b", 0L)).toDF("q", "doc", "rel")
    val got = RankEval.metrics(
      Seq((1L, 1, "a"), (1L, 2, "b")).toDF("q", "rank", "doc"),
      "q", "rank", "doc", weakRels, "rel", 2)
      .select(col("ndcg_ppm"), col("mrr_ppm"), col("prec_ppm"),
        col("n_rel_pool")).as[(Long, Long, Long, Long)].head()
    assert(got === ((1000000L, 0L, 0L, 0L))) // rel-1 doc first = ideal
  }

  test("ranks beyond k are ignored") {
    val a = metricsOf(Seq("d1", "d2", "d3", "d4"))
    val b = metricsOf(Seq("d1", "d2", "d3", "d4", "d5", "d6"))
    assert(a === b)
  }
}
