package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact KNN-Shapley (Jia et al. VLDB'19): the closed-form recursion,
  * the efficiency axiom, and sign semantics for harmful points. */
class KnnShapleySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  private val Qq = 1000000000000L

  /** vectors on a ray: similarity to the probe decreases with id, so the
    * distance rank IS the id order — the recursion is hand-checkable. */
  private def rayCorpus(labels: Seq[Int]) =
    labels.zipWithIndex.map { case (lbl, i) =>
      // angle grows with i → cosine to the probe (angle 0) decreases
      val th = 0.1 * (i + 1)
      (100L + i, Seq(math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f), lbl)
    }.toDF("vec_id", "embedding", "label")

  private val probe = Seq(
    (0L, Seq(1f, 0f, 0f, 0f), 1)).toDF("vec_id", "embedding", "label")

  private def values(labels: Seq[Int], k: Int) =
    Similarity.knnShapleyValues(rayCorpus(labels), "vec_id", "embedding",
      "label", probe, "vec_id", "embedding", "label", k)
      .select(col("nid"), col("rank"), col("value_qq"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._2)

  /** reference implementation of the paper's recursion, in qq with the
    * same per-term floor (pmod semantics match: Math.floorDiv). */
  private def expected(ms: Seq[Int], k: Int): Seq[Long] = {
    val n = ms.length
    val terms = (1 to n).map { i =>
      if (i == n) Math.floorDiv(ms(i - 1) * Qq, n)
      else Math.floorDiv(
        (ms(i - 1) - ms(i)).toLong * math.min(i, k) * Qq, k.toLong * i)
    }
    terms.indices.map(i => terms.drop(i).sum)
  }

  test("matches the hand recursion, including negative values for points " +
      "whose label disagrees with a nearer region") {
    val labels = Seq(1, 0, 1, 1, 0, 0) // probe label 1
    val got = values(labels, k = 2)
    val want = expected(labels, k = 2)
    assert(got.map(_._2) === (1 to 6)) // rank order = id order on the ray
    assert(got.map(_._3).toSeq === want)
    // the mismatching nearest-region point (rank 2, label 0) must carry
    // NEGATIVE value — it displaces a matching neighbor
    assert(got(1)._3 < 0)
  }

  test("efficiency axiom: values sum to the full-coalition K-NN utility " +
      "(within the declared qq quantization)") {
    val labels = Seq(1, 0, 1, 0, 1, 1, 0, 0, 1, 0)
    val k = 3
    val got = values(labels, k)
    val topKMatches = labels.take(k).count(_ == 1)
    val utilityQq = topKMatches.toLong * Qq / k
    val sum = got.map(_._3).sum
    val n = labels.length.toLong
    assert(math.abs(sum - utilityQq) <= n * n,
      s"sum=$sum utility=$utilityQq")
  }
}
