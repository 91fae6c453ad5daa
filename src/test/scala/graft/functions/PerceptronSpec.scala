package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Integer full-batch perceptron: convergence on separable data, exact
  * agreement with a BigInt in-memory reference of the mean-update floor
  * semantics, and partition determinism. */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  // y = +1 iff f1 > 500000 — separable with margin via f1 alone
  private val separable = (1 to 40).map { i =>
    val f1 = if (i % 2 == 0) 900000L else 100000L
    val y = if (i % 2 == 0) 1L else -1L
    (y, 1000000L, f1)
  }.toDF("y", "bias", "f1")

  test("separable data reaches train accuracy 10^6") {
    val stats = Perceptron.trainStats(separable, "y", Seq("bias", "f1"), 4)
      .orderBy(col("round"))
      .select(col("round"), col("n_mis"), col("acc_ppm"))
      .as[(Long, Long, Long)].collect()
    assert(stats.head._2 === 40L) // w0 = 0 misclassifies everything
    assert(stats.last._3 === 1000000L)
  }

  /** In-memory reference with identical floorDiv mean-update semantics. */
  private def ref(xs: Seq[(Long, Seq[Long])], rounds: Int)
  : Seq[(Seq[Long], Long, Long)] = {
    val n = xs.size
    val k = xs.head._2.size
    var w = Seq.fill(k)(BigInt(0))
    (1 to rounds).map { _ =>
      val mis = xs.filter { case (y, x) =>
        y * x.zip(w).map { case (xi, wi) => wi * xi }.sum <= 0 }
      val u = (0 until k).map(j => mis.map { case (y, x) => BigInt(y) * x(j) }.sum)
      w = w.zip(u).map { case (wj, uj) =>
        wj + (uj - (((uj % n) + n) % n)) / n }
      val ok = xs.count { case (y, x) =>
        y * x.zip(w).map { case (xi, wi) => wi * xi }.sum > 0 }
      (w.map(_.toLong), mis.size.toLong, BigInt(ok).toLong * 1000000L / n)
    }
  }

  test("matches the BigInt reference on a noisy 3-feature frame") {
    val data = (1 to 31).map { i =>
      val y = if (i % 3 == 0) 1L else -1L
      (y, 1000000L, (i * 37 % 11) * 100000L, (i * 13 % 7) * 150000L)
    }
    val got = Perceptron.trainStats(
      data.toDF("y", "b", "f1", "f2"), "y", Seq("b", "f1", "f2"), 4)
      .orderBy(col("round"))
      .select(col("w_b"), col("w_f1"), col("w_f2"), col("n_mis"),
        col("acc_ppm"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val want = ref(data.map { case (y, b, f1, f2) => (y, Seq(b, f1, f2)) }, 4)
    got.zip(want).foreach { case ((wb, w1, w2, nm, acc), (w, rnm, racc)) =>
      assert(Seq(wb, w1, w2) === w)
      assert(nm === rnm && acc === racc)
    }
  }

  test("bit-identical across partitionings") {
    def run(parts: Int) = Perceptron.trainStats(
      separable.repartition(parts), "y", Seq("bias", "f1"), 3)
      .orderBy(col("round"))
      .select(col("w_bias"), col("w_f1"), col("n_mis"), col("acc_ppm"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(run(1) === run(6))
  }

  test("rejects empty input and bad rounds") {
    intercept[IllegalArgumentException](
      Perceptron.trainStats(separable.limit(0), "y", Seq("bias"), 2))
    intercept[IllegalArgumentException](
      Perceptron.trainStats(separable, "y", Seq("bias"), 0))
  }
}
