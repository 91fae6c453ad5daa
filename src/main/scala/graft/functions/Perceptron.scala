package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed full-batch perceptron (Rosenblatt 1958; the averaged/batch
  * form of Freund & Schapire, ML 1999) over INTEGER features — the
  * trainable quality/language gate of a corpus pipeline (fasttext-style
  * linear filters à la CCNet/Brown et al. weak supervision), kept exactly
  * cross-engine-reproducible:
  *
  *   - features and weights are integer ppm/µ quantities; a training
  *     round is ONE aggregation: margin mᵢ = yᵢ·(w·xᵢ) under the current
  *     LITERAL weights, update u_j = Σ_{mᵢ ≤ 0} yᵢ·xᵢⱼ;
  *   - the update folds in with learning rate 1/N (mean update,
  *     exact floor division): w ← w + ⌊u_j / N⌋. That bounds |w_j| by
  *     rounds·max|x| INDEPENDENT of corpus size — margins stay far from
  *     long overflow at any N (a raw-sum perceptron would overflow at
  *     ~10⁹ rows);
  *   - weights round-trip through the driver as literals each round (the
  *     Profile-bisection pattern: K rounds = K one-row aggregates, plans
  *     stay flat, no lineage growth, nothing corpus-sized ever collects).
  *
  * Scale: each round is one scan + one partial-aggregating shuffle of a
  * 6-number state; rounds are a small constant. The returned trajectory
  * frame is rounds-sized (driver-assembled from the per-round 1-row
  * aggregates — the same class as PPR's node count).
  *
  * Determinism: every quantity is an exact integer; the only divisions
  * are [[Sampling.intDiv]] floors (pmod form — the SQL mirror is
  * `(u - (((u % n) + n) % n)) // n` for the signed update). */
object Perceptron {

  /** Per-round training trajectory.
    *
    * `feats`: one row per example with integer feature columns
    * `featCols` and `yCol` ∈ {+1, −1}. Returns one row per round k:
    * (round, w_<feat>… after round k, n_mis = misclassified count under
    * the PRE-update weights — margin ≤ 0, so round 1 updates on every
    * row from w₀ = 0 — and acc_ppm = ⌊10⁶·|{margin > 0}|/N⌋ under the
    * POST-update weights). */
  def trainStats(feats: DataFrame, yCol: String, featCols: Seq[String],
                 rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"bad rounds=$rounds")
    require(featCols.nonEmpty, "need at least one feature")
    val spark = feats.sparkSession
    val f = feats.select((col(yCol).cast("long").as("_y") +:
      featCols.map(c => col(c).cast("long").as(c))): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = f.count()
    require(n > 0, "empty training frame")

    def margin(w: Seq[Long]): Column =
      col("_y") * featCols.zip(w)
        .map { case (c, wj) => col(c) * lit(wj) }
        .reduce(_ + _)

    var w = Seq.fill(featCols.size)(0L)
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Long], Long, Long)]
    for (k <- 1 to rounds) {
      val m = margin(w)
      // one pass: the update sums + n_mis under w_{k-1}, and the
      // correct-count under w_{k-1} (consumed as round k-1's acc)
      val aggCols = featCols.map(c =>
        sum(when(m <= 0, col("_y") * col(c)).otherwise(lit(0L))).as(s"_u_$c")) ++
        Seq(sum(when(m <= 0, 1L).otherwise(0L)).as("_nm"),
          sum(when(m > 0, 1L).otherwise(0L)).as("_ok"))
      val row = f.agg(aggCols.head, aggCols.tail: _*).head()
      val u = featCols.indices.map(i => row.getLong(i))
      val nMis = row.getLong(featCols.size)
      val ok = row.getLong(featCols.size + 1)
      if (k > 1) { // w_{k-1}'s accuracy arrives with round k's pass
        val prev = stats.remove(stats.size - 1)
        stats += ((prev._1, prev._2, prev._3, ok * 1000000L / n))
      }
      w = w.zip(u).map { case (wj, uj) => wj + Math.floorDiv(uj, n) }
      stats += ((k, w, nMis, -1L))
    }
    // final pass: accuracy of the last round's weights
    val okLast = f.agg(sum(when(margin(w) > 0, 1L).otherwise(0L)).as("_ok"))
      .head().getLong(0)
    val last = stats.remove(stats.size - 1)
    stats += ((last._1, last._2, last._3, okLast * 1000000L / n))
    f.unpersist(false)

    val schema = StructType(
      StructField("round", LongType, nullable = false) +:
        featCols.map(c => StructField(s"w_$c", LongType, nullable = false)) :+
        StructField("n_mis", LongType, nullable = false) :+
        StructField("acc_ppm", LongType, nullable = false))
    val rows = stats.map { case (k, wk, nm, acc) =>
      Row.fromSeq(k.toLong +: wk :+ nm :+ acc)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
