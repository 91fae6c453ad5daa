package graft.functions

import graft.SparkSpec

class CandidateEvalSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("candidateEval computes exact ppm precision/recall") {
    val cands = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    // hit = {(1,2)}: precision 1/3, recall 1/2 — floored integer ppm
    assert(row(Dedup.candidateEval(cands, truth)) ===
      ((3L, 2L, 1L, 333333L, 500000L)))
  }

  test("candidateEval dedupes its inputs") {
    val cands = Seq((1L, 2L), (1L, 2L)).toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    assert(row(Dedup.candidateEval(cands, truth)) ===
      ((1L, 2L, 1L, 1000000L, 500000L)))
  }

  test("candidateEval guards empty sides (no division by zero)") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val truth = Seq((1L, 2L)).toDF("id_a", "id_b")
    assert(row(Dedup.candidateEval(empty, truth)) ===
      ((0L, 1L, 0L, 0L, 0L)))
    assert(row(Dedup.candidateEval(truth, empty)) ===
      ((1L, 0L, 0L, 0L, 0L)))
  }

  test("lshTuningCurve: hand-checked point and S-shape monotonicity") {
    val out = Dedup.lshTuningCurve(spark, Seq((2, 2)), steps = 20)
      .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    // s = 0.5: P = 1 − (1 − 0.25)² = 0.4375
    assert(out(10L) === 437500L)
    // strictly increasing in s across the grid
    (2L until 20L).foreach(i => assert(out(i) > out(i - 1), s"i=$i"))
    assert(out.size === 19)
  }

  test("lshTuningCurve: more bands raise recall at fixed s") {
    val out = Dedup.lshTuningCurve(spark, Seq((4, 4), (16, 4)), steps = 10)
      .collect()
      .map(r => (r.getInt(0), r.getLong(2)) -> r.getLong(4)).toMap
    (1L until 10L).foreach { i =>
      assert(out((16, i)) >= out((4, i)), s"i=$i")
    }
  }
}
