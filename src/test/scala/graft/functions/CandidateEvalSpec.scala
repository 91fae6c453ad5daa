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
}
