package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Heaps'-law growth profile: hand-checked prefix totals and
  * first-occurrence vocabulary counts, slope sign, determinism. */
class VocabHeapsSpec extends SparkSpec {
  import spark.implicits._

  test("prefix totals and vocab match the hand computation") {
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "a b c d"), (3L, "e"))
      .toDF("doc_id", "text")
    val got = Vocab.heapsFit(docs, "doc_id", "text", checkpoints = 4)
      .orderBy(col("cp"))
      .select(col("cp"), col("cutoff_id"), col("prefix_tokens"),
        col("prefix_vocab"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // maxId = 3 ⇒ cutoffs ⌊3i/4⌋ = 0, 1, 2, 3
    assert(got === Seq((1L, 0L, 2L, 2L), (2L, 1L, 4L, 3L),
      (3L, 2L, 8L, 4L), (4L, 3L, 9L, 5L)))
  }

  test("a growing vocabulary fits a positive slope") {
    // each doc introduces fresh types at a decaying rate
    val docs = (0 until 64).map { i =>
      (i.toLong, (0 to i / 4).map(j => s"w${j}_${i % 3}").mkString(" "))
    }.toDF("doc_id", "text")
    val slope = Vocab.heapsFit(docs, "doc_id", "text")
      .select(col("slope_ppm")).distinct().as[Long].head()
    assert(slope > 0L, s"slope=$slope")
  }

  test("bit-identical across partitionings") {
    val docs = (0 until 40).map(i => (i.toLong, s"t${i % 7} u${i % 13} v"))
      .toDF("doc_id", "text")
    def run(p: Int) = Vocab.heapsFit(docs.repartition(p), "doc_id", "text")
      .orderBy(col("cp")).collect().toSeq
    assert(run(1) === run(5))
  }
}
