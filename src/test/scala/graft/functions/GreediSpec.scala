package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GreeDi distributed max-coverage ([[Sampling.maxCoverSelectGreedi]]):
  * agreement with an independent in-memory two-phase reference (same md5
  * bucketing, same per-bucket and global tie orders), and the guarantee
  * -relevant sanity that the merged result never falls below the best
  * single bucket's coverage. */
class GreediSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int): Seq[(Long, Seq[String])] =
    (0 until n).map { i =>
      (10L + i,
        (0 until 8).map(j => s"s${(i * 5 + j * 3) % 37}").distinct)
    }

  /** The engine's md5 bucket, recomputed THROUGH the engine so the spec
    * shares the hash rule instead of re-implementing it. */
  private def buckets(ids: Seq[Long], parts: Int): Map[Long, Long] =
    ids.toDF("id")
      .select(col("id"), pmod(Dedup.Md5Hasher(col("id").cast("string")),
        lit(parts.toLong)).as("bk"))
      .as[(Long, Long)].collect().toMap

  private def refGreedi(vs: Seq[(Long, Seq[String])], k: Int,
                        parts: Int): Seq[(Int, Long, Long)] = {
    val bk = buckets(vs.map(_._1), parts)
    // phase 1: independent greedy inside every bucket
    val cands = scala.collection.mutable.Set.empty[Long]
    for (b <- 0L until parts.toLong) {
      val in = vs.filter(v => bk(v._1) == b)
      var covered = Set.empty[String]
      for (_ <- 1 to k) {
        val gains = in.map { case (id, sh) => (id, sh.count(!covered(_))) }
          .filter(_._2 > 0)
        if (gains.nonEmpty) {
          val (id, _) = gains.minBy { case (i, g) => (-g, i) }
          cands += id
          covered ++= in.find(_._1 == id).get._2
        }
      }
    }
    // phase 2: exact greedy over the candidates
    val sub = vs.filter(v => cands(v._1))
    var covered = Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (st <- 1 to k if out.size == st - 1) {
      val gains = sub.map { case (id, sh) => (id, sh.count(!covered(_))) }
        .filter(_._2 > 0)
      if (gains.nonEmpty) {
        val (id, g) = gains.minBy { case (i, gg) => (-gg, i) }
        out += ((st, id, g.toLong))
        covered ++= sub.find(_._1 == id).get._2
      }
    }
    out.toSeq
  }

  test("matches the independent two-phase reference exactly") {
    val vs = fixture(36)
    val got = Sampling
      .maxCoverSelectGreedi(vs.toDF("doc_id", "sh"), "doc_id", "sh",
        k = 3, parts = 4)
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === refGreedi(vs, 3, 4))
  }

  test("merged coverage is at least any single bucket's phase-1 coverage") {
    val vs = fixture(36)
    val bk = buckets(vs.map(_._1), 4)
    val got = Sampling
      .maxCoverSelectGreedi(vs.toDF("doc_id", "sh"), "doc_id", "sh",
        k = 3, parts = 4)
      .as[(Int, Long, Long)].collect()
    val mergedCoverage = got.map(_._3).sum
    for (b <- 0L until 4L) {
      val in = vs.filter(v => bk(v._1) == b)
      var covered = Set.empty[String]
      for (_ <- 1 to 3) {
        val gains = in.map { case (id, sh) => (id, sh.count(!covered(_))) }
          .filter(_._2 > 0)
        if (gains.nonEmpty) {
          val (id, _) = gains.minBy { case (i, g) => (-g, i) }
          covered ++= in.find(_._1 == id).get._2
        }
      }
      assert(mergedCoverage >= covered.size)
    }
  }

  test("empty corpus yields a type-faithful empty frame") {
    val empty = Seq.empty[(Long, Seq[String])].toDF("doc_id", "sh")
    val got = Sampling.maxCoverSelectGreedi(empty, "doc_id", "sh", 3, 4)
    assert(got.isEmpty)
    assert(got.schema.map(_.name) === Seq("step", "doc_id", "gain"))
  }
}
