package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Profile.psiTerms — the PSI drift metric's defining properties. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def terms(rows: Seq[(String, Boolean)]): Map[String, Long] =
    Profile.psiTerms(rows.toDF("bucket", "old"), "bucket", "old")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap

  test("identical distributions yield zero PSI in every bucket") {
    val rows = for {
      b <- Seq("a", "b", "c"); old <- Seq(true, false); _ <- 1 to 10
    } yield (b, old)
    assert(terms(rows).values.forall(_ === 0L))
  }

  test("a planted shift yields positive terms that grow with the shift") {
    // old: 90/10 across a/b; new: 10/90 — a hard flip
    val rows = Seq.fill(90)(("a", true)) ++ Seq.fill(10)(("b", true)) ++
      Seq.fill(10)(("a", false)) ++ Seq.fill(90)(("b", false))
    val t = terms(rows)
    assert(t("a") > 0L && t("b") > 0L)
    // textbook threshold: this flip is far past "drifted" (PSI > 0.25)
    assert(t.values.sum > 25000000L, s"total=${t.values.sum}")
    // a mild shift scores strictly less
    val mild = Seq.fill(55)(("a", true)) ++ Seq.fill(45)(("b", true)) ++
      Seq.fill(45)(("a", false)) ++ Seq.fill(55)(("b", false))
    assert(terms(mild).values.sum < t.values.sum)
  }

  test("terms are never negative and single-sided buckets stay finite " +
      "(Laplace smoothing)") {
    val rows = Seq.fill(50)(("a", true)) ++ Seq.fill(50)(("only_new", false))
    val t = terms(rows)
    assert(t.values.forall(_ >= 0L))
    assert(t.contains("only_new")) // no NaN/∞ dropped the bucket
  }
}
