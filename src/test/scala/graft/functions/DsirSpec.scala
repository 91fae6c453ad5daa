package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def withFeats(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), TextFunctions.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), Dsir.hashedFeatures(col("_toks"), 64).as("feats"))

  private val target = withFeats(Seq(
    (100L, "alpha beta gamma alpha beta"),
    (101L, "alpha beta delta"),
    (102L, "beta gamma alpha")).toDF("doc_id", "text"))

  private val raw = withFeats(Seq(
    (1L, "alpha beta gamma"),        // looks like target
    (2L, "zig zag zog quux blort"),  // does not
    (3L, "alpha beta alpha beta"),   // very target-like
    (4L, "")).toDF("doc_id", "text"))// featureless

  test("hashedFeatures: unigrams + bigrams, stable buckets in range") {
    val f = withFeats(Seq((1L, "a b c")).toDF("doc_id", "text"))
      .select(explode($"feats").as("b")).collect().map(_.getLong(0))
    assert(f.length === 5)                       // 3 unigrams + 2 bigrams
    assert(f.forall(b => b >= 0 && b < 64))
    val again = withFeats(Seq((9L, "a b c")).toDF("doc_id", "text"))
      .select(explode($"feats").as("b")).collect().map(_.getLong(0))
    assert(f.toSeq === again.toSeq)              // pure function of text
  }

  test("importanceWeights: target-like docs outrank off-distribution ones") {
    val w = Dsir.importanceWeights(raw, "doc_id", "feats",
      target, "feats", buckets = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L))     // every raw doc scored
    assert(w(4L) === ((0L, 0.0)))                // featureless → 0
    assert(w(3L)._2 > w(2L)._2)                  // target-like ≫ gibberish
    assert(w(1L)._2 > w(2L)._2)
    assert(w(2L)._2 < 0.0)                       // off-distribution is negative
  }

  test("importanceWeights: deterministic under repartitioning") {
    val a = Dsir.importanceWeights(raw, "doc_id", "feats",
      target, "feats", 64).orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(raw.repartition(7), "doc_id", "feats",
      target.repartition(3), "feats", 64).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("importanceWeights: model rides the score join as a broadcast") {
    val plan = Dsir.importanceWeights(raw, "doc_id", "feats",
      target, "feats", 64).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    // the raw n-gram stream must NOT be exchanged before the score join:
    // the only shuffle is the final per-doc aggregation
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("gumbelTopK: k rows, deterministic, weight-biased") {
    val w = Dsir.importanceWeights(raw, "doc_id", "feats",
      target, "feats", 64)
    val sel1 = Dsir.gumbelTopK(w, "doc_id", "log_weight", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sel2 = Dsir.gumbelTopK(w, "doc_id", "log_weight", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel1 === sel2)
    assert(sel1.size === 2)
    // with a large weight gap the Gumbel noise (scale ~1) cannot flip
    // the ordering: the two target-like docs must win
    val big = Dsir.importanceWeights(raw, "doc_id", "feats",
      target, "feats", 64)
      .withColumn("log_weight", col("log_weight") * 100)
    val selBig = Dsir.gumbelTopK(big, "doc_id", "log_weight", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(selBig === Set(1L, 3L))
  }

  test("gumbelNoise: finite, spread, pure function of the id") {
    val g = spark.range(1000)
      .select(Dsir.gumbelNoise(col("id")).as("g"))
      .collect().map(_.getDouble(0))
    assert(g.forall(v => !v.isNaN && !v.isInfinite))
    assert(g.distinct.length > 990)
    // Gumbel(0,1): median = -ln(ln 2) ≈ 0.3665 — sanity-check location
    val sorted = g.sorted
    assert(math.abs(sorted(500) - 0.3665) < 0.15)
  }
}
