package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BM25 retrieval and bigram-LM scoring. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple apple banana"),
    (3L, "durian elderberry fig"),
    (4L, "apple"),
    (5L, "banana banana kiwi lime mango nectarine orange papaya")
  ).toDF("doc_id", "text")

  test("bm25: only docs containing a query term appear, ranked by tf/length") {
    val qs = Seq((0L, "apple")).toDF("qid", "qtext")
    val r = Bm25.topK(corpus, "doc_id", "text", qs, "qid", "qtext", k = 10)
      .orderBy($"rank").collect()
    assert(r.map(_.getLong(r.head.fieldIndex("doc_id"))).toSet === Set(1L, 2L, 4L))
    // same idf everywhere: tf=3 saturates past the length penalty (doc 2),
    // then the shortest single hit (doc 4), then the longer single hit
    assert(r.map(_.getLong(r.head.fieldIndex("doc_id"))).toSeq === Seq(2L, 4L, 1L))
    assert(r.forall(_.getDouble(r.head.fieldIndex("score")) > 0.0))
  }

  test("bm25: multi-term queries sum per-term contributions; k caps output") {
    val qs = Seq((0L, "apple banana"), (1L, "fig")).toDF("qid", "qtext")
    val r = Bm25.topK(corpus, "doc_id", "text", qs, "qid", "qtext", k = 2)
    val byQ = r.collect().groupBy(_.getLong(0))
    assert(byQ(0L).length === 2)                    // k caps 4 matching docs
    assert(byQ(1L).map(_.getLong(2)).toSeq === Seq(3L)) // only doc 3 has fig
    // rarer term (fig: df=1) out-scores a common term hit at same tf/dl
    val figScore = byQ(1L).head.getDouble(3)
    assert(figScore > 0.0)
  }

  test("bm25: df branch reuses the posting shuffle (ReusedExchange), query side broadcast") {
    // AQE materializes reuse only at runtime; the static planner applies
    // ReuseExchange visibly, so assert on the non-adaptive plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qs = Seq((0L, "apple banana")).toDF("qid", "qtext")
      val plan = Bm25.topK(corpus, "doc_id", "text", qs, "qid", "qtext", k = 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"expected the df branch to reuse the posting exchange:\n$plan")
      assert(plan.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("bigram LM: repetitive text is more predictable than one-off text") {
    val docs = Seq(
      (1L, "the cat sat the cat sat the cat sat the cat sat"),
      (2L, "zygote quark nebula ossify lattice prism vortex ember")
    ).toDF("doc_id", "text")
    val r = LangModel.selfCrossEntropy(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) < r(2L))
  }

  test("bigram LM: short docs score 0 with 0 bigrams; n_bigrams = tokens-1") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b c d")).toDF("doc_id", "text")
    val r = LangModel.selfCrossEntropy(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1L) === ((0L, 0.0)))
    assert(r(2L) === ((0L, 0.0)))
    assert(r(3L)._1 === 3L)
    assert(r(3L)._2 > 0.0)
  }

  test("bigram LM: hand-checked probabilities on a tiny corpus") {
    // corpus "a b a b": bigrams ab=2? no — tokens [a,b,a,b]: "a b","b a","a b"
    // C2: (a b)=2, (b a)=1; C1: a=2, b=2; V=2
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val r = LangModel.selfCrossEntropy(docs, "doc_id", "text").collect()(0)
    val expected = -(math.log(3.0 / 4.0) + math.log(2.0 / 4.0) + math.log(3.0 / 4.0)) / 3.0
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - expected) < 1e-6)
  }

  test("stupid backoff: seen bigrams use c2/c1, unseen back off to the " +
      "add-one unigram leg — hand-checked") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val model = LangModel.trainBigram(train, "toks")
    // held-out "a b x": "a b" seen (S = 2/2 = 1 → nll 0);
    // "b x" unseen, x unseen word → S = 0.4·(0+1)/(4+2) = 1/15
    val ho = Seq((9L, "a b x")).toDF("doc_id", "text")
    val r = LangModel.backoffCrossEntropy(ho, "doc_id", "text", model)
      .collect()(0)
    assert(r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - math.log(15.0) / 2.0) < 1e-6)
    // seen-word backoff: "b a" unseen bigram?? — "b a" IS seen in train;
    // "x a" unseen bigram with seen w2=a: S = 0.4·(2+1)/6 = 0.2
    val ho2 = Seq((10L, "x a")).toDF("doc_id", "text")
    val r2 = LangModel.backoffCrossEntropy(ho2, "doc_id", "text", model)
      .collect()(0)
    assert(math.abs(r2.getDouble(2) - (-math.log(0.2))) < 1e-6)
  }

  test("bigram LM: scoring an unseen corpus hits the smoothed floor, drops nothing") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val model = LangModel.trainBigram(train, "toks")
    val test = Seq((9L, "x y z")).toDF("doc_id", "text")
    val r = LangModel.crossEntropy(test, "doc_id", "text", model).collect()(0)
    // every bigram unseen, every context unseen: P = 1/(0+V) = 1/2
    assert(r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - math.log(2.0)) < 1e-6)
  }

  test("postings: gap-encoded positions, tf, and the df band") {
    val docs = Seq((1L, "a b a c a"), (2L, "a x")).toDF("doc_id", "text")
    val out = Postings.positional(docs, "doc_id", "text",
        minDf = 1, maxDf = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(("a", 1L)) === ((3L, 2L, "0|2|2"))) // positions 0,2,4
    assert(out(("a", 2L)) === ((1L, 2L, "0")))
    assert(out(("b", 1L)) === ((1L, 1L, "1")))     // single hit: absolute pos
    assert(out(("c", 1L)) === ((1L, 1L, "3")))
    assert(out(("x", 2L)) === ((1L, 1L, "1")))
  }

  test("postings: df band drops hapaxes and stop-terms") {
    val docs = Seq((1L, "stop rare1 mid"), (2L, "stop mid"), (3L, "stop"))
      .toDF("doc_id", "text")
    val terms = Postings.positional(docs, "doc_id", "text",
        minDf = 2, maxDf = 2)
      .select("term").distinct().collect().map(_.getString(0)).toSet
    assert(terms === Set("mid")) // rare1 df=1 below, stop df=3 above
  }

  test("booleanAnd returns docs containing EVERY query term") {
    val docs = Seq(
      (1L, "spark join window agg"),
      (2L, "spark window"),
      (3L, "join window spark extra"),
      (4L, "nothing relevant")).toDF("doc_id", "text")
    val qs = Seq((0L, "spark join window"), (1L, "spark")).toDF("qid", "qt")
    val got = Postings.booleanAnd(docs, "doc_id", "text", qs, "qid", "qt")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (0L, 3L), (1L, 1L), (1L, 2L), (1L, 3L)))
  }

  test("booleanAnd: repeated query terms do not inflate the hit count") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha")).toDF("doc_id", "text")
    val qs = Seq((0L, "alpha alpha beta")).toDF("qid", "qt")
    val got = Postings.booleanAnd(docs, "doc_id", "text", qs, "qid", "qt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // dedup'd query = {alpha, beta}: doc 1 matches with n_terms = 2
    assert(got === Set((0L, 1L, 2L)))
  }

  test("phraseSearch matches consecutive positions only") {
    val docs = Seq(
      (1L, "fast table scan here fast table"), // two occurrences
      (2L, "table fast"),                      // reversed — no match
      (3L, "fast x table")).toDF("doc_id", "text") // gap — no match
    val qs = Seq((0L, "fast table")).toDF("qid", "qt")
    val got = Postings.phraseSearch(docs, "doc_id", "text", qs, "qid", "qt")
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(1L -> ((2L, 0L))))
  }

  test("phraseSearch handles repeated phrase terms") {
    val docs = Seq(
      (1L, "the the end"),    // matches "the the" at 0
      (2L, "the end the")).toDF("doc_id", "text")
    val qs = Seq((0L, "the the")).toDF("qid", "qt")
    val got = Postings.phraseSearch(docs, "doc_id", "text", qs, "qid", "qt")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L)))
  }

  test("query-likelihood: only docs containing an in-collection query " +
      "term appear; the matching doc wins") {
    val qs = Seq((0L, "durian")).toDF("qid", "qtext")
    val r = QueryLikelihood.topK(corpus, "doc_id", "text", qs, "qid",
      "qtext", k = 10).select("doc_id").as[Long].collect().toSeq
    assert(r === Seq(3L))
  }

  test("query-likelihood: Dirichlet length normalization prefers the " +
      "shorter doc at equal tf") {
    // docs 1 and 4 both carry tf(apple)=1; doc 4 is shorter -> higher
    // score under the dl-penalty term
    val qs = Seq((0L, "apple")).toDF("qid", "qtext")
    val r = QueryLikelihood.topK(corpus, "doc_id", "text", qs, "qid",
      "qtext", k = 10).orderBy(col("rank"))
      .select("doc_id").as[Long].collect().toSeq
    assert(r.indexOf(4L) < r.indexOf(1L))
    // and the tf-heavy doc 2 outranks the single-occurrence doc 1
    assert(r.indexOf(2L) < r.indexOf(1L))
  }

  test("query-likelihood: hand-checked score on a two-doc corpus") {
    val tiny = Seq((1L, "a b"), (2L, "a c c")).toDF("doc_id", "text")
    val qs = Seq((0L, "a")).toDF("qid", "qtext")
    val got = QueryLikelihood.topK(tiny, "doc_id", "text", qs, "qid",
      "qtext", k = 10).orderBy(col("rank"))
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect()
    val mu = 2000.0
    def sc(tf: Double, dl: Double) = {
      val term = BigDecimal(math.log(1.0 + tf * 5.0 / (mu * 2.0)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      val pen = BigDecimal(1.0 * math.log(mu / (dl + mu)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      ((term + pen).toDouble * 1e6).round / 1e6.toDouble
    }
    assert(got.map(_._1).toSeq === Seq(1L, 2L)) // shorter doc first
    assert(math.abs(got(0)._2 - sc(1.0, 2.0)) < 2e-6)
    assert(math.abs(got(1)._2 - sc(1.0, 3.0)) < 2e-6)
  }

  test("query-likelihood: out-of-collection query terms contribute " +
      "NOTHING — scores identical with and without them") {
    val qs = Seq((0L, "apple"), (1L, "apple zzzz qqqq")).toDF("qid", "qtext")
    val r = QueryLikelihood.topK(corpus, "doc_id", "text", qs, "qid",
      "qtext", k = 10)
      .select(col("query_id"), col("doc_id"), col("score"))
      .as[(Long, Long, Double)].collect()
    val q0 = r.filter(_._1 == 0L).map(x => (x._2, x._3)).toSet
    val q1 = r.filter(_._1 == 1L).map(x => (x._2, x._3)).toSet
    assert(q0 === q1)
  }
}
