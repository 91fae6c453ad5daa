package graft.functions

import graft.SparkSpec

class RakeSpec extends SparkSpec {
  import spark.implicits._

  test("rake: hand-checked phrase segmentation and scores") {
    val docs = Seq((1L, "deep learning is a deep field"),
      (2L, "systems")).toDF("doc_id", "text")
    val out = Rake.topPhrases(docs, "doc_id", "text",
        stops = Seq("is", "a"), topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // phrases: "deep learning" (len 2), "deep field" (len 2), "systems"
    // deg(deep)=4 freq=2 → 2.0; learning 2/1 → 2.0; field 2/1 → 2.0;
    // systems 1/1 → 1.0
    assert(out("deep learning") === ((1L, 4.0)))
    assert(out("deep field") === ((1L, 4.0)))
    assert(out("systems") === ((1L, 1.0)))
  }

  test("rake: repeated phrases count occurrences once per appearance") {
    val docs = Seq((1L, "fast scan and fast scan"), (2L, "fast scan"))
      .toDF("doc_id", "text")
    val out = Rake.topPhrases(docs, "doc_id", "text",
        stops = Seq("and"), topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("fast scan") === 3L)
  }

  test("rake: all-stopword docs contribute nothing; topK caps output") {
    val docs = Seq((1L, "the a the"), (2L, "alpha beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val out = Rake.topPhrases(docs, "doc_id", "text",
        stops = Seq("the", "a"), topK = 1)
      .collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "alpha beta") // longest phrase wins
  }
}
