package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

/** The native `graft_shingles` kernel must be VALUE-IDENTICAL to the
  * composed HOF chain it replaced (`wordShinglesComposed` /
  * `wordNgramsComposed` stay in the tree as the executable spec):
  * same tokens (lower + \s+ split + drop-empties), same n-windows
  * joined on one space, same first-occurrence dedup, same null/empty
  * conventions. */
class ShinglesExprSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "The quick brown fox jumps over the lazy dog",
    "the the the the",                        // heavy duplication
    "  leading and   trailing  whitespace\t\n mixed ",
    "one two",                                // fewer than 3 tokens
    "one",
    "",
    "ONE two THREE two one two three",        // case folding + repeats
    "tab\tseparated\nnewlinevt\ffeed tokens here",
    "unicode Ünïcødé ünïcødé 中文 分词 中文 分词 中文 tokens",
    "a b a b a b a b c",                      // overlapping repeats
    "x " * 200,                               // long repetitive doc
    null.asInstanceOf[String]
  ).toDF("text")

  test("graft_shingles(distinct) ≡ composed wordShingles for n in 1..4") {
    for (n <- 1 to 4) {
      val r = texts.select(
        TextFunctions.wordShingles(col("text"), n).as("nat"),
        TextFunctions.wordShinglesComposed(col("text"), n).as("hof"))
        .collect()
      r.foreach { row =>
        assert(row.isNullAt(0) === row.isNullAt(1), s"null drift at n=$n")
        if (!row.isNullAt(0))
          assert(row.getSeq[String](0) === row.getSeq[String](1),
            s"value drift at n=$n")
      }
    }
  }

  test("graft_shingles(multiplicity) ≡ composed wordNgrams for n in 1..4") {
    for (n <- 1 to 4) {
      val r = texts.select(
        TextFunctions.wordNgrams(col("text"), n).as("nat"),
        TextFunctions.wordNgramsComposed(col("text"), n).as("hof"))
        .collect()
      r.foreach { row =>
        assert(row.isNullAt(0) === row.isNullAt(1), s"null drift at n=$n")
        if (!row.isNullAt(0))
          assert(row.getSeq[String](0) === row.getSeq[String](1),
            s"value drift at n=$n")
      }
    }
  }

  test("randomized corpus: distinct + multiplicity agree with the spec") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("alpha", "beta", "GAMMA", "δ", "中文", "word-x",
      "N0", "", " ", "\t", "ünï")
    val docs = (1 to 300).map { _ =>
      (1 to rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.size))).mkString(" ")
    }.toDF("text")
    val r = docs.select(
      TextFunctions.wordShingles(col("text"), 3).as("natD"),
      TextFunctions.wordShinglesComposed(col("text"), 3).as("hofD"),
      TextFunctions.wordNgrams(col("text"), 2).as("natM"),
      TextFunctions.wordNgramsComposed(col("text"), 2).as("hofM"))
      .collect()
    r.foreach { row =>
      assert(row.getSeq[String](0) === row.getSeq[String](1))
      assert(row.getSeq[String](2) === row.getSeq[String](3))
    }
  }

  test("resolves through SQL after extension registration") {
    Seq("a b c d").toDF("t").createOrReplaceTempView("sh_t")
    val r = spark.sql(
      "SELECT graft_shingles(t, 2, true) AS s FROM sh_t").collect()
    assert(r(0).getSeq[String](0) === Seq("a b", "b c", "c d"))
  }
}
