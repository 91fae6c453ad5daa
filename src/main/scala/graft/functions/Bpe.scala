package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer machinery (Sennrich et al. 2016), the
  * missing piece between whitespace token counts and a trainable subword
  * vocabulary (beyond-parity; pairs with TextFunctions / Vocab).
  *
  * Everything trains on the WORD-FREQUENCY frame, not the corpus: BPE
  * statistics are invariant to where a word occurs, so the corpus
  * collapses to (word, freq) in one shuffle and every merge round runs
  * over vocabulary-sized data — at 100 TB the vocabulary is millions of
  * rows, not billions, and the per-round argmax is a 1-row collect.
  *
  * The merge application is a greedy left-to-right fold expressed as a
  * codegen'd `aggregate` HOF over the symbol array — no UDF; "aaa" under
  * merge (a,a) becomes [aa, a], exactly the reference semantics. Encoding
  * with a large trained table would chain one fold per merge; that is the
  * documented cutoff where a broadcast trie + mapPartitions takes over
  * (same trade-off as Multimodal's codecs). */
object Bpe {

  /** Corpus → (word, freq), the frame every other entry point consumes. */
  def wordCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextFunctions.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Characters of `word` as an array, empty strings dropped (Spark's
    * split-on-empty-regex can emit boundary empties; DuckDB's does not). */
  private def chars(word: Column): Column =
    filter(split(word, ""), c => length(c) > 0)

  /** Round-0 adjacent character-pair statistics — the data behind the
    * FIRST merge decision, as a queryable frame: (pair, cnt), `pair` the
    * two-character substring, `cnt` summed word frequency. One explode +
    * one shuffle. Guarded for 1-char words (Spark `sequence(1,0)` counts
    * DOWN, it is not empty — the CASE is load-bearing). */
  def pairStats(words: DataFrame, wordCol: String,
                freqCol: String): DataFrame =
    words
      .select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq"))
      .withColumn("pair", explode(expr(
        "CASE WHEN length(word) < 2 THEN array() " +
          "ELSE transform(sequence(1, length(word) - 1), " +
          "i -> substring(word, i, 2)) END")))
      .groupBy("pair").agg(sum("freq").as("cnt"))

  /** One greedy left-to-right merge pass of (a, b) over a symbol array. */
  private[functions] def mergePair(sym: Column, a: String,
                                   b: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), s))))
          .otherwise(concat(acc, array(s))))

  /** Adjacent SYMBOL pairs of the current round, weighted by word freq. */
  private def symbolPairCounts(sym: DataFrame): DataFrame =
    sym.filter(size(col("sym")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(sym) - 1), " +
          "i -> struct(element_at(sym, i) AS l, element_at(sym, i + 1) AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("cnt"))

  /** Train `numMerges` BPE merges. Ties break (count DESC, left ASC,
    * right ASC) so training is deterministic. Each round is one shuffle
    * over the vocabulary + a 1-row collect (the argmax — a scalar, the
    * legitimate driver touch) + one fold pass; `localCheckpoint` per
    * round truncates the iterative lineage. Stops early when no pair
    * reaches `minCount`. */
  def train(words: DataFrame, wordCol: String, freqCol: String,
            numMerges: Int, minCount: Long = 2L): Seq[(String, String)] =
    trainStats(words, wordCol, freqCol, numMerges, minCount)
      .map { case (_, a, b, _) => (a, b) }

  /** [[train]] with the evidence kept: one row per performed merge —
    * (1-based step, left, right, the winning pair count). The count is
    * the adjacent-pair statistic the argmax saw THAT round (post all
    * earlier merges), which makes the whole training trajectory — not
    * just the final table — assertable against an independent engine. */
  def trainStats(words: DataFrame, wordCol: String, freqCol: String,
                 numMerges: Int,
                 minCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 0, s"negative numMerges: $numMerges")
    var sym = words
      .select(chars(col(wordCol)).as("sym"),
        col(freqCol).cast("long").as("freq"))
      .transform(Frames.truncate)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rounds = 0
    var done = false
    while (rounds < numMerges && !done) {
      val top = symbolPairCounts(sym)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((merges.size + 1, a, b, top(0).getLong(2)))
        sym = sym.withColumn("sym", mergePair(col("sym"), a, b))
          .transform(Frames.truncate)
      }
      rounds += 1
    }
    merges.toSeq
  }

  /** Encode a word column with a trained merge table: the merges fold in
    * training order, reproducing the tokenizer exactly. Intended for
    * merge tables small enough to inline as chained expressions. */
  def encode(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(chars(word)) { case (c, (a, b)) => mergePair(c, a, b) }
}
