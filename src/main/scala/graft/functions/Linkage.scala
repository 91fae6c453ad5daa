package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: fuzzy string matching at corpus
  * scale via the classic blocking + verify split (beyond-parity — the
  * reference joins only on exact keys).
  *
  * All-pairs edit distance is O(n²) and never runs; instead candidate
  * pairs come from an inverted TOKEN index (two names are candidates only
  * if they share a token), and only candidates pay the Levenshtein
  * verify. Hot blocks — stop-tokens shared by a large fraction of names —
  * are dropped by a posting-size cap BEFORE pair emission, the same
  * broadcast-free guard as Dedup's LSH buckets: a token with p postings
  * emits p·(p-1)/2 pairs, so the cap bounds every block's quadratic cost
  * while typo-pairs keep matching through their other (rarer) tokens.
  *
  * The whole pipeline is three shuffles (token postings, pair dedup, the
  * final distinct) over codegen'd built-ins — `levenshtein` is a native
  * Catalyst expression, no UDF. */
object Linkage {

  /** Candidate-verified fuzzy name pairs.
    *
    * Input: one row per ENTITY (distinct name) with a support count
    * column `nCol` (how many records carry the name). Output:
    * (name_a, name_b, dist, n_a, n_b) with name_a < name_b and
    * dist <= maxDist.
    *
    * `tokenCap` drops blocking tokens with more than that many postings;
    * deterministic, so a differential oracle can mirror it exactly. */
  def blockedFuzzyPairs(entities: DataFrame, nameCol: String, nCol: String,
                        maxDist: Int, tokenCap: Int): DataFrame = {
    require(maxDist >= 0 && tokenCap >= 2,
      s"bad params maxDist=$maxDist tokenCap=$tokenCap")
    val postings = entities
      .select(col(nameCol).as("__name"), col(nCol).as("__n"))
      .filter(col("__name").isNotNull)
      .withColumn("__tok",
        explode(split(col("__name"), "\\s+")))
      .filter(length(col("__tok")) > 0)
    // stop-token screen: posting size over the cap ⇒ the block is dropped.
    // The hot-token list is tiny by construction (few tokens can exceed
    // the cap), so it broadcasts onto an anti-join — no extra wide shuffle
    val hot = postings.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__psize"))
      .filter(col("__psize") > tokenCap)
      .select(col("__tok"))
    val kept = postings.join(broadcast(hot), Seq("__tok"), "left_anti")
    val a = kept.select(col("__tok"), col("__name").as("name_a"),
      col("__n").as("n_a"))
    val b = kept.select(col("__tok"), col("__name").as("name_b"),
      col("__n").as("n_b"))
    a.join(b, Seq("__tok"))
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b", "n_a", "n_b")
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }
}
