package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-data curation: Bradley-Terry strength estimation over
  * pairwise comparisons — the ranking step behind RLHF / DPO dataset
  * construction (which item, response, or source wins head-to-head), run
  * as a fixed-iteration integer fixed-point so two engines agree bit-for-
  * bit (beyond-parity; same µ-ladder discipline as Graph.pageRank).
  *
  * Model (Bradley & Terry 1952; MM iteration per Hunter, Ann. Stat. 2004
  * §1): P(i beats j) = s_i / (s_i + s_j); the minorization-maximization
  * update is s_i' = W_i / Σ_j n_ij / (s_i + s_j), with W_i the win count
  * and n_ij the games between i and j. Scores are identifiable only up to
  * a global scale, which we pin by the s⁰ = 1µ start and a FIXED iteration
  * count instead of a normalization step (normalizing needs a geometric
  * mean — irrational, not oracle-exact).
  *
  * Integer discipline: scores live in µ = 10⁻⁶ units; each denominator
  * term is floor(n_ij·10¹² / (s_i + s_j)) (µ⁻¹·10⁻⁶ units), each update
  * floor(W_i·10¹² / D_i) — back in µ. All-positive, so Spark's `div` and
  * DuckDB's `//` agree (both truncate; floor = truncate for positives).
  * Bounds: terms stay under 2⁶³ while n_ij < 9·10⁶ and W_i < 9·10⁶ —
  * holds through sf1.0 at brand grain; at finer item grain raise the
  * grain or drop one 10³ from the ladder (documented, not enforced).
  *
  * Scale shape: items ≪ comparisons always (that is what makes a ranking
  * useful), so the per-iteration join of scores onto the symmetric pair
  * frame broadcasts the score side; each iteration is one broadcast join
  * + one item-keyed aggregation. Comparisons collapse to the (i, j, n)
  * pair frame in ONE shuffle up front — iterations never rescan raw data,
  * the same "aggregate once, iterate small" posture as Bpe.train. */
object Preference {

  private val L = 1000000000000L // 10¹², the µ²-ladder step

  /** Directed comparisons (winner, loser) → the symmetric pair frame:
    * (i, j, nij, wij) for BOTH orientations of every pair — nij games
    * between i and j, wij of them won by i. One shuffle. */
  def pairFrame(comps: DataFrame, winCol: String, loseCol: String): DataFrame = {
    val dc = comps
      .groupBy(col(winCol).as("w"), col(loseCol).as("l"))
      .agg(count(lit(1)).as("n"))
    dc.select(col("w").as("i"), col("l").as("j"), col("n"), col("n").as("wi"))
      .unionByName(dc.select(col("l").as("i"), col("w").as("j"), col("n"),
        lit(0L).as("wi")))
      .groupBy("i", "j")
      .agg(sum("n").as("nij"), sum("wi").as("wij"))
  }

  /** Fixed-iteration Bradley-Terry MM over a directed-comparison frame.
    * Returns (item, wins, games, score_mu): µ-scaled strengths after
    * `iters` exact integer updates from the flat 1µ start. Items that
    * never lose (or never win) get the finite fixed-point of the capped
    * iteration, not ±∞ — the fixed iteration count is also the standard
    * regularization against BT's divergence on dominant items. */
  def btScores(comps: DataFrame, winCol: String, loseCol: String,
               iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val pairs = Frames.truncate(pairFrame(comps, winCol, loseCol))
    val items = pairs.groupBy(col("i").as("item"))
      .agg(sum("wij").cast("long").as("wins"),
        sum("nij").cast("long").as("games"))
      .transform(Frames.truncate)
    var scores = items.select(col("item"), lit(1000000L).as("s"))
    for (_ <- 1 to iters) {
      val den = pairs
        .join(broadcast(scores.select(col("item").as("i"), col("s").as("si"))), "i")
        .join(broadcast(scores.select(col("item").as("j"), col("s").as("sj"))), "j")
        .groupBy(col("i").as("item"))
        .agg(sum(expr(s"(nij * ${L}L) div (si + sj)")).as("den"))
      scores = items.join(den, "item")
        .select(col("item"),
          expr(s"(wins * ${L}L) div den").as("s"))
        .transform(Frames.truncate)
    }
    items.join(scores, "item")
      .select(col("item"), col("wins"), col("games"),
        col("s").as("score_mu"))
  }
}
