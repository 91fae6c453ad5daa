package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** 64-bit safety bound for the µ²-ladder: every product in the MM
    * update is ≤ games·10¹², and games < 9·10⁶ keeps that under 2⁶³.
    * Checked loudly at item grain (games dominates both wins and every
    * per-pair nij), so silent long wraparound cannot corrupt scores —
    * the fix is to coarsen the item grain or drop one 10³ from L. */
  private val MaxGames = 9000000L

  /** Score ceiling (10¹⁵ µ): bounds s_i + s_j at 2·10¹⁵ so the
    * denominator addition can never wrap 64 bits (see btScores doc). */
  private val ScoreCeil = 1000000000000000L

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
    * regularization against BT's divergence on dominant items.
    *
    * Degenerate-denominator guard: when an item's D_i floors to 0 (every
    * opponent's s_i + s_j exceeds n_ij·10¹² — possible after a score
    * explosion) the update keeps the PREVIOUS score instead of dividing
    * into NULL, the same `den == 0` fallback as the in-test reference
    * iteration; a zero s_i + s_j term (two never-win items meeting)
    * yields a NULL `div` that the sum skips, so it contributes 0 to D_i
    * rather than poisoning the whole denominator. Scores additionally
    * clamp at 10¹⁵ µ (10⁹× the start — far past any meaningful strength
    * ratio): without the ceiling, two items whose scores both approach
    * wins·10¹² could make the s_i + s_j ADDITION wrap a 64-bit long
    * negative, and a negative denominator term slips past the den == 0
    * guard silently. Both the fallback and the clamp are mirrored
    * term-for-term in the SQL oracle. */
  def btScores(comps: DataFrame, winCol: String, loseCol: String,
               iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val pairs = Frames.truncate(pairFrame(comps, winCol, loseCol))
    val items = pairs.groupBy(col("i").as("item"))
      .agg(sum("wij").cast("long").as("wins"),
        sum("nij").cast("long").as("games"))
      // loud 64-bit bound (see MaxGames): `games` is consumed by the
      // public output, so the branch cannot be pruned away
      .withColumn("games",
        when(col("games") < lit(MaxGames), col("games"))
          .otherwise(raise_error(concat(
            lit(s"Preference.btScores: games >= $MaxGames for item "),
            col("item").cast("string"),
            lit(" - the 10^12 ladder would overflow 64 bits; coarsen the " +
              "item grain or lower the ladder")))))
      .transform(Frames.truncate)
    var scores = items.select(col("item"), lit(1000000L).as("s"))
    for (_ <- 1 to iters) {
      val den = pairs
        .join(broadcast(scores.select(col("item").as("i"), col("s").as("si"))), "i")
        .join(broadcast(scores.select(col("item").as("j"), col("s").as("sj"))), "j")
        .groupBy(col("i").as("item"))
        .agg(sum(expr(s"(nij * ${L}L) div (si + sj)")).as("den"))
      scores = items.join(den, "item")
        .join(scores.select(col("item"), col("s").as("_prev")), "item")
        .select(col("item"),
          least(
            when(col("den").isNull || col("den") === 0L, col("_prev"))
              .otherwise(expr(s"(wins * ${L}L) div den")),
            lit(ScoreCeil)).as("s"))
        .transform(Frames.truncate)
    }
    items.join(scores, "item")
      .select(col("item"), col("wins"), col("games"),
        col("s").as("score_mu"))
  }

  /** Krippendorff's alpha (nominal) over the pairwise-comparison log — the
    * annotation-reliability gate a preference dataset passes BEFORE any
    * Bradley-Terry fit is trusted: near-0 alpha means the comparisons are
    * coin flips and the fitted ranking is noise.
    *
    * Framing (Krippendorff 2004 §11; nominal data, binary categories):
    * each unordered item pair (i, j), i < j, is a UNIT; every logged
    * comparison of that pair is one rating with category "i won" or
    * "j won". Only units with n_u ≥ 2 ratings are pairable. Then
    * α = 1 − D_o/D_e with
    *   D_o = (1/n) Σ_u 2·o_u1·o_u2 / (n_u − 1)   (observed disagreement)
    *   D_e = 2·n₁·n₂ / (n·(n−1))                  (expected from margins)
    * where o_u1/o_u2 are the unit's category counts, n₁/n₂ the global
    * ones, n = Σ n_u.
    *
    * Integer discipline: the per-unit D_o term is floored to µ8 units
    * (`(2·o1·o2·10⁸) div (n_u−1)` — non-negative, so Spark `div` and
    * DuckDB `//` agree), making the sum an order-free integer like the
    * PSI terms; the final α is assembled from that sum and the EXACT
    * global counts in DECIMAL(38,0) (the cross product n·(n−1)·10⁸-scale
    * terms overflow 64 bits at corpus grain):
    *   α_ppm = 10⁶ − (do_mu8_sum·(n−1)·10⁶) div (2·n₁·n₂·10⁸).
    *
    * Scale shape: one shuffle to (unit, o1, n) counts, one global 1-row
    * aggregate — nothing here is more than two hash aggregations over the
    * comparison log. */
  def krippendorffAlpha(comps: DataFrame, winCol: String,
                        loseCol: String): DataFrame = {
    val units = comps
      .select(least(col(winCol), col(loseCol)).as("i"),
        greatest(col(winCol), col(loseCol)).as("j"),
        when(col(winCol) <= col(loseCol), 1L).otherwise(0L).as("low_win"))
      .groupBy("i", "j")
      .agg(sum("low_win").as("o1"), count(lit(1)).as("n_u"))
      .filter(col("n_u") >= 2)
    units
      .select(col("o1"), (col("n_u") - col("o1")).as("o2"), col("n_u"),
        // DECIMAL(38,0) intermediate: the long form 2·o1·o2·10⁸ wraps
        // silently once a unit holds ≳4.3·10⁵ ratings — real at corpus
        // grain. The SUM still fits BIGINT until ~9.2·10¹⁰ pairable
        // ratings (each term ≤ n_u·10⁸/2 · 2 = n_u·10⁸... bounded by
        // n·10⁸/2 total); past that, drop the ladder to µ6
        expr("CAST((CAST(o1 AS DECIMAL(38,0)) * (n_u - o1) * 200000000) " +
          "div (n_u - 1) AS BIGINT)").as("t_mu8"))
      .agg(count(lit(1)).as("n_units"), sum("n_u").as("n_ratings"),
        sum("o1").as("n_low"), sum("o2").as("n_high"),
        sum("t_mu8").as("do_mu8"))
      .select(col("n_units"), col("n_ratings"), col("n_low"), col("n_high"),
        col("do_mu8"),
        // D_e = 0 (a degenerate log where one category never occurs) has
        // no defined alpha — NULL, guarded identically in the oracle
        expr("CASE WHEN n_low = 0 OR n_high = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE 1000000L - (CAST(do_mu8 AS DECIMAL(38,0)) * " +
          "CAST(n_ratings - 1 AS DECIMAL(38,0)) * CAST(1000000 AS DECIMAL(38,0))) div " +
          "(CAST(n_low AS DECIMAL(38,0)) * CAST(n_high AS DECIMAL(38,0)) * " +
          "CAST(200000000 AS DECIMAL(38,0))) END").as("alpha_ppm"))
  }

  /** GENERAL-NOMINAL Krippendorff's alpha — [[krippendorffAlpha]] without
    * the two-category restriction: real annotation logs rate a unit into
    * ≥3 nominal categories with arbitrary per-unit rater multiplicity.
    * Input is the raw rating stream, one row = one rating (unit,
    * category). With per-unit category counts o_uc and margins n_c over
    * the PAIRABLE units (n_u ≥ 2 — unpairable units drop from margins
    * too, per Krippendorff):
    *   D_o ∝ Σ_u (n_u² − Σ_c o_uc²) / (n_u − 1)
    *   D_e ∝ (n² − Σ_c n_c²) / (n(n−1))
    *   α = 1 − D_o/D_e
    * (the Σ_{c≠c'} o_uc·o_uc' cross terms collapse to n_u² − Σ o_uc²;
    * for two categories both reduce EXACTLY to the binary form — 2·o1·o2
    * and 2·n1·n2 — so the binary operator is the special case, spec-
    * pinned). Same integer ladder as the binary form: per-unit terms
    * floored to µ8 in DECIMAL(38,0) (order-free integer sum), final α
    * assembled from exact global counts:
    *   α_ppm = 10⁶ − (do_mu8·(n−1)·10⁶) div ((n² − Σ n_c²)·10⁸),
    * NULL when D_e = 0 (single-category log). Bounds: n ≤ 10⁹ ratings
    * keeps every product under 10³³ ≪ 10³⁸.
    *
    * Scale shape: two hash aggregations (ratings → (unit, cat) counts →
    * per-unit terms), one unit-keyed semi-join for the pairable margins
    * riding the same (unit)-partial shuffle, and two 1-row aggregates —
    * nothing wider than the rating log's own key space. */
  def krippendorffAlphaNominal(ratings: DataFrame, unitCol: String,
                               catCol: String): DataFrame = {
    val uc = ratings
      .groupBy(col(unitCol).as("u"), col(catCol).as("c"))
      .agg(count(lit(1)).as("o"))
    val units = uc.groupBy("u")
      .agg(sum("o").as("n_u"),
        sum(expr("CAST(o AS DECIMAL(38,0)) * o")).as("ss"))
      .filter(col("n_u") >= 2)
    val terms = units.select(col("u"), col("n_u"),
      expr("CAST(((CAST(n_u AS DECIMAL(38,0)) * n_u - ss) * 100000000) " +
        "div (n_u - 1) AS BIGINT)").as("t_mu8"))
    val cats = uc.join(units.select(col("u")), Seq("u"), "left_semi")
      .groupBy("c").agg(sum("o").as("n_c"))
    val catAgg = cats.agg(count(lit(1)).as("n_cats"),
      sum(expr("CAST(n_c AS DECIMAL(38,0)) * n_c")).as("sc"))
    terms
      .agg(count(lit(1)).as("n_units"), sum("n_u").as("n_ratings"),
        sum("t_mu8").as("do_mu8"))
      .crossJoin(broadcast(catAgg))
      .select(col("n_units"), col("n_ratings"), col("n_cats"),
        col("do_mu8"),
        expr("CASE WHEN CAST(n_ratings AS DECIMAL(38,0)) * n_ratings - sc = 0 " +
          "THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(1000000 - (CAST(do_mu8 AS DECIMAL(38,0)) * " +
          "CAST(n_ratings - 1 AS DECIMAL(38,0)) * 1000000) div " +
          "((CAST(n_ratings AS DECIMAL(38,0)) * n_ratings - sc) * " +
          "100000000) AS BIGINT) END").as("alpha_ppm"))
  }

  /** INTERVAL-metric Krippendorff's alpha — the variant for NUMERIC
    * ratings (1–10 quality scores, Likert scales): disagreement between
    * two ratings is their squared difference δ²(v,w) = (v−w)², not the
    * nominal 0/1. The category double-sums collapse to moment form:
    *   Σ_{v,w} o_v o_w (v−w)² = 2(n_u·Σo v² − (Σo v)²)
    * per unit, and the same for the margins, so the whole statistic
    * rides (count, Σv, Σv²) — two hash aggregations, like its siblings.
    * On {0,1} ratings it reduces EXACTLY to [[krippendorffAlpha]]
    * (v² = v makes both moment forms 2·o1·o2 — spec-pinned), making the
    * binary gate the two-point special case of this operator as well.
    *
    * Integer ladder: values cast to long; per-unit terms
    * (2(n_u·s2 − s1²)·10⁸) div (n_u−1) computed in DECIMAL(38,0) and
    * floored to a µ8 BIGINT term (order-free sum);
    *   α_ppm = 10⁶ − (do_mu8·(n−1)·10⁶) div (2(n·S2 − S1²)·10⁸),
    * NULL when every rating is the same value (D_e = 0). BIGINT bound:
    * per-unit terms scale with n_u·range²·10⁸ (n_u·s2 − s1² = n_u²·var ≤
    * n_u²·range²/4), so BOTH the per-unit BIGINT cast and the do_mu8 sum
    * stay inside 2⁶³ iff roughly n·range² ≤ 4.6·10¹⁰ — 10⁹ ratings on a
    * 1–10 scale fits with two orders to spare, but wide-ranged
    * measurements must RESCALE first (e.g. a range-10⁶ signal at 10⁶
    * ratings wraps); the reliability literature's own convention (alpha
    * is scale-invariant under affine rescaling, so dividing by a
    * constant changes nothing). */
  def krippendorffAlphaInterval(ratings: DataFrame, unitCol: String,
                                valCol: String): DataFrame = {
    val units = ratings
      .select(col(unitCol).as("u"), col(valCol).cast("long").as("v"))
      .groupBy("u")
      .agg(count(lit(1)).as("n_u"),
        sum(expr("CAST(v AS DECIMAL(38,0))")).as("s1"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("s2"))
      .filter(col("n_u") >= 2)
    units
      .select(col("n_u"),
        expr("CAST(((CAST(n_u AS DECIMAL(38,0)) * s2 - s1 * s1) * 200000000) " +
          "div (n_u - 1) AS BIGINT)").as("t_mu8"),
        col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_units"), sum("n_u").as("n_ratings"),
        sum("t_mu8").as("do_mu8"),
        sum("s1").as("_S1"), sum("s2").as("_S2"))
      .select(col("n_units"), col("n_ratings"), col("do_mu8"),
        expr("CASE WHEN CAST(n_ratings AS DECIMAL(38,0)) * _S2 - _S1 * _S1 = 0 " +
          "THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(1000000 - (CAST(do_mu8 AS DECIMAL(38,0)) * " +
          "CAST(n_ratings - 1 AS DECIMAL(38,0)) * 1000000) div " +
          "((CAST(n_ratings AS DECIMAL(38,0)) * _S2 - _S1 * _S1) * " +
          "200000000) AS BIGINT) END").as("alpha_ppm"))
  }

  /** PER-PROMPT DPO pair construction — the shape a DPO trainer actually
    * consumes: chosen and rejected are responses to the SAME prompt, not
    * global winners ([[btScores]] ranks globally; a training pair built
    * from two different prompts teaches nothing). Per prompt: each item's
    * win rate over that prompt's comparisons, then the top-rate item
    * (ties → lowest item) versus the bottom-rate item (ties → highest
    * item), emitted only when the chosen rate STRICTLY exceeds the
    * rejected rate — spelled division-free as wins_c·games_r >
    * wins_r·games_c, so the gate is exact where floored ppm rates could
    * tie across a real gap.
    *
    * Scale shape: one shuffle to (prompt, item) stats, then two
    * row_numbers over the SAME prompt partitioning (one exchange,
    * per-prompt groups are response-count-sized — never corpus-wide),
    * and a prompt-keyed argmax agg. Output: (prompt, chosen, rejected,
    * chosen_ppm, rejected_ppm), rates floored to ppm. */
  def promptPairs(comps: DataFrame, promptCol: String, winCol: String,
                  loseCol: String): DataFrame = {
    val stats = comps
      .select(col(promptCol).as("prompt"), col(winCol).as("item"),
        lit(1L).as("win"))
      .unionByName(comps.select(col(promptCol).as("prompt"),
        col(loseCol).as("item"), lit(0L).as("win")))
      .groupBy("prompt", "item")
      .agg(sum("win").as("wins"), count(lit(1)).as("games"))
      .withColumn("rate_ppm", expr("(wins * 1000000L) div games"))
    val best = Window.partitionBy(col("prompt"))
      .orderBy(col("rate_ppm").desc, col("item").asc)
    val worst = Window.partitionBy(col("prompt"))
      .orderBy(col("rate_ppm").asc, col("item").desc)
    stats
      .withColumn("rb", row_number().over(best))
      .withColumn("rw", row_number().over(worst))
      .filter(col("rb") === 1 || col("rw") === 1)
      .groupBy("prompt")
      .agg(
        max(when(col("rb") === 1, struct(col("item"), col("wins"),
          col("games"), col("rate_ppm")))).as("c"),
        max(when(col("rw") === 1, struct(col("item"), col("wins"),
          col("games"), col("rate_ppm")))).as("r"))
      .filter(col("c.wins") * col("r.games") > col("r.wins") * col("c.games"))
      .select(col("prompt"), col("c.item").as("chosen"),
        col("r.item").as("rejected"), col("c.rate_ppm").as("chosen_ppm"),
        col("r.rate_ppm").as("rejected_ppm"))
  }
}
