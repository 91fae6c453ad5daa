package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — the public
  * hashed-n-gram data-selection technique for LLM pre-training corpora
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): fit two bag-of-hashed-n-gram
  * distributions — one on a small curated TARGET corpus, one on the RAW
  * corpus — and score every raw document by its log likelihood ratio
  *   log w(d) = Σ_{g ∈ ngrams(d)} [ log p_target(bucket(g))
  *                                 − log p_raw(bucket(g)) ],
  * then sample the training subset with Gumbel top-k (sampling without
  * replacement proportional to w, Vieira 2014) so selection keeps
  * diversity instead of collapsing onto the single highest-ratio mode.
  *
  * Scale design (the reason this shape survives 100 TB):
  *   - features are HASHED into a fixed bucket space (default 4096 here,
  *     10⁵–10⁶ in production): both count tables are bounded by `buckets`
  *     rows regardless of corpus size, so the fitted model rides the
  *     score join as a BROADCAST — the exploded raw n-gram stream is
  *     never shuffled, and scoring is one scan + one per-doc partial
  *     aggregation (map-side combine on doc_id).
  *   - fitting is two groupBy counts over exploded n-grams — map-side
  *     partial agg collapses each partition to ≤ `buckets` rows before
  *     the exchange, so shuffle volume is O(partitions × buckets), not
  *     O(tokens).
  *   - nothing touches the driver: the "model" is two small DataFrames
  *     plus a one-row totals frame, exactly like [[LangModel]].
  *   - the per-doc Σ goes through DECIMAL(27,12): double accumulation
  *     order differs between engines/partitionings, decimal sums do not
  *     — the same cross-engine discipline every LM scorer here uses.
  *   - selection is `orderBy(key).limit(k)` = TakeOrderedAndProject:
  *     per-partition top-k then a driver merge of k×partitions rows —
  *     no global sort of the corpus.
  *
  * Cross-engine determinism: buckets and Gumbel noise derive from md5
  * (`Sampling.stableBucket`'s trick), so an external SQL oracle
  * recomputes the identical selection — which is also what makes the
  * selected subset reproducible across reruns and cluster layouts, a
  * prerequisite for auditable training-data lineage.
  */
object Dsir {

  /** Stable feature bucket in [0, buckets): md5-hex prefix mod n.
    * SQL twin: `('0x' || substring(md5(g), 1, 8))::BIGINT % n`.
    * Runs per TOKEN and per BIGRAM — the hottest md5 stream in the
    * suite, so it rides the native digest-bytes kernel
    * (`graft_md5prefix`, value-pinned by `Md5PrefixExprSpec`). */
  def featureBucket(feat: Column, buckets: Int): Column =
    pmod(Dedup.Md5Hasher.prefixLong(feat, 8), lit(buckets.toLong))

  /** Hashed unigram + bigram feature buckets of a MATERIALIZED token
    * array column (HOF lambdas re-evaluate outer expressions per
    * element — select `tokens(text)` into a column first). */
  def hashedFeatures(toks: Column, buckets: Int): Column =
    concat(
      transform(toks, t => featureBucket(t, buckets)),
      transform(TextFunctions.tokenNgrams(toks, 2),
        g => featureBucket(g, buckets)))

  /** Importance weights for every `raw` document against a fitted
    * target/raw bucket model. Input frames carry (idCol, featsCol:
    * array<long>) — build featsCol with [[hashedFeatures]]. Output:
    * (doc_id, n_feats, log_weight) with log_weight rounded to 6 (0.0
    * for featureless docs). Smoothing is additive: p(b) = (c_b + 0.5) /
    * (N + 0.5·buckets), so unseen buckets stay finite on both sides. */
  def importanceWeights(raw: DataFrame, idCol: String, featsCol: String,
                        target: DataFrame, targetFeatsCol: String,
                        buckets: Int): DataFrame = {
    val tCounts = target.select(explode(col(targetFeatsCol)).as("_b"))
      .groupBy(col("_b")).agg(count(lit(1)).as("_ct"))
    val rCounts = raw.select(explode(col(featsCol)).as("_b"))
      .groupBy(col("_b")).agg(count(lit(1)).as("_cr"))
    // totals as a one-row frame cross-joined onto the stream (NOT folded
    // into the ratio table): a held-out doc whose bucket misses the
    // ratio join entirely must still see N_t/N_r for its smoothed term
    val totals = tCounts.agg(coalesce(sum(col("_ct")), lit(0L)).as("_nt"))
      .crossJoin(rCounts.agg(coalesce(sum(col("_cr")), lit(0L)).as("_nr")))
    // align the two count tables by union + re-aggregate, NOT a full-outer
    // join: both frames are ≤ `buckets` rows but Catalyst has no stats to
    // know that, and a full outer plans as a sort-merge join — a union of
    // two bounded frames re-aggregates for free
    val ratio = tCounts.select(col("_b"), col("_ct"), lit(0L).as("_cr"))
      .unionByName(rCounts.select(col("_b"), lit(0L).as("_ct"), col("_cr")))
      .groupBy(col("_b"))
      .agg(sum(col("_ct")).as("_ct"), sum(col("_cr")).as("_cr"))
    val half = lit(0.5 * buckets)
    // one ln over one ratio expression — the oracle spells the SAME tree,
    // so libm agreement is only needed once per term, not per log
    val term = log(
      ((coalesce(col("_ct"), lit(0L)).cast("double") + 0.5) /
        (col("_nt").cast("double") + half)) /
      ((coalesce(col("_cr"), lit(0L)).cast("double") + 0.5) /
        (col("_nr").cast("double") + half)))
    raw.select(col(idCol).as("doc_id"), explode_outer(col(featsCol)).as("_b"))
      .join(broadcast(ratio), Seq("_b"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("_term",
        when(col("_b").isNotNull, term).cast("decimal(27,12)"))
      .groupBy(col("doc_id"))
      .agg(count(col("_b")).as("n_feats"),
        coalesce(round(sum(col("_term")).cast("double"), 6), lit(0.0))
          .as("log_weight"))
  }

  /** Deterministic Gumbel noise for a doc id: g = −ln(−ln(u)) with
    * u ∈ (0,1) derived from md5 ("gumbel:" prefix decorrelates it from
    * every other md5-of-id stream in the pipeline — the split buckets,
    * the salt family, the fingerprints). 13 hex chars = 52 bits, so the
    * conv can never overflow a long and u is exact in a double. */
  def gumbelNoise(id: Column): Column = {
    val u = (Dedup.Md5Hasher.prefixLong(
      concat(lit("gumbel:"), id.cast("string")), 13)
      .cast("double") + 0.5) / lit(4503599627370496.0) // 2^52
    -log(-log(u))
  }

  /** Gumbel top-k resample over a weights frame: key = log_weight + g,
    * take the k largest keys — equivalent to sampling k docs without
    * replacement with probability ∝ w (Vieira 2014), but a pure
    * function of (id, weight): reproducible anywhere, SQL-recomputable,
    * and distributed as TakeOrderedAndProject (no global sort). */
  def gumbelTopK(weights: DataFrame, idCol: String, weightCol: String,
                 k: Int): DataFrame =
    weights
      .withColumn("sample_key",
        round(col(weightCol) + gumbelNoise(col(idCol)), 6))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
}
