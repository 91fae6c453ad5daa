package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-vocabulary operators: min-count scrubbing and per-group
  * distinctive terms. Both treat the vocabulary as a DataFrame (never a
  * driver-side set): by Heaps' law the distinct-token table grows
  * sublinearly with the corpus, and every use below is an equi-join or
  * bounded aggregation on it.
  */
object Vocab {

  /** Distribution drift between two corpus snapshots: per-token ppm
    * frequencies in each side, integer-exact (counts → floor-divided ppm,
    * the same quantization as the sampling rates — no fp sum anywhere),
    * ranked by absolute ppm shift. 2·Σ-level drift = the total-variation
    * distance in ppm; the per-token rows are the actionable part of a
    * monitoring report ("which tokens moved").
    *
    * Scale shape: two vocabulary aggregations (map-side combined) and one
    * full-outer join of two vocabulary-sized frames; the corpus is read
    * once per side and never pairwise-compared. Top-k plans as
    * TakeOrderedAndProject.
    *
    * Output: (token, old_ppm, new_ppm, shift_ppm) — top `k` by
    * (shift DESC, token). */
  def driftTopK(oldDocs: DataFrame, newDocs: DataFrame, textCol: String,
                k: Int): DataFrame = {
    def ppm(docs: DataFrame, out: String): DataFrame = {
      val counts = docs
        .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("_c"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      // vocabulary-sized frame: the single-reducer total is over distinct
      // tokens, not the corpus (same note as temperatureMix's strata)
      val a = col("_c").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
        lit(1000000L)
      val b = sum(col("_c")).over(w)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))
      counts.select(col("token"),
        ((a - pmod(a, b)) / b).cast("long").as(out))
    }
    ppm(oldDocs, "old_ppm")
      .join(ppm(newDocs, "new_ppm"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("old_ppm"), lit(0L)).as("old_ppm"),
        coalesce(col("new_ppm"), lit(0L)).as("new_ppm"))
      .withColumn("shift_ppm",
        abs(col("new_ppm") - col("old_ppm")))
      .orderBy(col("shift_ppm").desc, col("token"))
      .limit(k)
  }

  /** Replace every token whose CORPUS frequency is below `minCount` with
    * `unk` — the classic rare-token pass (word2vec/fastText `min_count`,
    * subword-vocab capping) that doubles as privacy hygiene: tokens that
    * appear once in 100 TB are disproportionately names, ids, and keys,
    * and scrubbing them is the cheap complement to pattern-based
    * [[TextFunctions.redactPii]].
    *
    * Scale shape: one explode → count for the vocabulary (map-side
    * combine), one explode → left join of the token stream against the
    * KEPT vocab (hot tokens are join-key skew — AQE splits them; the
    * kept-vocab side is one row per distinct token by construction), one
    * per-doc reassembly whose state is bounded by document length (the
    * nested-docs bound). At extreme scale the kept-vocab probe can ride
    * a bloom filter instead of the join (false positives just keep a
    * rare token) — the join form is the exact, oracle-checkable
    * semantics.
    *
    * Output: (idCol, scrubbed, n_tokens, n_unk); empty docs yield
    * ("", 0, 0). */
  def minCountScrub(docs: DataFrame, idCol: String, textCol: String,
                    minCount: Int, unk: String = "<unk>"): DataFrame = {
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("_toks"))
    val stream = toks.select(col(idCol),
      posexplode(col("_toks")).as(Seq("_p", "_t")))
    val kept = stream.groupBy(col("_t")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minCount).select(col("_t"), lit(1).as("_keep"))
    val per = stream.join(kept, Seq("_t"), "left_outer")
      .withColumn("_out",
        when(col("_keep").isNotNull, col("_t")).otherwise(lit(unk)))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("_p"), col("_out")))),
          _.getField("_out")), " ").as("scrubbed"),
        count(lit(1)).as("n_tokens"),
        count(when(col("_keep").isNull, 1)).as("n_unk"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("scrubbed"), lit("")).as("scrubbed"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"))
  }

  /** Top-`k` collocations by pointwise mutual information —
    *   pmi(a, b) = ln( p(ab) / (p(a) · p(b)) )
    * over adjacent token pairs, with a `minCount` occurrence floor (raw
    * PMI is maximized by hapax pairs; the floor is the standard fix,
    * Church & Hanks 1990). The corpus-describe pass that surfaces
    * multi-word units ("new york", "source code") for tokenizer vocab
    * decisions and template detection — a collocation whose PMI is
    * implausibly high across many docs is usually boilerplate.
    *
    * Scale shape: both count tables are VOCABULARY-sized (Heaps-law
    * sublinear) — unigrams from one explode→count, bigrams from one
    * ngram-explode→count, each map-side combined so shuffle volume is
    * O(partitions × vocab), not O(tokens). Scoring joins the bigram
    * frame to the unigram frame twice on the token key (hot tokens =
    * AQE skew splits); totals ride one-row broadcast frames. The final
    * top-k is `orderBy().limit()` = TakeOrderedAndProject — per-partition
    * top-k, no global sort of the vocabulary.
    *
    * One `ln` over one ratio expression (the [[Dsir]] discipline) so an
    * external SQL oracle recomputes the identical double; output rounds
    * to 6. Ties break bigram-ascending.
    *
    * Output: (bigram, n_pair, pmi) — `k` rows. */
  def pmiTopK(docs: DataFrame, textCol: String, minCount: Long,
              k: Int): DataFrame = {
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("_toks"))
    val uni = toks.select(explode(col("_toks")).as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_cu"))
    val biAll = toks
      .select(explode(TextFunctions.tokenNgrams(col("_toks"), 2)).as("_g"))
      .groupBy(col("_g")).agg(count(lit(1)).as("_cb"))
    val nTok = uni.agg(coalesce(sum(col("_cu")), lit(0L)).as("_n"))
    val nBi = biAll.agg(coalesce(sum(col("_cb")), lit(0L)).as("_nb"))
    val ua = uni.select(col("_t").as("_a"), col("_cu").as("_ca"))
    val ub = uni.select(col("_t").as("_b"), col("_cu").as("_cbu"))
    biAll.filter(col("_cb") >= minCount)
      .withColumn("_a", element_at(split(col("_g"), " ", 2), 1))
      .withColumn("_b", element_at(split(col("_g"), " ", 2), 2))
      .join(ua, Seq("_a")).join(ub, Seq("_b"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .withColumn("pmi", log(
        (col("_cb").cast("double") / col("_nb")) /
          ((col("_ca").cast("double") / col("_n")) *
            (col("_cbu").cast("double") / col("_n")))))
      .orderBy(col("pmi").desc, col("_g").asc)
      .limit(k)
      .select(col("_g").as("bigram"), col("_cb").as("n_pair"),
        round(col("pmi"), 6).as("pmi"))
  }

  /** The `k` most DISTINCTIVE terms per group (source, language, domain
    * …) by group-level tf-idf: score(t, g) = tf(t, g) · ln(G / df(t))
    * with df counted over groups — the corpus-describe pass that tells a
    * pipeline operator what each slice actually contains (and the
    * standard way to spot a contaminated or mislabeled source: its top
    * terms don't match its name).
    *
    * Scale shape: tf is one (group, token) aggregation; df one token
    * aggregation of the tf frame; G a one-row frame cross-joined (never
    * collected); the final top-k is a row_number window over PER-GROUP
    * aggregated vocabulary — bounded by that group's distinct tokens,
    * not its token stream. Groups are few by definition of the use case;
    * a degenerate high-cardinality groupCol degrades to more, smaller
    * windows, never to a corpus-wide sort.
    *
    * Output: (group, term_rank, token, score); score rounded to 6, ties
    * break token-ascending. Terms present in every group score 0 and
    * rank below any term with bite. */
  def topTerms(docs: DataFrame, textCol: String, groupCol: String,
               k: Int): DataFrame = {
    val tf = docs
      .select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("_t"))
      .groupBy(col("grp"), col("_t")).agg(count(lit(1)).as("_tf"))
    val df = tf.groupBy(col("_t")).agg(count(lit(1)).as("_df"))
    val groups = tf.select(col("grp")).distinct()
      .agg(count(lit(1)).as("_g"))
    val scored = tf.join(df, Seq("_t")).crossJoin(broadcast(groups))
      .withColumn("_score",
        col("_tf").cast("double") *
          log(col("_g").cast("double") / col("_df")))
    scored
      .withColumn("term_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("_score").desc, col("_t").asc)))
      .filter(col("term_rank") <= k)
      .select(col("grp"), col("term_rank"), col("_t").as("token"),
        round(col("_score"), 6).as("score"))
  }

  /** χ² feature selection of tokens against a class label — "which tokens
    * carry signal about the language / source / topic" for classifier
    * features or leak auditing. For each token t the 2×|C| contingency
    * table (present/absent × class) collapses algebraically to
    *
    *   χ²(t) = Σ_c D_c² / (N_t · (N − N_t) · N_c),
    *   D_c   = N·N_tc − N_t·N_c
    *
    * (N = docs, N_t = docs containing t, N_c = docs in class c, N_tc =
    * both). The reported score is the integer micro-unit sum of
    * per-class floors — ⌊10⁶·D_c²/…⌋ summed — pure integer arithmetic,
    * no logarithms, so any engine reproduces it bit-for-bit. Tokens
    * present in every doc (N_t = N) carry zero information and score 0
    * (also guards the N−N_t division).
    *
    * Exactness ceiling: 10⁶·D_c² rides DECIMAL(38,0), which bounds N at
    * ~10⁸ docs per run — beyond that, select features on a stratified
    * sample (feature ranking stabilizes long before 10⁸ anyway).
    *
    * Scale: distinct (doc, token) presence explode → one (token, class)
    * aggregate (bounded by vocab × classes) → broadcast class totals →
    * TakeOrderedAndProject top-k. The corpus is scanned once. */
  def chi2TopK(docs: DataFrame, idCol: String, textCol: String,
               classCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"bad topK=$topK")
    val present = docs
      .select(col(idCol).as("_doc"), col(classCol).as("_c"),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("token"))
    val ntc = present.groupBy(col("token"), col("_c"))
      .agg(count(lit(1)).as("n_tc"))
    val nt = ntc.groupBy(col("token")).agg(sum(col("n_tc")).as("n_t"))
    val nc = docs.groupBy(col(classCol).as("_c"))
      .agg(count(lit(1)).as("n_c"))
    val n = docs.agg(count(lit(1)).as("n")).select(col("n"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = dec(col("n")) * col("n_tc") - dec(col("n_t")) * col("n_c")
    val term = when(col("n_t") < col("n"),
      Sampling.intDiv(lit(1000000L).cast("decimal(38,0)") * d * d,
        dec(col("n_t")) * (dec(col("n")) - col("n_t")) * col("n_c")))
      .otherwise(lit(0L))
    // the Σ_c runs over ALL classes — a class where t never occurs still
    // contributes D_c = −N_t·N_c (its absence IS signal), so the grid is
    // vocab × classes (left join fills N_tc = 0), not just observed cells
    nt.crossJoin(broadcast(nc))
      .join(ntc, Seq("token", "_c"), "left_outer")
      .withColumn("n_tc", coalesce(col("n_tc"), lit(0L)))
      .crossJoin(broadcast(n))
      .select(col("token"), col("n_t"), term.as("_term"))
      .groupBy(col("token"))
      .agg(max(col("n_t")).as("n_docs"), sum(col("_term")).as("score_us"))
      .orderBy(col("score_us").desc, col("token").asc)
      .limit(topK)
      .select(col("token"), col("n_docs"), col("score_us"))
  }

  /** Top-k next-token suggestions per context token from the corpus
    * bigram table — the "what usually follows this word" probe behind
    * autocomplete-style QA of a corpus (a context whose top continuations
    * are template boilerplate is a dedup lead). One bigram aggregate,
    * then rank ≤ k per context — plans as WindowGroupLimit (partial
    * top-k before the shuffle), so a hot context token never funnels its
    * whole continuation set through one reducer. (count desc, token)
    * total order keeps the suggestion lists engine-exact. */
  def bigramSuggest(docs: DataFrame, textCol: String,
                    topK: Int): DataFrame = {
    val grams = docs
      .select(explode(TextFunctions.tokenNgrams(
        TextFunctions.tokens(col(textCol)), 2)).as("gram"))
      .select(substring_index(col("gram"), " ", 1).as("w1"),
        substring_index(col("gram"), " ", -1).as("w2"))
    val counts = grams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1")).orderBy(col("n").desc, col("w2"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** Vocabulary-coverage curve at FIXED candidate sizes — the tokenizer-
    * design question "what vocab size covers X% of the token mass",
    * answered scale-safely: each candidate size k is one
    * TakeOrderedAndProject top-k over the count frame (never a global
    * rank window over the whole vocabulary — a 100 TB corpus has a
    * vocabulary far too large to single-reducer sort), summed and set
    * against the total mass as exact floor-ppm. The count frame is
    * persisted once for the |ks|+1 consumers. Ties at every k boundary
    * break on (count desc, token) — a total order, so the curve is
    * engine-exact. Output: (k, covered_tokens, total_tokens,
    * coverage_ppm), |ks| rows. */
  def coverage(docs: DataFrame, textCol: String,
               ks: Seq[Int]): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = counts.agg(sum(col("c")).cast("decimal(38,0)").as("_n"))
    val arms = ks.map { k =>
      counts.orderBy(col("c").desc, col("tok")).limit(k)
        .agg(coalesce(sum(col("c")), lit(0L)).cast("decimal(38,0)").as("_s"))
        .select(lit(k.toLong).as("k"), col("_s"))
    }
    val out = arms.reduce(_ unionAll _)
      .crossJoin(broadcast(total))
      .select(col("k"),
        col("_s").cast("long").as("covered_tokens"),
        col("_n").cast("long").as("total_tokens"),
        when(col("_n") > 0,
          Sampling.intDiv(col("_s") * lit(1000000L), col("_n")))
          .otherwise(lit(0L)).as("coverage_ppm"))
    Frames.sealRelease(out, counts)
  }

  /** Zipf/power-law shape test of the token-frequency distribution — the
    * "does this corpus look like natural language or like template flood"
    * one-row report. Natural text follows freq ∝ rank^-1, which in the
    * log₂-bucketed view (bucket b = tokens occurring in [2^(b-1), 2^b))
    * makes log₂(n_types per bucket) fall LINEARLY with b at slope ≈ −1;
    * boilerplate floods and synthetic grids bend or flatten the line.
    *
    * Engine-exact by construction: both "logs" are `length(bin(x))`
    * (integer log₂, the degreeHistogram convention shared with DuckDB)
    * and the least-squares slope over the (b, log₂ n_types) points is the
    * classic nΣxy−ΣxΣy over nΣx²−(Σx)² form in exact integer arithmetic
    * with one floor division at the end (ppm) — `intDiv`'s pmod form
    * floors negatives exactly like DuckDB `//`, and a Zipf slope IS
    * negative. No libm, no fp accumulation.
    *
    * Scale: one vocabulary aggregation (Heaps-sublinear), one ≤64-group
    * bucket aggregate, one 1-row fold. Output: (n_buckets, vocab_size,
    * slope_ppm) — slope_ppm ≈ −1 000 000 for healthy Zipfian text. */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val pts = counts
      .groupBy(length(bin(col("c"))).cast("long").as("x"))
      .agg(count(lit(1)).as("n_types"))
      .select(col("x"), col("n_types"),
        length(bin(col("n_types"))).cast("long").as("y"))
    pts.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("n_types")), lit(0L)).as("vocab"),
      coalesce(sum(col("x")), lit(0L)).as("sx"),
      coalesce(sum(col("y")), lit(0L)).as("sy"),
      coalesce(sum(col("x") * col("y")), lit(0L)).as("sxy"),
      coalesce(sum(col("x") * col("x")), lit(0L)).as("sxx"))
      .select(
        col("n").as("n_buckets"),
        col("vocab").as("vocab_size"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0, lit(0L))
          .otherwise(Sampling.intDiv(
            (col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("decimal(38,0)") * lit(1000000L),
            col("n") * col("sxx") - col("sx") * col("sx")))
          .as("slope_ppm"))
  }

  /** Heaps'-law vocabulary-growth profile V(n) ≈ K·n^β (Heaps 1978): the
    * capacity-planning curve for vocabulary/embedding tables ("how many
    * new types will the next 10 TB add"). Zipf's companion — both fit on
    * the same integer log₂ buckets (`length(bin(x))`, identical in Spark
    * and DuckDB) with the same integer least squares, so the estimates
    * are engine-exact.
    *
    * The corpus prefix order is doc-id order; `checkpoints` prefix
    * cutoffs at ⌊maxId·i/cp⌋ become driver literals (one 1-row max — the
    * PPR-n pattern), so the whole profile is TWO single-scan conditional
    * aggregations: prefix token totals from the per-doc frame, prefix
    * vocabulary sizes from the term → min(doc_id) first-occurrence frame
    * (count(first_occ ≤ cutoff) — no per-prefix rescan, no window).
    *
    * Output: one row per checkpoint (cp, cutoff_id, prefix_tokens,
    * prefix_vocab) with the shared slope_ppm (β in ppm) on every row. */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
               checkpoints: Int = 8): DataFrame = {
    require(checkpoints >= 2 && checkpoints <= 32, s"bad cp=$checkpoints")
    val d = docs.select(col(idCol).cast("long").as("_id"),
      TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("_id"), size(col("_toks")).cast("long").as("_nt"),
        col("_toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxIdRow = d.agg(max(col("_id"))).head()
    require(!maxIdRow.isNullAt(0),
      s"heapsFit: $idCol has no non-null rows (empty corpus?)")
    val maxId = maxIdRow.getLong(0)
    val cuts = (1 to checkpoints).map(i => maxId * i / checkpoints)

    val tokAgg = d.agg(
      cuts.zipWithIndex.map { case (c, i) =>
        sum(when(col("_id") <= c, col("_nt")).otherwise(0L)).as(s"t$i")
      }.head,
      cuts.zipWithIndex.tail.map { case (c, i) =>
        sum(when(col("_id") <= c, col("_nt")).otherwise(0L)).as(s"t$i")
      }: _*)
    val firstOcc = d.select(col("_id"), explode(col("_toks")).as("_tok"))
      .groupBy(col("_tok")).agg(min(col("_id")).as("_fd"))
    val vocAgg = firstOcc.agg(
      cuts.zipWithIndex.map { case (c, i) =>
        sum(when(col("_fd") <= c, 1L).otherwise(0L)).as(s"v$i")
      }.head,
      cuts.zipWithIndex.tail.map { case (c, i) =>
        sum(when(col("_fd") <= c, 1L).otherwise(0L)).as(s"v$i")
      }: _*)

    val stackExpr = "stack(" + checkpoints + ", " +
      cuts.zipWithIndex.map { case (c, i) =>
        s"CAST(${i + 1} AS BIGINT), CAST($c AS BIGINT), t$i, v$i"
      }.mkString(", ") + ") as (cp, cutoff_id, prefix_tokens, prefix_vocab)"
    val pts = tokAgg.crossJoin(vocAgg).select(expr(stackExpr))
      .withColumn("x", length(bin(col("prefix_tokens"))).cast("long"))
      .withColumn("y", length(bin(col("prefix_vocab"))).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val slope = pts.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0, lit(0L))
          .otherwise(Sampling.intDiv(
            (col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("decimal(38,0)") * lit(1000000L),
            col("n") * col("sxx") - col("sx") * col("sx")))
          .as("slope_ppm"))
    val out = pts
      .select(col("cp"), col("cutoff_id"), col("prefix_tokens"),
        col("prefix_vocab"))
      .crossJoin(broadcast(slope))
      .transform(Frames.truncate)
    d.unpersist(false)
    pts.unpersist(false)
    out
  }
}
