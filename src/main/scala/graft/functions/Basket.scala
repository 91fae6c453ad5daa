package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining (beyond-parity): pairwise item
  * support and lift over transaction baskets — the level-2 A-Priori slice
  * (Agrawal & Srikant VLDB'94) that powers "bought-together" surfacing and,
  * on a training corpus, tag/label co-occurrence auditing.
  *
  * lift(a,b) = P(a,b) / (P(a)·P(b)) = N·c_ab / (c_a·c_b), reported in
  * integer ppm computed through DECIMAL(38,0) (`Sampling.intDiv`) — the
  * 10⁶·N·c_ab product overflows a long once N passes ~10⁵·c, so the wide
  * integer path is the only form that is BOTH exact and scale-safe
  * (HUGEINT `//` on the oracle side, same quotient).
  *
  * Scale shape: distinct (basket, item) persists once for its three
  * consumers (basket count, item supports, pair emission); pairs come from
  * the grouped-member-list pattern (one shuffle, ordered in-place emission,
  * NO self-join) with an explicit basket-size cap — a degenerate mega-
  * basket is a quadratic bomb, the same guard as LSH buckets; the final
  * ranking is `orderBy().limit()` (TakeOrderedAndProject). */
object Basket {

  /** Top-k co-occurring item pairs by (support, ids).
    * Output: (item_a, item_b, support, lift_ppm), item_a < item_b. */
  def pairStats(items: DataFrame, basketId: String, itemId: String,
                minSupport: Long, topK: Int,
                maxBasket: Int = 1000): DataFrame = {
    require(minSupport >= 1 && topK >= 1, "bad minSupport/topK")
    val b = items.select(col(basketId).as("bid"), col(itemId).as("item"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nb = b.agg(count_distinct(col("bid")).as("nb"))
    val ci = b.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val pairs = b.groupBy(col("bid"))
      .agg(sort_array(collect_list(col("item"))).as("_ms"))
      .filter(size(col("_ms")) <= maxBasket)
      .select(posexplode(col("_ms")).as(Seq("_i", "item_a")), col("_ms"))
      .select(col("item_a"),
        explode(slice(col("_ms"), col("_i") + lit(2), size(col("_ms"))))
          .as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val out = pairs
      .join(ci.select(col("item").as("item_a"), col("c").as("_ca")), Seq("item_a"))
      .join(ci.select(col("item").as("item_b"), col("c").as("_cb")), Seq("item_b"))
      .crossJoin(broadcast(nb))
      .withColumn("lift_ppm",
        // the product is built IN decimal — 10⁶·N·support overflows a
        // long before intDiv's own cast could see it
        Sampling.intDiv(
          lit(1000000L).cast("decimal(38,0)") * col("nb") * col("support"),
          col("_ca").cast("decimal(38,0)") * col("_cb")))
      .select(col("item_a"), col("item_b"), col("support"), col("lift_ppm"))
      .orderBy(col("support").desc, col("item_a").asc, col("item_b").asc)
      .limit(topK)
    Frames.sealRelease(out, b)
  }

  /** Level-3 A-Priori slice: top-k co-occurring item TRIPLES with a
    * cohesion score — `support(a,b,c)` against the weakest of the three
    * pair supports in floor-ppm (a triple that explains most of its
    * weakest pair is a real bundle, not three pairwise accidents).
    *
    * Candidate generation is PRUNED A-Priori, not enumerate-then-filter:
    * support is anti-monotone (support(a,b,c) ≤ support of each of its
    * pairs), so only triples whose three pairs are ALL level-2 frequent
    * can survive the minSupport filter. The frequent-pair set is
    * materialized once (small by the standard A-Priori assumption that
    * level-2 frequent itemsets fit in memory) and broadcast into three
    * semi-join screens: (a,b) BEFORE the third explode — so a hot basket
    * near the cap emits m·|freq-pairs-within| candidates instead of m³/6 —
    * then (b,c) and (a,c) before the count shuffle. The groupBy therefore
    * shuffles only candidates that can possibly be frequent.
    *
    * Pair supports come from the SAME capped frame so the cohesion
    * denominator is consistent; cohesion joins reuse the broadcast
    * frequent-pair frame (every pair of a surviving triple is frequent).
    * Output: (item_a < item_b < item_c, support, min_pair_support,
    * cohesion_ppm). */
  def tripleStats(items: DataFrame, basketId: String, itemId: String,
                  minSupport: Long, topK: Int,
                  maxBasket: Int = 1000): DataFrame = {
    require(minSupport >= 1 && topK >= 1, "bad minSupport/topK")
    val capped = items.select(col(basketId).as("bid"), col(itemId).as("item"))
      .distinct()
      .groupBy(col("bid"))
      .agg(sort_array(collect_list(col("item"))).as("_ms"))
      .filter(size(col("_ms")) <= maxBasket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // level-2 frequent pairs, materialized (capped is read once for this
    // pass, once for the pruned triple pass)
    val freq = capped
      .select(posexplode(col("_ms")).as(Seq("_i", "item_a")), col("_ms"))
      .select(col("item_a"),
        explode(slice(col("_ms"), col("_i") + lit(2), size(col("_ms"))))
          .as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("ps"))
      .filter(col("ps") >= minSupport)
      .transform(Frames.truncate)
    val ab = capped
      .select(posexplode(col("_ms")).as(Seq("_i", "item_a")), col("_ms"))
      .select(col("item_a"), col("_ms"), col("_i"),
        posexplode(slice(col("_ms"), col("_i") + lit(2), size(col("_ms"))))
          .as(Seq("_j", "item_b")))
      .join(broadcast(freq.select(col("item_a"), col("item_b"))),
        Seq("item_a", "item_b"), "left_semi")
    val triples = ab
      .select(col("item_a"), col("item_b"),
        // item_b sits at 1-based position _i + _j + 2, so candidates for
        // item_c start one past it
        explode(slice(col("_ms"), col("_i") + col("_j") + lit(3),
          size(col("_ms")))).as("item_c"))
      .join(broadcast(freq.select(col("item_a").as("item_b"),
        col("item_b").as("item_c"))), Seq("item_b", "item_c"), "left_semi")
      .join(broadcast(freq.select(col("item_a"),
        col("item_b").as("item_c"))), Seq("item_a", "item_c"), "left_semi")
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val out = triples
      .join(broadcast(freq.select(col("item_a"), col("item_b"),
        col("ps").as("_pab"))), Seq("item_a", "item_b"))
      .join(broadcast(freq.select(col("item_a"), col("item_b").as("item_c"),
        col("ps").as("_pac"))), Seq("item_a", "item_c"))
      .join(broadcast(freq.select(col("item_a").as("item_b"),
        col("item_b").as("item_c"), col("ps").as("_pbc"))),
        Seq("item_b", "item_c"))
      .withColumn("min_pair_support",
        least(col("_pab"), col("_pac"), col("_pbc")))
      .withColumn("cohesion_ppm",
        Sampling.intDiv(col("support").cast("decimal(38,0)") * lit(1000000L),
          col("min_pair_support")))
      .select(col("item_a"), col("item_b"), col("item_c"), col("support"),
        col("min_pair_support"), col("cohesion_ppm"))
      .orderBy(col("support").desc, col("item_a"), col("item_b"),
        col("item_c"))
      .limit(topK)
    Frames.sealRelease(out, capped)
  }
}
