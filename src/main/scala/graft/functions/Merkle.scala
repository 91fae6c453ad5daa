package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merkle-tree release integrity over md5-mod shards (the verification
  * twin of the shard manifest): leaf = doc digest, shard digest = md5 of
  * the sorted leaf digests, parents pair up on shard index. The root
  * commits to the whole release; an INCLUSION PROOF (one shard digest +
  * its log₂(shards) sibling hashes) re-proves any single shard against
  * the published root without rescanning the corpus — the property that
  * makes per-shard re-verification O(log n) after an incremental append.
  *
  * Everything here is hash aggregates over frames that shrink from
  * `shards`·|groups| rows to |groups| rows — no joins in the build, and
  * the proof extraction joins only level frames (≤ shards·|groups| rows
  * each), never the corpus. Missing shards (possible on tiny corpora)
  * simply don't appear at their level; a single-child parent hashes that
  * child alone, and proof verification mirrors it with a null-sibling
  * pass-through. */
object Merkle {

  /** Corpus → leaf frame (group, shard, h): doc digest md5(id ":" text),
    * shard = md5(id) mod `shards` — stable across runs and engines. */
  def shardLeaves(docs: DataFrame, idCol: String, textCol: String,
                  groupCol: String, shards: Int = 16): DataFrame =
    docs.select(
      col(groupCol),
      pmod(Dedup.Md5Hasher(col(idCol).cast("string")), lit(shards.toLong))
        .as("shard"),
      md5(concat(col(idCol).cast("string"), lit(":"),
        coalesce(col(textCol), lit("")))).as("h"))

  /** Leaf frame → level-0 shard digests (group, shard, n, h): md5 of the
    * shard's leaf digests in sorted order (order-free across partitions). */
  def shardDigests(leaves: DataFrame, groupCol: String): DataFrame =
    leaves.groupBy(groupCol, "shard")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws("", array_sort(collect_list("h")))).as("h"))

  /** One pairing round: children (2k, 2k+1) hash into parent k, child
    * order by shard index (a lone child hashes alone). */
  private def pairUp(lvl: DataFrame, groupCol: String): DataFrame =
    lvl.withColumn("parent", expr("shard div 2"))
      .groupBy(groupCol, "parent")
      .agg(sum("n").as("n"),
        md5(concat_ws("", expr(
          "transform(array_sort(collect_list(struct(shard, h))), x -> x.h)")))
          .as("h"))
      .withColumnRenamed("parent", "shard")

  /** All tree levels bottom-up: `rounds` + 1 frames, l0 (shard digests)
    * through the root level (shard 0 per group). */
  def levels(l0: DataFrame, groupCol: String, rounds: Int = 4): Seq[DataFrame] =
    (1 to rounds).scanLeft(l0)((lvl, _) => pairUp(lvl, groupCol))

  /** Per-group Merkle roots: (group, n_docs, merkle_root). */
  def roots(docs: DataFrame, idCol: String, textCol: String,
            groupCol: String, shards: Int = 16, rounds: Int = 4): DataFrame =
    levels(shardDigests(shardLeaves(docs, idCol, textCol, groupCol, shards),
        groupCol), groupCol, rounds)
      .last
      .select(col(groupCol), col("n").cast("long").as("n_docs"),
        col("h").as("merkle_root"))

  /** Inclusion proofs + their verification, one row per (group, shard):
    * the shard digest `leaf_h`, the sibling hash at every level
    * (`sib0..sib{rounds-1}`, null where the sibling subtree is empty),
    * the published `root`, and `ok` = 1 iff folding leaf_h up through
    * the siblings reproduces the root. `rootsOverride` verifies against
    * previously published roots (group, root) instead of roots recomputed
    * from `leaves` — the tamper-detection mode: a flipped doc makes every
    * proof in its group fail against the ORIGINAL root.
    *
    * The base level is lineage-truncated so the corpus is scanned once;
    * the `rounds` sibling joins touch only shard-count-sized frames. */
  def proofs(leaves: DataFrame, groupCol: String, rounds: Int = 4,
             rootsOverride: Option[DataFrame] = None): DataFrame = {
    val l0 = Frames.truncate(shardDigests(leaves, groupCol))
    val lv = levels(l0, groupCol, rounds)
    var pf = l0.select(col(groupCol), col("shard"),
      col("n").cast("long").as("n_docs"), col("h").as("leaf_h"),
      col("h").as("_rh"), col("shard").as("_idx"))
    for (k <- 0 until rounds) {
      val sib = lv(k).select(col(groupCol), col("shard").as("_sb"),
        col("h").as("_sibH"))
      pf = pf.withColumn("_sb", col("_idx").bitwiseXOR(lit(1L)))
        .join(sib, Seq(groupCol, "_sb"), "left")
        .withColumn("_rh", md5(
          when(col("_sibH").isNull, col("_rh"))
            .when(col("_idx") % 2 === 0, concat(col("_rh"), col("_sibH")))
            .otherwise(concat(col("_sibH"), col("_rh")))))
        .withColumn(s"sib$k", col("_sibH"))
        .drop("_sb", "_sibH")
        .withColumn("_idx", expr("_idx div 2"))
    }
    val root = rootsOverride.getOrElse(
        lv.last.select(col(groupCol), col("h").as("root")))
      .select(col(groupCol), col("root"))
    // In OVERRIDE mode, FULL OUTER: a group the published roots never
    // saw (a tamper that ADDS or renames a group) must surface as ok=0
    // rows, and a published root whose group was wholly DELETED from the
    // corpus must ALSO surface as an ok=0 row instead of silently
    // producing no pf rows at all — either one-sided join would let its
    // direction of tamper pass a forall(ok==1) audit. The missing side's
    // fields surface as '' / 0 / shard −1 under the same never-empty-md5
    // encoding as absent siblings. WITHOUT override the root frame is
    // derived from the SAME leaves, so root-only rows cannot exist and a
    // left join keeps the |groups|-sized root side broadcastable (a
    // full-outer there would force a shuffle join for provably nothing).
    pf.join(root, Seq(groupCol),
        if (rootsOverride.isDefined) "full_outer" else "left")
      .withColumn("shard", coalesce(col("shard"), lit(-1L)))
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
      .withColumn("leaf_h", coalesce(col("leaf_h"), lit("")))
      .select(Seq(col(groupCol), col("shard"), col("n_docs"), col("leaf_h")) ++
        // absent sibling (empty subtree) surfaces as '' — md5 hex is never
        // empty, so the encoding is unambiguous and keeps the output frame
        // free of NULL sort keys
        (0 until rounds).map(k => coalesce(col(s"sib$k"), lit("")).as(s"sib$k")) ++
        Seq(coalesce(col("root"), lit("")).as("root"),
          coalesce((col("_rh") === col("root")).cast("long"), lit(0L))
            .as("ok")): _*)
  }
}
