package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Merkle release integrity: proof verification round-trips against the
  * root, absent-sibling (sparse shard) handling, and the tamper contract —
  * flip one doc and every proof in its group fails against the PUBLISHED
  * root while untouched groups keep verifying. */
class MerkleSpec extends SparkSpec {
  import spark.implicits._

  // two sources, few docs: md5-mod-16 sharding leaves most shards empty,
  // so the null-sibling pass-through is exercised on every path
  private val docs = Seq(
    (1L, "alpha beta", "src_a"), (2L, "gamma", "src_a"),
    (3L, "delta epsilon", "src_a"), (4L, "zeta", "src_a"),
    (5L, "eta theta", "src_b"), (6L, "iota", "src_b"),
    (7L, "kappa lambda mu", "src_b")
  ).toDF("doc_id", "text", "source")

  test("every proof verifies against the root built from the same corpus") {
    val pf = Merkle.proofs(
      Merkle.shardLeaves(docs, "doc_id", "text", "source"), "source")
      .collect()
    assert(pf.nonEmpty)
    assert(pf.forall(_.getAs[Long]("ok") == 1L))
    // sparse corpus: at least one absent sibling ('' encoding) was folded
    assert(pf.exists(r => (0 to 3).exists(k => r.getAs[String](s"sib$k").isEmpty)))
  }

  test("proofs fold to the SAME root the roots() builder publishes") {
    val leaves = Merkle.shardLeaves(docs, "doc_id", "text", "source")
    val fromProofs = Merkle.proofs(leaves, "source")
      .select("source", "root").distinct().as[(String, String)]
      .collect().toMap
    val published = Merkle.roots(docs, "doc_id", "text", "source")
      .select("source", "merkle_root").as[(String, String)]
      .collect().toMap
    assert(fromProofs === published)
  }

  test("tamper: one flipped doc fails verification against the published root") {
    val original = Merkle.roots(docs, "doc_id", "text", "source")
      .select(col("source"), col("merkle_root").as("root"))
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 3L, lit("delta epsilon TAMPERED"))
        .otherwise(col("text")))
    val pf = Merkle.proofs(
        Merkle.shardLeaves(tampered, "doc_id", "text", "source"), "source",
        rootsOverride = Some(original))
      .select("source", "shard", "ok").as[(String, Long, Long)].collect()
    // the tampered subtree poisons every path in src_a (each shard's
    // sibling chain covers doc 3's shard exactly once) ...
    assert(pf.filter(_._1 == "src_a").forall(_._3 == 0L))
    // ... while src_b is untouched and still verifies completely
    assert(pf.filter(_._1 == "src_b").nonEmpty)
    assert(pf.filter(_._1 == "src_b").forall(_._3 == 1L))
  }

  test("tamper that ADDS a group: its proofs surface as ok=0, never vanish") {
    // a corpus gaining a source the published roots never saw must FAIL
    // its audit — an inner join to the roots frame would silently drop
    // the new group and let forall(ok==1) pass
    val original = Merkle.roots(docs, "doc_id", "text", "source")
      .select(col("source"), col("merkle_root").as("root"))
    val grown = docs.unionByName(
      Seq((99L, "smuggled content", "src_new")).toDF("doc_id", "text", "source"))
    val pf = Merkle.proofs(
        Merkle.shardLeaves(grown, "doc_id", "text", "source"), "source",
        rootsOverride = Some(original))
      .select("source", "root", "ok").as[(String, String, Long)].collect()
    val newRows = pf.filter(_._1 == "src_new")
    assert(newRows.nonEmpty)
    assert(newRows.forall(r => r._2 == "" && r._3 == 0L))
    // the known groups still verify
    assert(pf.filter(_._1 != "src_new").forall(_._3 == 1L))
  }

  test("tamper that DELETES a group: the orphaned published root fails") {
    // the converse of the ADD tamper: a group wholly removed from the
    // corpus produces no proof rows of its own, so only the FULL OUTER
    // join to the published roots can surface the deletion as ok=0 —
    // a left join would silently vanish the group and pass the audit
    val original = Merkle.roots(docs, "doc_id", "text", "source")
      .select(col("source"), col("merkle_root").as("root"))
    val shrunk = docs.filter(col("source") =!= "src_b")
    val pf = Merkle.proofs(
        Merkle.shardLeaves(shrunk, "doc_id", "text", "source"), "source",
        rootsOverride = Some(original))
      .select("source", "shard", "n_docs", "leaf_h", "root", "ok")
      .as[(String, Long, Long, String, String, Long)].collect()
    val gone = pf.filter(_._1 == "src_b")
    assert(gone.length == 1)
    // the orphan row: shard −1 / 0 docs / '' leaf, the published root, ok=0
    assert(gone.forall(r => r._2 == -1L && r._3 == 0L && r._4 == "" &&
      r._5.nonEmpty && r._6 == 0L))
    // the surviving group still verifies in full
    assert(pf.filter(_._1 == "src_a").nonEmpty)
    assert(pf.filter(_._1 == "src_a").forall(_._6 == 1L))
  }

  test("n_docs bookkeeping survives the pairing rounds") {
    val got = Merkle.roots(docs, "doc_id", "text", "source")
      .select("source", "n_docs").as[(String, Long)].collect().toMap
    assert(got === Map("src_a" -> 4L, "src_b" -> 3L))
  }
}
