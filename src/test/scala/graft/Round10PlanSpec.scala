package graft

/** Plan audits for the round-10 operators — the physical-shape claims each
  * one's design rests on, pinned against the sf0.001 driver testdata. */
class Round10PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("embedding_knn_shapley: probes BROADCAST onto one corpus scan " +
      "(the brute-force shape) — the corpus is never shuffled for the " +
      "join, and no shuffle join appears") {
    val df = SparkEntry.queries("embedding_knn_shapley")(spark, dir)
    val plan = finalPlan(df)
    // probes × corpus is a broadcast nested loop BY DESIGN (no equi-key);
    // what must NOT appear is a shuffle join of the corpus
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the value suffix-sum runs per probe: the rank window partitions by qid
    assert(plan.contains("hashpartitioning(qid"), plan.take(2000))
  }

  test("corpus_nfc_normalize: graft_normalize rides the scan-side " +
      "project inside whole-stage codegen — no UDF, no extra exchange") {
    val df = SparkEntry.queries("corpus_nfc_normalize")(spark, dir)
    val plan = finalPlan(df)
    assert(plan.contains("graft_normalize"), plan.take(2000))
    assert(!plan.contains("BatchEvalPython"), plan.take(2000))
    assert(!plan.toLowerCase.contains("scalaudf"), plan.take(2000))
    // one-row global aggregate: exactly one exchange (the final agg's)
    assert("Exchange".r.findAllIn(plan).size <= 2, plan.take(2000))
  }

  test("dedup_groups_delta: two snapshot states + rebuild resolve as " +
      "hash aggregates and an md5-keyed join — no cartesian anywhere") {
    val df = SparkEntry.queries("dedup_groups_delta")(spark, dir)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("content_md5"), plan.take(2000))
  }

  test("corpus_shard_manifest: one hash aggregate over the md5 shard " +
      "key, totals as a broadcast 1-row frame — no global sort, no window") {
    val df = SparkEntry.queries("corpus_shard_manifest")(spark, dir)
    val plan = finalPlan(df)
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000)) // 1-row total
  }

  test("vocab_hll_delta: three sketch aggregates (old/new/full), all " +
      "ObjectHashAggregate pairs over graft_hll_regs — no distinct") {
    val df = SparkEntry.queries("vocab_hll_delta")(spark, dir)
    val plan = finalPlan(df)
    assert("partial_graft_hll_regs".r.findAllIn(plan).size == 3,
      plan.take(3000))
    assert(!plan.toLowerCase.contains("distinct"), plan.take(3000))
  }

  test("PSI drift queries: one bucket-keyed hash aggregate + a broadcast " +
      "1-row total — no window, no sort-merge join, output ≤ B rows") {
    for (q <- Seq("corpus_psi_drift", "embedding_psi_drift")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val plan = finalPlan(df)
      assert(!plan.contains("Window"), s"$q: ${plan.take(1500)}")
      assert(!plan.contains("SortMergeJoin"), s"$q: ${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(1500)}")
    }
  }

  test("corpus_datacard: every signal is a hash aggregate; the final " +
      "assembly joins 20-source frames — no corpus-sized join") {
    val df = SparkEntry.queries("corpus_datacard")(spark, dir)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("graphBeamSearch's entry seeding is a bounded window over the " +
      "corpus, and the beam never scans the corpus after seeding") {
    // structural stand-in at spec scale: the ann_graph_search plan must
    // contain no corpus-sized sort-merge join in its final step — the
    // scoring joins are id-keyed hash joins against the persisted index
    val df = SparkEntry.queries("ann_graph_search")(spark, dir)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
