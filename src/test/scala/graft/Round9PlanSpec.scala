package graft

/** Plan audits for the round-9 operators — the physical-shape claims each
  * one's design rests on, pinned against the sf0.001 driver testdata. */
class Round9PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("vocab_hll's sketch is ONE aggregate pair over graft_hll_regs — " +
      "no distinct, no (group, register) shuffle") {
    import org.apache.spark.sql.functions._
    val terms = SparkEntry.queries("vocab_hll") // ensure query resolves
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("term"))
    val regs = docs.rollup(col("source"))
      .agg(graft.functions.Hll.sketchAgg("term").as("r"))
    regs.collect()
    // AQE's toString repeats the tree under '== Initial Plan ==' — count
    // operators in the final section only
    val plan = regs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("graft_hll_regs"), plan.take(2000))
    assert(plan.contains("Expand"), plan.take(2000)) // rollup's grouping sets
    // the old frame path's tells: a per-(group, term) distinct aggregate
    // and a (group, reg) max — neither may appear
    assert(!plan.toLowerCase.contains("distinct"), plan.take(2000))
    // exactly one partial/final aggregate pair for the sketch (the
    // typed buffer plans as ObjectHashAggregate)
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2,
      plan.take(2000))
    assert("partial_graft_hll_regs".r.findAllIn(plan).size == 1,
      plan.take(2000))
  }

  test("schema_fk_discovery is one unioned plan: hash joins only, " +
      "profile sides broadcast") {
    val df = SparkEntry.queries("schema_fk_discovery")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("Union"), plan.take(2000))
  }

  test("corpus_pack_windows: the cumsum window partitions BY SOURCE " +
      "(never a global single-partition window)") {
    val df = SparkEntry.queries("corpus_pack_windows")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(2000))
    // a partition-less window plans as 'Window [...] ORDER BY' with a
    // SinglePartition exchange — the source-keyed hashpartitioning must
    // be what feeds it
    assert(plan.contains("hashpartitioning(source"), plan.take(2000))
  }

  test("dedup_substring_exact: no pairwise join shape anywhere — " +
      "semi-join against the duplicated-window set only") {
    val df = SparkEntry.queries("dedup_substring_exact")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
