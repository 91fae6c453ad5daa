package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema._
import graft.sources.Tables

/** The TPC-H-ish test corpus viewed as a tube-style property graph — the
  * demonstration harness for the Translator pipeline (and the source for
  * SparkEntry's graph queries).
  *
  * Graph shape (child → parent, mirroring the reference's src=child edges —
  * reference: tube/etl/indexers/base/lambdas.py:64-71):
  *
  *   lineitem → orders → customer → nation → region
  *                       supplier → nation
  *
  * Node tables are the parquet tables with a `_{label}_id` doc-key column
  * added; edge tables are projections of the child table's FK columns (the
  * relational equivalent of the reference's edge_* tables). `customer` and
  * `supplier` share the `account` category and normalized `name`/`acctbal`
  * prop aliases so the collector path (injection indices) has two leaf
  * labels to union, like the reference's data_file leaves.
  */
object TpchGraph {

  val schema: GraphSchema = GraphSchema(
    nodes = Seq(
      NodeDef("region", "region", Map("r_name" -> StringType), "admin"),
      NodeDef("nation", "nation", Map("n_name" -> StringType), "admin"),
      NodeDef("customer", "customer",
        Map("c_name" -> StringType, "c_acctbal" -> DoubleType,
          "c_mktsegment" -> StringType), "account"),
      NodeDef("supplier", "supplier",
        Map("s_name" -> StringType, "s_acctbal" -> DoubleType), "account"),
      NodeDef("orders", "orders",
        Map("o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
          "o_orderpriority" -> StringType), "txn"),
      NodeDef("lineitem", "lineitem",
        Map("l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType),
        "txn")),
    // all child→parent links here are genuinely many_to_one (each child row
    // references exactly one parent); stated explicitly so the flatten
    // multiplicity check and the single-parent collector/count fast paths
    // rest on asserted schema, not defaults
    links = Seq(
      LinkDef("nation", "region", "edge_nation_region", "many_to_one", "nations"),
      LinkDef("customer", "nation", "edge_customer_nation", "many_to_one", "customers"),
      LinkDef("supplier", "nation", "edge_supplier_nation", "many_to_one", "suppliers"),
      LinkDef("orders", "customer", "edge_orders_customer", "many_to_one", "orders"),
      LinkDef("lineitem", "orders", "edge_lineitem_orders", "many_to_one", "lineitems")))

  /** lineitem has a composite key (orderkey, linenumber); linenumber < 10 in
    * this corpus, so `orderkey * 10 + linenumber` is a collision-free long
    * doc key (cheaper at scale than string concat — stays numeric). */
  private def lineitemId = col("l_orderkey") * 10 + col("l_linenumber")

  def source(spark: SparkSession, dir: String): GraphSource = {
    def tbl(n: String) = Tables(spark, dir, n)
    // node tables carry their parent FK as `_{parent}_id` (declared via
    // fkParents below): the Translator then walks hops straight off the
    // child table — no edge self-joins anywhere in the relational path
    val nodeDf: String => DataFrame = {
      case "region" => tbl("region").withColumn("_region_id", col("r_regionkey"))
      case "nation" => tbl("nation").withColumn("_nation_id", col("n_nationkey"))
        .withColumn("_region_id", col("n_regionkey"))
      case "customer" =>
        tbl("customer").withColumn("_customer_id", col("c_custkey"))
          .withColumn("_nation_id", col("c_nationkey"))
          .withColumn("name", col("c_name"))
          .withColumn("acctbal", col("c_acctbal"))
      case "supplier" =>
        tbl("supplier").withColumn("_supplier_id", col("s_suppkey"))
          .withColumn("_nation_id", col("s_nationkey"))
          .withColumn("name", col("s_name"))
          .withColumn("acctbal", col("s_acctbal"))
      case "orders" =>
        tbl("orders").withColumn("_orders_id", col("o_orderkey"))
          .withColumn("_customer_id", col("o_custkey"))
          // exact money type for deterministic, fp-order-independent sums
          .withColumn("o_totalprice_dec",
            col("o_totalprice").cast(DecimalType(18, 2)))
      case "lineitem" =>
        tbl("lineitem").withColumn("_lineitem_id", lineitemId)
          .withColumn("_orders_id", col("l_orderkey"))
      case other => throw new NoSuchElementException(s"node $other")
    }
    val fks: String => Set[String] = Map(
      "nation" -> Set("region"), "customer" -> Set("nation"),
      "supplier" -> Set("nation"), "orders" -> Set("customer"),
      "lineitem" -> Set("orders")
    ).withDefaultValue(Set.empty)
    val edgeDf: (String, String) => DataFrame = {
      case ("nation", "region") =>
        tbl("nation").select(col("n_nationkey").as("_nation_id"),
          col("n_regionkey").as("_region_id"))
      case ("customer", "nation") =>
        tbl("customer").select(col("c_custkey").as("_customer_id"),
          col("c_nationkey").as("_nation_id"))
      case ("supplier", "nation") =>
        tbl("supplier").select(col("s_suppkey").as("_supplier_id"),
          col("s_nationkey").as("_nation_id"))
      case ("orders", "customer") =>
        tbl("orders").select(col("o_orderkey").as("_orders_id"),
          col("o_custkey").as("_customer_id"))
      case ("lineitem", "orders") =>
        tbl("lineitem").select(lineitemId.as("_lineitem_id"),
          col("l_orderkey").as("_orders_id"))
      case (c, p) => throw new NoSuchElementException(s"edge $c->$p")
    }
    new GraphSource(nodeDf, edgeDf, fks)
  }

  /** Flagship aggregator index: exercises P1/P2 (props + recode), J3
    * (2-hop parent chain), A4 (sorted_by flatten), A2 (aggregation paths at
    * depth 1 and 2 with count/sum), zero-fill semantics. */
  val customerMapping: IndexMapping = IndexMapping(
    name = "customer_doc", docType = "customer", root = "customer",
    props = Seq(
      PropDef("c_name", "c_name"),
      PropDef("c_acctbal", "c_acctbal"),
      PropDef("segment", "c_mktsegment",
        valueMappings = Map("BUILDING" -> "B", "AUTOMOBILE" -> "A"))),
    parentProps = Seq(ParentChainDef(Seq(
      PathStep("nation", Seq(PropDef("nation_name", "n_name"))),
      PathStep("region", Seq(PropDef("region_name", "r_name")))),
      relation = "1-1")),
    flattenProps = Seq(FlattenDef("orders",
      Seq(PropDef("latest_status", "o_orderstatus")),
      sortedBy = Some(("o_orderkey", true)))),
    aggregatedProps = Seq(
      AggregatedPropDef("orders_count", Seq("orders"), None, "count"),
      AggregatedPropDef("total_spent", Seq("orders"), Some("o_totalprice_dec"), "sum"),
      AggregatedPropDef("lineitem_count", Seq("orders", "lineitem"), None, "count")))

  /** Collector index: unions the `account`-category leaves (customer,
    * supplier) with a `source_node` tag and injects the ancestor nation's
    * name as a set — exercises J5/P8/A6. */
  val accountMapping: IndexMapping = IndexMapping(
    name = "account_doc", docType = "account", root = "account",
    kind = "collector",
    props = Seq(PropDef("name", "name"), PropDef("acctbal", "acctbal")),
    injection = Some(InjectionDef("account",
      Map("nation" -> Seq(PropDef("nation_set", "n_name"))))))

  def customerDocs(spark: SparkSession, dir: String): DataFrame =
    new Translator(schema, source(spark, dir)).translate(customerMapping)

  def accountDocs(spark: SparkSession, dir: String): DataFrame =
    new Translator(schema, source(spark, dir)).translate(accountMapping)
}
