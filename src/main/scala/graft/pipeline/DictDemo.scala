package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema._

/** The full config-driven entry path on the synthetic corpus: a Gen3-style
  * JSON-Schema dictionary (typed props, named links with backrefs) plus an
  * etlMapping YAML whose paths use link names / backrefs — exactly what a
  * reference deployment ships — loaded through DictionaryLoader and
  * translated over the parquet tables. Exists so the driver's differential
  * oracle covers the dictionary → schema → mapping-resolution → translate
  * chain end-to-end (the ibdgc fixture spec covers the text-dump variant). */
object DictDemo {

  val dictJson: String = """{
    "region.yaml": {
      "id": "region", "category": "administrative",
      "properties": {"r_name": {"type": "string"}}
    },
    "nation.yaml": {
      "id": "nation", "category": "administrative",
      "links": [{"name": "region", "backref": "nations", "label": "part_of",
                 "target_type": "region", "multiplicity": "many_to_one"}],
      "properties": {"n_name": {"type": ["string", "null"]},
                     "region": {"type": "object"}}
    },
    "customer.yaml": {
      "id": "customer", "category": "account",
      "links": [{"name": "nation", "backref": "customers",
                 "label": "located_in", "target_type": "nation",
                 "multiplicity": "many_to_one"}],
      "properties": {"c_name": {"type": "string"},
                     "c_acctbal": {"type": "number"},
                     "c_mktsegment": {"enum": ["AUTOMOBILE", "BUILDING"]},
                     "nation": {"type": "object"}}
    },
    "orders.yaml": {
      "id": "orders", "category": "txn",
      "links": [{"name": "customer", "backref": "orders",
                 "label": "placed_by", "target_type": "customer",
                 "multiplicity": "many_to_one"}],
      "properties": {"o_totalprice": {"type": "number"},
                     "customer": {"type": "object"}}
    }
  }"""

  /** Paths use link names (up) and backrefs (down), like a real mapping. */
  val mappingYaml: String =
    """mappings:
      |  - name: dict_customer
      |    doc_type: customer
      |    type: aggregator
      |    root: customer
      |    props:
      |      - name: c_name
      |      - name: c_acctbal
      |    parent_props:
      |      - path: nation[n_name].region[r_name]
      |        relation: "1-1"
      |    aggregated_props:
      |      - name: orders_count
      |        path: orders
      |        fn: count
      |      - name: max_price
      |        path: orders
      |        src: o_totalprice
      |        fn: max
      |""".stripMargin

  lazy val schema: GraphSchema = DictionaryLoader.fromJsonString(dictJson)
  lazy val mapping: EtlMapping =
    DictionaryLoader.resolveMapping(schema, MappingYaml.parse(mappingYaml))

  def docs(spark: SparkSession, dir: String): DataFrame =
    new Translator(schema, TpchGraph.source(spark, dir))
      .translate(mapping.indices.head)
}
