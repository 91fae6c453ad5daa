package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import graft.pipeline.GraphSource
import graft.schema.GraphSchema

/** Builds a Translator `GraphSource` directly from a directory of tube-style
  * table dumps — the reference's on-disk input layout
  * (`{base}/node_<label>/part-*`, `{base}/<edgeTable>/part-*`; reference:
  * tube/etl/indexers/base/translator.py:71-92) — so a reference deployment's
  * existing Sqoop output can feed this engine unchanged.
  *
  * Prop schemas come from the GraphSchema (label → props:DataType), which
  * carries the data-dictionary-derived typing rules (§1.2). Missing/empty
  * table dirs yield typed empty frames (S6 semantics), so partial dumps
  * still translate.
  */
object TubeGraphSource {

  def apply(spark: SparkSession, schema: GraphSchema, baseDir: String)
      : GraphSource = {
    val nodeDf = (label: String) => {
      val node = schema.node(label)
      val props = StructType(node.props.toSeq.sortBy(_._1).map {
        case (n, dt) => org.apache.spark.sql.types.StructField(n, dt)
      })
      TubeText.nodes(spark, s"$baseDir/node_${node.tableName}", label, props)
    }
    val edgeDf = (child: String, parent: String) => {
      val link = schema.linksOf(child, parent)
      TubeText.edges(spark, s"$baseDir/${link.edgeTable}",
        schema.idCol(child), schema.idCol(parent))
    }
    new GraphSource(nodeDf, edgeDf)
  }
}
