package graft.schema

import org.apache.spark.sql.types._

/** Pure function StructType → Elasticsearch/OpenSearch mapping JSON —
  * replacing the reference's mapping generator (tube/etl/indexers/base/
  * parser.py:13,64-81 and aggregation/nested/parser.py:103-129).
  *
  * Rules (reference parity):
  *   - string → `keyword` with an `analyzed` text subfield,
  *   - long/int → `long`, float/double → `float`, boolean → `keyword`,
  *   - array<primitive> → the element's mapping (ES arrays are implicit),
  *   - array<struct> → `type: nested` with recursive properties.
  */
object EsMapping {

  def forSchema(schema: StructType, docType: String): String =
    s"""{"mappings":{"$docType":${objectProps(schema)}}}"""

  private def objectProps(st: StructType): String = {
    val fields = st.fields.map(f => s""""${f.name}":${fieldMapping(f.dataType)}""")
    s"""{"properties":{${fields.mkString(",")}}}"""
  }

  private def fieldMapping(dt: DataType): String = dt match {
    case StringType | BooleanType =>
      """{"type":"keyword","fields":{"analyzed":{"type":"text"}}}"""
    case LongType | IntegerType | ShortType => """{"type":"long"}"""
    case FloatType | DoubleType             => """{"type":"float"}"""
    case TimestampType | DateType           => """{"type":"date"}"""
    case ArrayType(st: StructType, _) =>
      s"""{"type":"nested",${objectProps(st).drop(1)}"""
    case ArrayType(et, _) => fieldMapping(et)
    case st: StructType   => objectProps(st)
    case _ => """{"type":"keyword","fields":{"analyzed":{"type":"text"}}}"""
  }

  /** The `-array-config` side document listing array-typed fields
    * (reference: tube/etl/outputs/es/writer.py:79-118). */
  def arrayConfig(schema: StructType, docType: String): String = {
    val arrayFields = schema.fields.collect {
      case StructField(n, ArrayType(_: StructType, _), _, _) => n
      case StructField(n, ArrayType(_, _), _, _)             => n
    }
    s"""{"timestamp":null,"array":[${arrayFields.map(f => s""""$f"""").mkString(",")}],"doc_type":"$docType"}"""
  }
}
