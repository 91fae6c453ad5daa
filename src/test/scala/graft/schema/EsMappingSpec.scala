package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class EsMappingSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("n", LongType),
    StructField("score", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("samples", ArrayType(StructType(Seq(
      StructField("tissue", StringType), StructField("vol", LongType)))))))

  test("scalar, array and nested mappings follow reference typing rules") {
    val json = EsMapping.forSchema(schema, "subject")
    assert(json.contains(""""name":{"type":"keyword","fields":{"analyzed":{"type":"text"}}}"""))
    assert(json.contains(""""n":{"type":"long"}"""))
    assert(json.contains(""""score":{"type":"float"}"""))
    // array of primitive maps to the element type (ES arrays are implicit)
    assert(json.contains(""""tags":{"type":"keyword","fields":{"analyzed":{"type":"text"}}}"""))
    assert(json.contains(""""samples":{"type":"nested","properties":{"tissue":"""))
  }

  test("array-config lists every array-typed field") {
    val cfg = EsMapping.arrayConfig(schema, "subject")
    assert(cfg.contains(""""array":["tags","samples"]"""))
    assert(cfg.contains(""""doc_type":"subject""""))
  }
}
