package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.pipeline.Translator
import graft.schema._

/** End-to-end over the reference's on-disk format: tube text dumps →
  * TubeGraphSource → Translator → documents. This is the "switch engines
  * without changing your data" path. */
class TubeGraphSourceSpec extends SparkSpec {

  private def write(base: Path, table: String, rows: Seq[String]): Unit = {
    val dir = base.resolve(table)
    Files.createDirectories(dir)
    Files.write(dir.resolve("part-m-00000"), rows.mkString("\n").getBytes)
  }

  private val schema = GraphSchema(
    nodes = Seq(
      NodeDef("project", "project", Map("code" -> StringType), "admin"),
      NodeDef("subject", "subject",
        Map("sex" -> StringType, "age" -> LongType), "clinical")),
    links = Seq(LinkDef("subject", "project", "edge_subjectprojects")))

  test("tube text dump translates to documents (props, parents, agg)") {
    val base = Files.createTempDirectory("tubegraph")
    write(base, "node_project", Seq(
      """2020-01-01,{},{},"{""code"": ""P-A""}",proj1"""))
    write(base, "node_subject", Seq(
      """2020-01-01,{},{},"{""sex"": ""female"", ""age"": 34}",s1""",
      """2020-01-02,{},{},"{""sex"": ""male"", ""age"": 40}",s2"""))
    write(base, "edge_subjectprojects", Seq(
      """2020-01-01,{},{},{},s1,proj1""",
      """2020-01-01,{},{},{},s2,proj1"""))

    val source = TubeGraphSource(spark, schema, base.toString)
    val mapping = IndexMapping(
      name = "project", docType = "project", root = "project",
      props = Seq(PropDef("code", "code")),
      aggregatedProps = Seq(
        AggregatedPropDef("subject_count", Seq("subject"), None, "count"),
        AggregatedPropDef("total_age", Seq("subject"), Some("age"), "sum")),
      nestedProps = Seq(NestedDef("subjects", Seq("subject"),
        Seq(PropDef("sex", "sex")))))
    val docs = new Translator(schema, source).translate(mapping).collect()

    assert(docs.length === 1)
    val d = docs(0)
    assert(d.getString(d.fieldIndex("code")) === "P-A")
    assert(d.getLong(d.fieldIndex("subject_count")) === 2L)
    assert(d.getLong(d.fieldIndex("total_age")) === 74L)
    val nested = d.getSeq[org.apache.spark.sql.Row](d.fieldIndex("subjects"))
    assert(nested.map(_.getString(0)).sorted === Seq("female", "male"))
  }

  test("missing edge dump yields empty (typed) relations, zero-filled docs") {
    val base = Files.createTempDirectory("tubegraph2")
    write(base, "node_project", Seq(
      """2020-01-01,{},{},"{""code"": ""P-B""}",proj9"""))
    // no node_subject dir, no edge dir at all
    val source = TubeGraphSource(spark, schema, base.toString)
    val mapping = IndexMapping(
      name = "project", docType = "project", root = "project",
      props = Seq(PropDef("code", "code")),
      aggregatedProps = Seq(
        AggregatedPropDef("subject_count", Seq("subject"), None, "count")))
    val docs = new Translator(schema, source).translate(mapping).collect()
    assert(docs.length === 1)
    assert(docs(0).getLong(docs(0).fieldIndex("subject_count")) === 0L)
  }
}
