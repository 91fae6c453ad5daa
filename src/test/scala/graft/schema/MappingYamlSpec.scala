package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Pure parsers — no Spark. Mirrors the reference's etlMapping.yaml shape
  * (reference: docs/configuration_file.md:29-43, aggregation/parser.py). */
class MappingYamlSpec extends AnyFunSuite {

  private val yaml =
    """mappings:
      |  - name: subject_index
      |    doc_type: subject
      |    type: aggregator
      |    root: subject
      |    props:
      |      - name: sex
      |        value_mappings:
      |          - f: Female
      |          - m: Male
      |      - age
      |    parent_props:
      |      - path: projects[project_name:name].programs[program_name:name]
      |        relation: 1-1
      |    flatten_props:
      |      - path: demographics
      |        props: [race]
      |        sorted_by: updated_at, desc
      |    aggregated_props:
      |      - name: sample_count
      |        path: samples
      |        fn: count
      |      - name: total_vol
      |        path: samples
      |        src: vol
      |        fn: sum
      |    nested_props:
      |      - name: samples
      |        path: samples
      |        props: [tissue]
      |        filter:
      |          op: "="
      |          prop: tissue
      |          value: blood
      |    joining_props:
      |      - index: file_index
      |        join_on: subject_id
      |        props:
      |          - name: file_names
      |            src: file_name
      |            fn: set
      |  - name: file_index
      |    doc_type: file
      |    type: collector
      |    root: program
      |    category: data_file
      |    props: [file_name]
      |    injecting_props:
      |      project:
      |        props:
      |          - name: project_code
      |            src: code
      |""".stripMargin

  test("full mapping round-trips") {
    val m = MappingYaml.parse(yaml)
    assert(m.indices.map(_.name) === Seq("subject_index", "file_index"))
    val s = m.indices.head
    assert(s.root === "subject")
    assert(s.props === Seq(
      PropDef("sex", "sex", None, Map("f" -> "Female", "m" -> "Male")),
      PropDef("age", "age")))
    assert(s.parentProps.head.relation === "1-1")
    assert(s.parentProps.head.steps === Seq(
      PathStep("projects", Seq(PropDef("project_name", "name"))),
      PathStep("programs", Seq(PropDef("program_name", "name")))))
    assert(s.flattenProps.head.sortedBy === Some(("updated_at", true)))
    assert(s.aggregatedProps === Seq(
      AggregatedPropDef("sample_count", Seq("samples"), None, "count"),
      AggregatedPropDef("total_vol", Seq("samples"), Some("vol"), "sum")))
    val n = s.nestedProps.head
    assert(n.name === "samples" && n.props === Seq(PropDef("tissue", "tissue")))
    assert(n.filter === Some(FilterLeaf("=", "tissue", "blood")))
    assert(s.joiningProps === Seq(JoiningDef("file_index", Seq("subject_id"),
      Seq(PropDef("file_names", "file_name", Some("set"))))))
    val f = m.indices(1)
    assert(f.kind === "collector")
    assert(f.injection === Some(InjectionDef("data_file",
      Map("project" -> Seq(PropDef("project_code", "code"))))))
  }

  test("parent path grammar handles multiple props and renames") {
    val steps = MappingYaml.parseParentPath("studies[a,b:c].projects[d]")
    assert(steps === Seq(
      PathStep("studies", Seq(PropDef("a", "a"), PropDef("b", "c"))),
      PathStep("projects", Seq(PropDef("d", "d")))))
  }

  test("parent path grammar: dots inside bracket blocks don't split steps") {
    val steps = MappingYaml.parseParentPath("studies[s:meta.x].projects[d]")
    assert(steps === Seq(
      PathStep("studies", Seq(PropDef("s", "meta.x"))),
      PathStep("projects", Seq(PropDef("d", "d")))))
    // bracketless walk-through steps still split normally
    assert(MappingYaml.parseParentPath("participants.protocols[p]") === Seq(
      PathStep("participants", Nil), PathStep("protocols", Seq(PropDef.of("p")))))
  }
}
