package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StringType
import graft.schema._

class MappingValidatorSpec extends AnyFunSuite {

  private val schema = GraphSchema(
    nodes = Seq(
      NodeDef("program", "program", Map.empty, "admin"),
      NodeDef("project", "project", Map.empty, "admin"),
      NodeDef("subject", "subject", Map("age" -> StringType), "clinical")),
    links = Seq(
      LinkDef("project", "program", "e_pp"),
      LinkDef("subject", "project", "e_sp")))

  test("valid mapping produces no findings") {
    val ok = IndexMapping(name = "s", docType = "s", root = "subject",
      parentProps = Seq(ParentChainDef(Seq(
        PathStep("project", Seq(PropDef.of("code"))),
        PathStep("program", Seq(PropDef.of("name")))))),
      joiningProps = Seq(JoiningDef("p", Seq("k"), Nil)))
    val p = IndexMapping(name = "p", docType = "p", root = "project")
    assert(MappingValidator.validate(schema, EtlMapping(Seq(ok, p))) === Nil)
  }

  test("every structural problem is reported at once") {
    val bad = IndexMapping(name = "b", docType = "b", root = "nope",
      parentProps = Seq(ParentChainDef(Seq(PathStep("program", Nil)))), // no edge b->program from 'nope'
      flattenProps = Seq(FlattenDef("ghost", Nil)),
      aggregatedProps = Seq(AggregatedPropDef("n", Seq("project", "subject"), None, "count")),
      nestedProps = Seq(NestedDef("x", Seq("subject"), Nil)),
      joiningProps = Seq(JoiningDef("missing_index", Seq("k"), Nil)))
    val errs = MappingValidator.validate(schema, EtlMapping(Seq(bad)))
    assert(errs.exists(_.contains("unknown root 'nope'")))
    assert(errs.exists(_.contains("unknown node 'ghost'")))
    assert(errs.exists(_.contains("unknown index 'missing_index'")))
    assert(errs.size >= 4)
  }

  test("duplicate index names flagged; runAll refuses invalid mappings") {
    val a = IndexMapping(name = "dup", docType = "a", root = "subject")
    val b = IndexMapping(name = "dup", docType = "b", root = "subject")
    val errs = MappingValidator.validate(schema, EtlMapping(Seq(a, b)))
    assert(errs.exists(_.contains("duplicate index name")))
  }
}
