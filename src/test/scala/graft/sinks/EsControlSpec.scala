package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

class EsControlSpec extends AnyFunSuite {

  private class FakeEs extends EsClient {
    val existing = mutable.LinkedHashSet[String]()
    val aliases = mutable.Map[String, Seq[String]]()
    val loaded = mutable.Buffer[String]()
    def indices(): Seq[String] = existing.toSeq
    def aliasTargets(alias: String): Seq[String] = aliases.getOrElse(alias, Nil)
    def createIndex(name: String, mappingJson: String): Unit = existing += name
    def flipAlias(alias: String, old: Seq[String], target: String): Unit =
      aliases(alias) = Seq(target)
    def deleteIndex(name: String): Unit = existing -= name
  }

  test("nextVersion: 0 when fresh, max+1 otherwise, ignores other aliases") {
    assert(EsControl.nextVersion(Nil, "subject") === "subject_0")
    assert(EsControl.nextVersion(
      Seq("subject_0", "subject_3", "file_9", "subject_x"), "subject") ===
      "subject_4")
  }

  test("publish: create → load → alias flip → retention") {
    val es = new FakeEs
    es.existing ++= Seq("subject_0", "subject_1", "subject_2")
    es.aliases("subject") = Seq("subject_2")
    val created = EsControl.publish(es, "subject", "{}",
      idx => es.loaded += idx, keep = 1)
    assert(created === "subject_3")
    assert(es.loaded === Seq("subject_3"))
    assert(es.aliasTargets("subject") === Seq("subject_3"))
    // keeps subject_2 for rollback, drops 0 and 1
    assert(es.indices().toSet === Set("subject_2", "subject_3"))
  }

  test("needsRun: stale or missing sink timestamp runs; fresh skips; force wins") {
    assert(EsControl.needsRun(Some(100L), None))
    assert(EsControl.needsRun(Some(100L), Some(99L)))
    assert(!EsControl.needsRun(Some(100L), Some(100L)))
    assert(!EsControl.needsRun(Some(100L), Some(150L)))
    assert(EsControl.needsRun(None, Some(150L))) // no tx log → run
    assert(EsControl.needsRun(Some(100L), Some(150L), force = true))
  }
}
