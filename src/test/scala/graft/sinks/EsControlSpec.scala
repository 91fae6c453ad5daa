package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

class EsControlSpec extends AnyFunSuite {

  private class FakeEs extends EsClient {
    val existing = mutable.LinkedHashSet[String]()
    val aliases = mutable.Map[String, Seq[String]]()
    val loaded = mutable.Buffer[String]()
    val mappings = mutable.Map[String, String]()
    def indices(): Seq[String] = existing.toSeq
    def aliasTargets(alias: String): Seq[String] = aliases.getOrElse(alias, Nil)
    def createIndex(name: String, mappingJson: String): Unit = {
      existing += name
      mappings(name) = mappingJson
    }
    def getMapping(index: String): String = mappings.getOrElse(index, "{}")
    def flipAlias(alias: String, old: Seq[String], target: String): Unit =
      aliases(alias) = Seq(target)
    def deleteIndex(name: String): Unit = existing -= name
    val copies = mutable.Buffer[(String, String)]()
    def reindex(source: String, target: String): Unit =
      copies += ((source, target))
    def addAlias(index: String, alias: String): Unit =
      aliases(alias) = (aliases.getOrElse(alias, Nil) :+ index).distinct
    def removeAlias(index: String, alias: String): Unit = {
      val rest = aliases.getOrElse(alias, Nil).filterNot(_ == index)
      if (rest.isEmpty) aliases -= alias else aliases(alias) = rest
    }
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

  test("backup and restore create targets with the SOURCE's mapping — " +
      "reindex alone never carries one (live-ES semantics)") {
    val es = new FakeEs
    es.createIndex("subject_0", """{"subject":{"properties":{}}}""")
    es.aliases("subject") = Seq("subject_0")
    val b = EsControl.backup(es, "subject").get
    assert(es.getMapping(b) === """{"subject":{"properties":{}}}""")
    val restored = EsControl.restore(es, "subject").get
    assert(es.getMapping(restored) === """{"subject":{"properties":{}}}""")
  }

  test("backup: copies the live index into a version-PREFIXED backup and moves the backup alias") {
    val es = new FakeEs
    assert(EsControl.backup(es, "subject") === None) // nothing published
    es.existing += "subject_0"
    es.aliases("subject") = Seq("subject_0")
    assert(EsControl.backup(es, "subject") === Some("0_subject"))
    assert(es.copies === Seq(("subject_0", "0_subject")))
    assert(es.aliasTargets("subject_backup") === Seq("0_subject"))
    // second backup bumps the PREFIX version and re-tags; the old backup
    // index stays (untagged), matching the reference's retention
    assert(EsControl.backup(es, "subject") === Some("1_subject"))
    assert(es.aliasTargets("subject_backup") === Seq("1_subject"))
    assert(es.indices().contains("0_subject"))
    // backup names never leak into the forward version sequence
    assert(EsControl.nextVersion(es.indices(), "subject") === "subject_1")
  }

  test("restore: republishes the backup as a NEW forward version") {
    val es = new FakeEs
    assert(EsControl.restore(es, "subject") === None) // no backup yet
    es.existing ++= Seq("subject_0", "subject_1", "0_subject")
    es.aliases("subject") = Seq("subject_1")
    es.aliases("subject_backup") = Seq("0_subject")
    assert(EsControl.restore(es, "subject") === Some("subject_2"))
    assert(es.copies === Seq(("0_subject", "subject_2")))
    assert(es.aliasTargets("subject") === Seq("subject_2"))
  }

  test("backup then publish composes into a rollback-ready cycle; a lost backup alias never resets the version") {
    val es = new FakeEs
    es.existing += "subject_0"
    es.aliases("subject") = Seq("subject_0")
    val b = EsControl.backup(es, "subject")
    val created = EsControl.publish(es, "subject", "{}",
      idx => es.loaded += idx, keep = 1)
    assert(b === Some("0_subject"))
    assert(created === "subject_1")
    assert(es.aliasTargets("subject") === Seq("subject_1"))
    assert(es.aliasTargets("subject_backup") === Seq("0_subject"))
    // versioning derives from the INDEX list: even with the backup alias
    // gone, the next backup never collides with the retained 0_subject
    es.aliases -= "subject_backup"
    assert(EsControl.backup(es, "subject") === Some("1_subject"))
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
