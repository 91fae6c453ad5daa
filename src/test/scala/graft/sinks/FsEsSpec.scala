package graft.sinks

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end index lifecycle against the filesystem-backed ES: publish
  * twice, verify versioning + alias flip + retention + mapping + array
  * config + the incremental-run gate — the S9–S12 story with real
  * DataFrames, no cluster. */
class FsEsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    ("c1", "Alice", Seq("a", "b")),
    ("c2", "Bob", Seq("c")))
    .toDF("_customer_id", "name", "tags")

  test("publish cycle: version, load, flip, retain, array-config, timestamp") {
    val root: Path = Files.createTempDirectory("fses")
    val es = new FsEsClient(root)

    val v0 = EsPublisher.publish(es, "customer", docs, "customer",
      nowMillis = 1000L)
    assert(v0 === "customer_0")
    assert(es.aliasTargets("customer") === Seq("customer_0"))

    // documents round-trip through the versioned index directory
    val loaded = spark.read.parquet(root.resolve("customer_0/docs").toString)
    assert(loaded.count() === 2)
    assert(loaded.columns.sorted === Array("_customer_id", "name", "tags"))

    // generated mapping landed next to the documents
    val mapping = new String(
      Files.readAllBytes(root.resolve("customer_0/_mapping.json")), "UTF-8")
    assert(mapping.contains(""""name":{"type":"keyword""""))

    // S12: array-config side doc lists the array-typed field
    val cfg = new String(
      Files.readAllBytes(root.resolve("customer-array-config/config.json")),
      "UTF-8")
    assert(cfg.contains(""""array":["tags"]"""))

    // S11: the timestamp alias gates re-runs
    assert(es.timestamp("customer") === Some(1000L))
    assert(!EsControl.needsRun(Some(900L), es.timestamp("customer")))
    assert(EsControl.needsRun(Some(2000L), es.timestamp("customer")))

    // second publish: next version, alias flips, old version retained once
    val v1 = EsPublisher.publish(es, "customer",
      docs.withColumn("extra", lit(1L)), "customer", nowMillis = 3000L)
    assert(v1 === "customer_1")
    assert(es.aliasTargets("customer") === Seq("customer_1"))
    assert(es.indices().contains("customer_0")) // rollback copy kept
    assert(es.timestamp("customer") === Some(3000L))

    // third publish: customer_0 falls off retention (keep = 1)
    EsPublisher.publish(es, "customer", docs, "customer", nowMillis = 4000L)
    assert(!es.indices().contains("customer_0"))
    assert(es.indices().contains("customer_1"))
  }
}
