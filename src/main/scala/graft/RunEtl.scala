package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.Translator
import graft.schema.{DictionaryLoader, MappingYaml}
import graft.sinks.{EsPublisher, FsEsClient}
import graft.sources.TubeGraphSource

/** The deployment entry point — the engine's `run_etl.py` (reference:
  * run_etl.py:14-60 + tube/etl/indexers/interpreter.py): point it at the
  * SAME inputs a reference deployment has (data-dictionary schema.json,
  * etlMapping.yaml, a directory of node/edge table dumps) and it loads the
  * schema, resolves the mapping, translates every index in dependency
  * order, and publishes each through the versioned-alias lifecycle.
  *
  * Usage:
  *   runMain graft.RunEtl <schema.json> <etlMapping.yaml> <dumpsDir> <outDir>
  *
  * The sink is the filesystem-backed ES stand-in (FsEsClient: versioned
  * index dirs + alias flip + retention); swap the client for an HTTP
  * transport to publish to a live cluster — the lifecycle code is
  * transport-agnostic (sinks/EsControl.scala).
  */
object RunEtl {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: RunEtl <schema.json> <etlMapping.yaml> <dumpsDir> <outDir>")
    val Array(schemaPath, mappingPath, dumpsDir, outDir) = args.take(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .appName("graft-etl")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val published = run(spark, schemaPath, mappingPath, dumpsDir, outDir)
      published.foreach { case (alias, (index, rows)) =>
        println(s"published $alias -> $index ($rows docs)")
      }
    } finally spark.stop()
  }

  /** Full pipeline; returns alias → (published index name, row count). */
  def run(spark: SparkSession, schemaPath: String, mappingPath: String,
          dumpsDir: String, outDir: String,
          nowMillis: Long = System.currentTimeMillis()): Map[String, (String, Long)] = {
    val schema = DictionaryLoader.loadFile(schemaPath)
    val mappingYaml = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(mappingPath)),
      "UTF-8")
    val mapping = DictionaryLoader.resolveMapping(schema,
      MappingYaml.parse(mappingYaml))
    val source = TubeGraphSource(spark, schema, dumpsDir)
    val docs = Translator.runAll(schema, source, mapping)
    val client = new FsEsClient(java.nio.file.Paths.get(outDir))
    mapping.indices.map { m =>
      val df = docs(m.name)
      val index = EsPublisher.publish(client, m.name, df, m.docType, nowMillis)
      m.name -> (index, df.count())
    }.toMap
  }
}
