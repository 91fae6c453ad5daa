package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{MappingDeps, MappingValidator, Translator}
import graft.schema.{DictionaryLoader, MappingYaml}
import graft.sinks.{EsControl, EsPublisher, FsEsClient}
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
    val force = args.contains("--force")
    // per-index CDC gate from dump-directory mtimes: only indices whose
    // dependency tables changed since their last publish re-run
    val cdc = args.contains("--cdc")
    // optional: the latest committed source transaction time feeding the
    // incremental gate (a JDBC-fed deployment passes
    // Jdbc.latestSucceededTxMillis here)
    val sourceTx = args.collectFirst {
      case a if a.startsWith("--source-tx-millis=") =>
        a.stripPrefix("--source-tx-millis=").toLong
    }
    // opt-in walk pruning for selective root filters (Translator doc):
    // N = the operator's estimate of roots surviving a filtered index
    val bloomRoots = args.collectFirst {
      case a if a.startsWith("--bloom-prune-roots=") =>
        a.stripPrefix("--bloom-prune-roots=").toLong
    }
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.length >= 4,
      "usage: RunEtl <schema.json> <etlMapping.yaml> <dumpsDir> <outDir> " +
        "[--force] [--source-tx-millis=N] [--cdc] [--bloom-prune-roots=N]")
    val Array(schemaPath, mappingPath, dumpsDir, outDir) = positional.take(4)
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
      // the config signal (dictionary + mapping mtimes) rides the table
      // map under the reserved key: a config change re-runs every index
      // that still has table signals, and an index whose dump dirs ALL
      // vanished falls back to always-run (MappingDeps.latestTxMillis —
      // the config time never substitutes for a missing table signal).
      // Residual caveat: deleting SOME of an index's dump dirs while its
      // remaining tables and config stay untouched leaves no signal for
      // the deletion — that case needs a config touch or --force.
      val cdcSignal =
        if (!cdc) None
        else Some(MappingDeps.dumpTableTimes(dumpsDir) +
          (MappingDeps.ConfigKey -> Seq(schemaPath, mappingPath)
            .map(p => new java.io.File(p).lastModified()).max))
      val published = run(spark, schemaPath, mappingPath, dumpsDir, outDir,
        latestSourceTxMillis = sourceTx, force = force,
        perTableTxMillis = cdcSignal, rootBloomPrune = bloomRoots)
      if (published.isEmpty)
        println("up to date — nothing published (use --force to override)")
      published.foreach { case (alias, (index, rows)) =>
        println(s"published $alias -> $index ($rows docs)")
      }
    } finally spark.stop()
  }

  /** Full pipeline; returns alias → (published index name, row count) for
    * every index actually published. The S11 incremental gate (reference
    * run_etl.py:91-103 `check_to_run_etl`) skips an index whose sink
    * timestamp already covers the source's latest change; `force`
    * overrides. With no source-change information the gate always runs
    * (safe default). Row counts come from the published parquet footers —
    * the translation frame is never executed twice.
    *
    * Gate granularity: with `perTableTxMillis` (a table → latest-change
    * map, e.g. from `MappingDeps.dumpTableTimes` or a CDC feed) each index
    * is gated on ONLY its own dependency tables (`MappingDeps.tables`), so
    * a change to one subgraph re-publishes one index, not all of them;
    * otherwise the single `latestSourceTxMillis` gates every index alike.
    * Only the surviving indices — plus the `joining_props` producers they
    * consume — are translated at all. */
  def run(spark: SparkSession, schemaPath: String, mappingPath: String,
          dumpsDir: String, outDir: String,
          nowMillis: Long = System.currentTimeMillis(),
          latestSourceTxMillis: Option[Long] = None,
          force: Boolean = false,
          perTableTxMillis: Option[Map[String, Long]] = None,
          rootBloomPrune: Option[Long] = None)
      : Map[String, (String, Long)] = {
    val schema = DictionaryLoader.loadFile(schemaPath)
    val mappingYaml = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(mappingPath)),
      "UTF-8")
    val mapping = DictionaryLoader.resolveMapping(schema,
      MappingYaml.parse(mappingYaml))
    // validate the WHOLE mapping every run, even under CDC gating —
    // otherwise an error in a gated-out index stays latent until its
    // tables finally change, surfacing mid-incremental-publish
    MappingValidator.validateOrThrow(schema, mapping)
    val client = new FsEsClient(java.nio.file.Paths.get(outDir))
    // each surviving index is published with a HIGH-WATER-MARK stamp: the
    // newest source change the gate saw, not the publish wall time. A
    // wall-time stamp has a masking race — a table changing DURING
    // translate is older than the stamp, so the next run would skip it
    // forever; stamping what the publish provably covered makes the next
    // comparison exact. Without source-change info the stamp falls back to
    // `nowMillis` (the gate then always runs, so nothing can be masked).
    val toRun = mapping.indices.flatMap { m =>
      val sourceTx = perTableTxMillis match {
        case Some(byTable) => MappingDeps.latestTxMillis(
          MappingDeps.tables(schema, mapping, m), byTable)
        case None => latestSourceTxMillis
      }
      if (EsControl.needsRun(sourceTx, client.timestamp(m.name), force))
        Some(m -> sourceTx.getOrElse(nowMillis))
      else None
    }
    if (toRun.isEmpty) return Map.empty
    val needed = MappingDeps.producerClosure(mapping, toRun.map(_._1.name).toSet)
    val source = TubeGraphSource(spark, schema, dumpsDir)
    val docs = Translator.runAll(schema, source,
      mapping.copy(indices = mapping.indices.filter(i => needed(i.name))),
      rootBloomPrune)
    toRun.map { case (m, stamp) =>
      val (index, rows) = EsPublisher.publishCounted(
        client, m.name, docs(m.name), m.docType, stamp)
      m.name -> (index, rows)
    }.toMap
  }
}
