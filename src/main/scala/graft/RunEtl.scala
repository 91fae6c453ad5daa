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
    // rollback mode: re-publish the {alias}_backup index as the new live
    // version and exit — no translation, no Spark session needed
    args.collectFirst {
      case a if a.startsWith("--restore=") => a.stripPrefix("--restore=")
    }.foreach { alias =>
      val positional0 = args.filterNot(_.startsWith("--"))
      require(positional0.nonEmpty,
        "usage: RunEtl <outDir> --restore=<alias>")
      val client = new FsEsClient(
        java.nio.file.Paths.get(positional0.last))
      EsControl.restore(client, alias) match {
        case Some(idx) =>
          // rewind the S11 stamp: it was written by the publish being
          // rolled back, and would otherwise gate-skip the fix-forward
          // run when sources/config are unchanged (forcing --force)
          client.clearTimestamp(alias)
          println(s"restored $alias -> $idx (incremental stamp cleared — " +
            "next publish will run)")
          return
        case None => sys.error(s"no ${alias}_backup index to restore")
      }
    }
    val force = args.contains("--force")
    // take a rollback backup of each outgoing live index before publishing
    val backup = args.contains("--backup")
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
    val (schemaPath, mappingPath, dumpsDir, outDir) =
      resolveInputs(positional.toSeq, sys.env)
    val tuning = Settings.sparkTuning(sys.env)
    val builder = SparkSession.builder()
      .master(tuning.master)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      // reliable checkpoints (written when a checkpoint dir is set — see
      // Frames.truncate) are only garbage-collected with this on; the
      // default (false) accretes one rdd-<id> dir per iteration round
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .appName("graft-etl")
    tuning.executorMemory.foreach(builder.config("spark.executor.memory", _))
    tuning.driverMemory.foreach(builder.config("spark.driver.memory", _))
    val spark = builder.getOrCreate()
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
      // schema/mapping configs are LOCAL by contract (loaded below via
      // java.nio.file — they ship with the job, not the data), so a
      // java.io.File mtime is the consistent signal for them; the dumps
      // dir is scheme-aware (Spark reads it), so its listing goes
      // through the Hadoop FileSystem inside dumpTableTimes
      val cdcSignal =
        if (!cdc) None
        else Some(MappingDeps.dumpTableTimes(dumpsDir,
            spark.sparkContext.hadoopConfiguration) +
          (MappingDeps.ConfigKey -> Seq(schemaPath, mappingPath)
            .map(p => new java.io.File(p).lastModified()).max))
      val published = run(spark, schemaPath, mappingPath, dumpsDir, outDir,
        latestSourceTxMillis = sourceTx, force = force,
        perTableTxMillis = cdcSignal, rootBloomPrune = bloomRoots,
        backup = backup)
      if (published.isEmpty)
        println("up to date — nothing published (use --force to override)")
      published.foreach { case (alias, (index, rows)) =>
        println(s"published $alias -> $index ($rows docs)")
      }
    } finally spark.stop()
  }

  /** Argv+env input resolution (reference settings.py:36-39, 96-100 env
    * parity): four positional args are authoritative; with only
    * `<dumpsDir> <outDir>` given, the schema comes from `DICTIONARY_URL`
    * (plain path or file:// URI) and the mapping from the first
    * `etlMapping.yaml` on the reference's config search path
    * (`$XDG_DATA_HOME/gen3/tube` etc.) — so the reference's deployment
    * scripts drive this entry point without argument changes. `folders`
    * overrides the search path for tests. */
  def resolveInputs(positional: Seq[String], env: Map[String, String],
                    folders: Option[Seq[String]] = None)
      : (String, String, String, String) = positional match {
    case Seq(s, m, d, o, _*) => (s, m, d, o)
    case Seq(d, o) =>
      val schema = Settings.dictionaryUrl(env).map(Settings.asLocalPath)
        .getOrElse(sys.error(
          "no schema.json: pass it positionally or set DICTIONARY_URL"))
      val mapping = Settings.findPath("etlMapping.yaml", "tube", env, folders)
        .getOrElse(sys.error(
          "no etlMapping.yaml: pass it positionally or place it on the " +
            "gen3/tube config search path"))
      (schema, mapping, d, o)
    case _ => sys.error(
      "usage: RunEtl [<schema.json> <etlMapping.yaml>] <dumpsDir> <outDir> " +
        "[--force] [--source-tx-millis=N] [--cdc] [--bloom-prune-roots=N] " +
        "[--backup] | RunEtl <outDir> --restore=<alias>")
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
          rootBloomPrune: Option[Long] = None,
          backup: Boolean = false)
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
      // --backup: snapshot the outgoing live index first, so a bad publish
      // is one `--restore=<alias>` away from rollback
      if (backup) EsControl.backup(client, m.name)
      val (index, rows) = EsPublisher.publishCounted(
        client, m.name, docs(m.name), m.docType, stamp)
      m.name -> (index, rows)
    }.toMap
  }
}
