package graft.sinks

/** Driver-side Elasticsearch/OpenSearch index lifecycle control —
  * versioning, alias flips, and the incremental-run timestamp gate
  * (SURVEY §2.1 S10–S12; reference: tube/etl/outputs/es/versioning.py:26-162
  * and timestamp.py:20-98). Pure decision logic over a minimal client
  * interface so it unit-tests without a cluster and the transport is
  * swappable. None of this runs on executors — it is control plane only.
  */
trait EsClient {
  /** All index names currently present. */
  def indices(): Seq[String]
  /** Indices an alias currently points at. */
  def aliasTargets(alias: String): Seq[String]
  def createIndex(name: String, mappingJson: String): Unit
  /** Atomically re-point `alias` from `old` (possibly empty) to `target`. */
  def flipAlias(alias: String, old: Seq[String], target: String): Unit
  def deleteIndex(name: String): Unit
  /** Server-side copy of every DOCUMENT from `source` into `target` — the
    * `_reindex` API on a live cluster. A live `_reindex` does NOT carry
    * the source mapping (the target's own mapping — or dynamic mapping —
    * applies), so callers that need mapping fidelity must create the
    * target from [[getMapping]] first, as `EsControl.backup`/`restore`
    * do. */
  def reindex(source: String, target: String): Unit
  /** The index's current mapping JSON (ES `get_mapping`); "{}" when the
    * index has none. */
  def getMapping(index: String): String
  /** Tag `index` with `alias` WITHOUT disturbing the alias's other
    * targets (ES `put_alias`). */
  def addAlias(index: String, alias: String): Unit
  /** Untag `index` from `alias` (ES `delete_alias`). */
  def removeAlias(index: String, alias: String): Unit
}

object EsControl {

  /** Versioned index names are `{alias}_{n}`. Next version = max existing
    * + 1 (reference versioning.py:26-56 `get_next_index_version`). */
  def nextVersion(existing: Seq[String], alias: String): String = {
    val re = s"""^${java.util.regex.Pattern.quote(alias)}_(\\d+)$$""".r
    val versions = existing.collect { case re(v) => v.toInt }
    s"${alias}_${if (versions.isEmpty) 0 else versions.max + 1}"
  }

  /** Full publish cycle: create `{alias}_{n+1}` with the mapping, let the
    * caller bulk-load it, then flip the alias and optionally drop older
    * versions (keeping `keep` as rollback). Returns the new index name. */
  def publish(client: EsClient, alias: String, mappingJson: String,
              load: String => Unit, keep: Int = 1): String = {
    val target = nextVersion(client.indices(), alias)
    client.createIndex(target, mappingJson)
    load(target)
    val old = client.aliasTargets(alias)
    client.flipAlias(alias, old, target)
    // retain the newest `keep` superseded versions for rollback
    val re = s"""^${java.util.regex.Pattern.quote(alias)}_(\\d+)$$""".r
    client.indices()
      .collect { case n @ re(v) => (n, v.toInt) }
      .filter(_._1 != target)
      .sortBy(-_._2)
      .drop(keep)
      .foreach { case (n, _) => client.deleteIndex(n) }
    target
  }

  /** The rollback alias for `alias` (reference versioning.py:15-16
    * `get_backup_alias`). */
  def backupAlias(alias: String): String = s"${alias}_backup"

  /** Backup index names carry the version as a PREFIX — `{v}_{alias}`
    * (reference versioning.py:11-22 `get_backup_index_name` /
    * `get_backup_version`) — so they can never collide with, or be picked
    * up by, `nextVersion`'s `{alias}_{n}` suffix pattern. Next backup
    * version = max over EXISTING `{v}_{alias}` indices + 1 (numeric, the
    * nextVersion rule) — derived from the index list, NOT the backup
    * alias: old backups are retained untagged by design, so an
    * alias-derived version would reset to 0 after any alias loss and
    * collide with (and then corrupt) a retained backup index. */
  def nextBackupName(client: EsClient, alias: String): String = {
    val re = s"""^(\\d+)_${java.util.regex.Pattern.quote(alias)}$$""".r
    val versions = client.indices().collect { case re(v) => v.toInt }
    s"${if (versions.isEmpty) 0 else versions.max + 1}_${alias}"
  }

  /** S10 backup (reference versioning.py:58-82 `do_backup_index`): copy
    * the index currently published under `alias` into a fresh
    * `{v}_{alias}` backup index and move the `{alias}_backup` alias onto
    * it. The previous backup index, if any, loses the alias but is NOT
    * deleted — the reference's exact retention behavior. Returns the
    * backup index name, or None when nothing is published under `alias`. */
  def backup(client: EsClient, alias: String): Option[String] =
    client.aliasTargets(alias).headOption.map { src =>
      val bAlias = backupAlias(alias)
      val prior = client.aliasTargets(bAlias)
      val target = nextBackupName(client, alias)
      // create the backup with the SOURCE's actual mapping: a live-ES
      // _reindex does not carry mappings, and restoring into a
      // dynamically-mapped index drifts field types (text vs keyword)
      client.createIndex(target, client.getMapping(src))
      client.reindex(src, target)
      prior.foreach(p => client.removeAlias(p, bAlias))
      client.addAlias(target, bAlias)
      target
    }

  /** Restore-on-demand (reference versioning.py:140-156 rollback path):
    * republish the current `{alias}_backup` target as a NEW version of
    * `alias` — create `{alias}_{n+1}`, reindex the backup into it, flip
    * the alias. The forward version history stays monotone (a rollback is
    * itself a publish), so a later fix-forward never collides with the
    * rolled-back version. Returns the new live index name, or None when
    * no backup exists. */
  def restore(client: EsClient, alias: String): Option[String] =
    client.aliasTargets(backupAlias(alias)).headOption.map { b =>
      val target = nextVersion(client.indices(), alias)
      // same mapping-fidelity rule as backup(): the restored live index
      // gets the backup's real mapping, not dynamic mapping
      client.createIndex(target, client.getMapping(b))
      client.reindex(b, target)
      client.flipAlias(alias, client.aliasTargets(alias), target)
      target
    }

  /** S11 — incremental-run gate: skip the whole ETL when the sink already
    * reflects every committed source transaction (reference
    * timestamp.py:71-79 `check_to_run_etl`). Both sides are epoch millis;
    * `None` source time (no transactions) or missing sink timestamp ⇒ run. */
  def needsRun(latestSourceTxMillis: Option[Long],
               sinkTimestampMillis: Option[Long],
               force: Boolean = false): Boolean =
    force || (latestSourceTxMillis match {
      case None => true
      case Some(src) => sinkTimestampMillis.forall(_ < src)
    })
}
