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
