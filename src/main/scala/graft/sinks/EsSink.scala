package graft.sinks

import org.apache.spark.sql.DataFrame

/** Elasticsearch/OpenSearch sink configuration — the engine-side mirror of
  * the reference's `ES_SPARK_CONFIG` wiring (tube/etl/outputs/es/
  * writer.py:56-79): nodes/port, WAN mode, SSL, optional basic auth, and
  * the document-id mapping. `extra` passes any other es-hadoop option
  * through verbatim. */
final case class EsSinkConfig(
    nodes: String,
    port: Int = 9200,
    ssl: Boolean = false,
    user: Option[String] = None,
    password: Option[String] = None,
    /** WAN-only is the cloud/managed-cluster default: client talks only to
      * the published addresses, no data-node discovery. */
    wanOnly: Boolean = true,
    /** Document field used as the ES `_id` (es.mapping.id). */
    mappingId: Option[String] = None,
    extra: Map[String, String] = Map.empty)

object EsSinkConfig {
  /** Env-driven construction through the Settings parity layer (ES_URL /
    * ES_PORT / ES_USE_SSL / ES_AUTH_USERNAME / ES_AUTH_PASSWORD) — the
    * reference builds `ES_SPARK_CONFIG` from the same variables
    * (tube/settings.py:56-77), so a deployment's env configures this sink
    * with no code changes. */
  def fromEnv(env: Map[String, String],
              mappingId: Option[String] = None): EsSinkConfig = {
    val es = graft.Settings.es(env)
    EsSinkConfig(nodes = es.url, port = es.port.toInt, ssl = es.useSsl,
      user = es.authUser, password = es.authPass, mappingId = mappingId)
  }
}

/** `DocumentSink` over the es-hadoop Spark connector. The connector is a
  * runtime DataSource resolved by NAME (`org.elasticsearch.spark.sql`), so
  * this compiles and unit-tests with no connector jar and no cluster; on a
  * real deployment, ship the es-hadoop/opensearch-hadoop jar for the
  * cluster's Scala/Spark version (the reference vendors
  * elasticsearch-hadoop 8.3.3) and the same code publishes over HTTP.
  *
  * Deliberate divergence from the reference: NO `coalesce(1)`
  * (writer.py:59) — the reference funnels every document through one task;
  * here each partition bulk-indexes concurrently, which is the entire point
  * of a distributed sink at 100 TB. Back-pressure is the connector's
  * es.batch.* knobs (pass via `extra`), not a single writer. */
final class EsSink(cfg: EsSinkConfig, indexFor: String => String = identity)
    extends DocumentSink {

  /** Full es-hadoop option map for one index — exposed for tests and
    * debugging. Auth options appear only when BOTH user and password are
    * set (mirrors writer.py:70-77). */
  def options(index: String): Map[String, String] = {
    val base = Map(
      "es.nodes" -> cfg.nodes,
      "es.port" -> cfg.port.toString,
      "es.resource" -> index,
      "es.nodes.wan.only" -> cfg.wanOnly.toString,
      "es.net.ssl" -> cfg.ssl.toString)
    val auth = (cfg.user, cfg.password) match {
      case (Some(u), Some(p)) =>
        Map("es.net.http.auth.user" -> u, "es.net.http.auth.pass" -> p)
      case _ => Map.empty[String, String]
    }
    val id = cfg.mappingId.map(f => Map("es.mapping.id" -> f))
      .getOrElse(Map.empty)
    base ++ auth ++ id ++ cfg.extra
  }

  def write(docs: DataFrame, docType: String): Unit =
    docs.write
      .format(EsSink.Format)
      .options(options(indexFor(docType)))
      .mode("append")
      .save()
}

object EsSink {
  /** The es-hadoop DataSource name (same for OpenSearch forks ≤ 8.x). */
  val Format = "org.elasticsearch.spark.sql"
}
