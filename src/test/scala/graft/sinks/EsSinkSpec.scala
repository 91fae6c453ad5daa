package graft.sinks

import graft.SparkSpec

/** Option wiring for the ES connector sink — no cluster, no connector jar.
  * The write path is exercised up to DataSource resolution: with the
  * connector absent, Spark must fail looking up exactly the es-hadoop
  * format name, proving the sink hands off to the right DataSource. */
class EsSinkSpec extends SparkSpec {
  import spark.implicits._

  test("option map mirrors the reference writer's wiring") {
    val sink = new EsSink(EsSinkConfig(
      nodes = "es1,es2", port = 9243, ssl = true,
      user = Some("etl"), password = Some("s3cret"),
      mappingId = Some("_customer_id"),
      extra = Map("es.batch.size.entries" -> "5000")))
    val o = sink.options("customer_3")
    assert(o("es.nodes") === "es1,es2")
    assert(o("es.port") === "9243")
    assert(o("es.resource") === "customer_3")
    assert(o("es.net.ssl") === "true")
    assert(o("es.nodes.wan.only") === "true")
    assert(o("es.net.http.auth.user") === "etl")
    assert(o("es.net.http.auth.pass") === "s3cret")
    assert(o("es.mapping.id") === "_customer_id")
    assert(o("es.batch.size.entries") === "5000")
  }

  test("auth options appear only when BOTH user and password are set") {
    val noPass = new EsSink(EsSinkConfig("es1", user = Some("u")))
    assert(!noPass.options("i").contains("es.net.http.auth.user"))
    val noneSet = new EsSink(EsSinkConfig("es1"))
    assert(!noneSet.options("i").contains("es.net.http.auth.pass"))
  }

  test("index naming goes through indexFor (versioned-index hook)") {
    val sink = new EsSink(EsSinkConfig("es1"), docType => s"${docType}_7")
    assert(sink.options("ignored")("es.resource") === "ignored")
    // write() resolves the versioned name itself
    val ex = intercept[Throwable] {
      sink.write(Seq((1L, "a")).toDF("id", "name"), "customer")
    }
    // without the connector jar the failure is the DataSource lookup for
    // exactly the es-hadoop format — the hand-off point a real deployment
    // satisfies by shipping the jar
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("elasticsearch.spark.sql") ||
      msg.contains("Failed to find"))
  }

  test("fromEnv: the reference's ES_* env vars configure the sink") {
    val cfg = EsSinkConfig.fromEnv(Map(
      "ES_URL" -> "es.internal", "ES_PORT" -> "443",
      "ES_AUTH_USERNAME" -> "u", "ES_AUTH_PASSWORD" -> "p"),
      mappingId = Some("_customer_id"))
    val opts = new EsSink(cfg).options("subject_0")
    assert(opts("es.nodes") === "es.internal")
    assert(opts("es.port") === "443")
    assert(opts("es.net.ssl") === "true") // port-443 rule from Settings.es
    assert(opts("es.net.http.auth.user") === "u")
    assert(opts("es.mapping.id") === "_customer_id")
    // defaults: reference's esproxy-service:9200, no ssl, no auth keys
    val dflt = new EsSink(EsSinkConfig.fromEnv(Map.empty)).options("x")
    assert(dflt("es.nodes") === "esproxy-service")
    assert(dflt("es.net.ssl") === "false")
    assert(!dflt.contains("es.net.http.auth.user"))
  }
}
