package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def recs = Seq(
    (0L, "http://a/1", "<p>first page body</p>"),
    (0L, "http://a/2", "<p>second page with \r\n CRLF inside</p>"),
    (1L, "http://b/1", ""), // empty payload is a legal record
    (1L, "http://b/2", "<div>unicode: émojis über 🎉</div>"))
    .toDF("batch", "uri", "html")

  test("pack → parse round trip is the identity on (batch, uri, html), " +
      "including CRLF-bearing payloads, empty payloads, and non-ASCII " +
      "(byte-measured Content-Length)") {
    val back = Warc.parse(Warc.pack(recs, "batch", "uri", "html"))
      .collect().map(r => (r.batch_id, r.uri, r.html)).toSet
    val expect = recs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back === expect)
  }

  test("archives are deterministic (records sorted by URI inside a batch) " +
      "and carry record counts for pre-decode filtering") {
    val a1 = Warc.pack(recs, "batch", "uri", "html").collect()
      .sortBy(_.batch_id)
    val a2 = Warc.pack(recs.orderBy(rand(42)), "batch", "uri", "html")
      .collect().sortBy(_.batch_id)
    assert(a1.map(_.payload.toSeq).toSeq === a2.map(_.payload.toSeq).toSeq)
    assert(a1.map(_.n_records).toSeq === Seq(2, 2))
  }

  test("a Content-Length lie fails loudly instead of absorbing the next " +
      "record") {
    val good = Warc.pack(recs.filter($"batch" === 0L),
      "batch", "uri", "html").collect()(0)
    val text = new String(good.payload, UTF_8)
    val bad = text.replaceFirst("Content-Length: 22", "Content-Length: 25")
    val badDs = Seq(Warc.WarcArchive(0L, 2, bad.getBytes(UTF_8))).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Warc.parse(badDs).collect()
    }
    assert(ex.getMessage != null)
  }

  test("truncated archives and foreign bytes fail loudly") {
    val good = Warc.pack(recs.filter($"batch" === 0L),
      "batch", "uri", "html").collect()(0)
    val cut = good.payload.take(good.payload.length - 6)
    intercept[org.apache.spark.SparkException] {
      Warc.parse(Seq(Warc.WarcArchive(0L, 2, cut)).toDS()).collect()
    }
    intercept[org.apache.spark.SparkException] {
      Warc.parse(Seq(Warc.WarcArchive(0L, 1,
        "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8))).toDS()).collect()
    }
  }
}
