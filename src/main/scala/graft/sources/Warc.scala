package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC-style web-archive record stream (beyond-parity) — the container a
  * crawl corpus actually arrives in (Common Crawl ships concatenated WARC
  * records): each archive blob holds many records, each a `WARC/1.0`
  * header block (CRLF-terminated `Name: value` lines, byte-exact
  * `Content-Length`) followed by the payload and a blank-line separator.
  *
  * The writer and reader here are REAL byte-level codecs in the
  * [[graft.functions.Multimodal]] mold: `pack` builds spec-shaped record
  * bytes (header fields, CRLF discipline, byte-measured Content-Length)
  * and `parse` walks an archive strictly by those lengths — a
  * Content-Length or separator bug corrupts every later record in the
  * blob, so a pack→parse→extract round trip is a genuine container test,
  * not string splitting. `mapPartitions` is justified exactly as for the
  * media codecs: a byte-offset record walk cannot be a Catalyst
  * expression; everything downstream of the parse (HTML extraction,
  * dedup, analytics) is ordinary declarative Spark.
  *
  * Scale shape: one blob per row (parquet binary column) keeps archives
  * splittable at the row level and the walk memory bounded by the largest
  * single blob; metadata columns (`n_records`) support pushdown-friendly
  * filtering before any byte is touched. */
object Warc {

  final case class WarcArchive(batch_id: Long, n_records: Int,
                               payload: Array[Byte])
  final case class WarcRecord(batch_id: Long, uri: String, html: String)

  /** Pack (batchCol, uriCol, htmlCol) rows into one WARC-style blob per
    * batch. Records sort by URI inside a batch so blobs are deterministic
    * under any partitioning. */
  def pack(records: DataFrame, batchCol: String, uriCol: String,
           htmlCol: String): Dataset[WarcArchive] = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .groupBy(col(batchCol).cast("long").as("batch_id"))
      .agg(sort_array(collect_list(struct(col(uriCol).as("uri"),
        col(htmlCol).as("html")))).as("recs"))
      .as[(Long, Seq[(String, String)])]
      .map { case (batch, recs) =>
        val out = new ByteArrayOutputStream()
        recs.foreach { case (uri, html) =>
          val payload = html.getBytes(UTF_8)
          val header =
            "WARC/1.0\r\n" +
              "WARC-Type: response\r\n" +
              s"WARC-Target-URI: $uri\r\n" +
              "Content-Type: text/html\r\n" +
              s"Content-Length: ${payload.length}\r\n" +
              "\r\n"
          out.write(header.getBytes(UTF_8))
          out.write(payload)
          out.write("\r\n\r\n".getBytes(UTF_8))
        }
        WarcArchive(batch, recs.length, out.toByteArray)
      }
  }

  /** Walk every record of every archive blob: header lines parse until
    * the blank line, the payload is taken by the byte-exact
    * `Content-Length`, and the record separator is validated — a
    * malformed length fails loudly instead of silently absorbing the
    * next record's header into this payload. */
  def parse(archives: Dataset[WarcArchive]): Dataset[WarcRecord] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.flatMap { a =>
      val bytes = a.payload
      val recs = scala.collection.mutable.Buffer.empty[WarcRecord]
      var pos = 0
      while (pos < bytes.length) {
        // header block: CRLF lines until the empty line
        var uri: String = null
        var len = -1
        var line = readLine(bytes, pos)
        require(line._1 == "WARC/1.0", s"bad record magic at $pos: ${line._1}")
        pos = line._2
        var done = false
        while (!done) {
          line = readLine(bytes, pos)
          pos = line._2
          val l = line._1
          if (l.isEmpty) done = true
          else {
            // header names are case-insensitive with optional whitespace
            // around the value (RFC-style field lines) — external WARC
            // producers emit e.g. `content-length:123`
            val ci = l.indexOf(':')
            if (ci > 0) {
              val name = l.substring(0, ci).trim
                .toLowerCase(java.util.Locale.ROOT)
              val value = l.substring(ci + 1).trim
              if (name == "warc-target-uri") uri = value
              else if (name == "content-length") len = value.toInt
            }
          }
        }
        require(uri != null && len >= 0, "record missing URI/Content-Length")
        require(pos + len + 4 <= bytes.length,
          s"Content-Length $len overruns the archive at $pos")
        val html = new String(bytes, pos, len, UTF_8)
        pos += len
        require(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
          bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
          s"missing record separator at $pos — Content-Length drift")
        pos += 4
        recs += WarcRecord(a.batch_id, uri, html)
      }
      recs
    }
  }

  /** One CRLF-terminated ASCII/UTF-8 line starting at `pos`; returns
    * (line-without-CRLF, position after the CRLF). */
  private def readLine(bytes: Array[Byte], pos: Int): (String, Int) = {
    var i = pos
    while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n'))
      i += 1
    require(i + 1 < bytes.length, s"unterminated header line at $pos")
    (new String(bytes, pos, i - pos, UTF_8), i + 2)
  }
}
