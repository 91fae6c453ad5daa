package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("every raw spelling of the same resource canonicalizes identically") {
    val forms = Seq(
      "HTTP://WWW.Example.COM:80/a/b/?b=2&a=1#frag",
      "http://example.com/a/b?a=1&b=2",
      "http://www.example.com/a/b/?utm_source=x&a=1&gclid=99&b=2",
      "Http://Example.Com:80/a/b/?b=2&ref=tw&a=1#other")
    assert(canon(forms: _*).toSet === Set("http://example.com/a/b?a=1&b=2"))
  }

  test("scheme-aware default ports: :80 strips for http only, :443 for " +
      "https only; other ports survive") {
    assert(canon("https://h.com:443/x") === Seq("https://h.com/x"))
    assert(canon("https://h.com:80/x") === Seq("https://h.com:80/x"))
    assert(canon("http://h.com:8080/x") === Seq("http://h.com:8080/x"))
  }

  test("path case preserved, empty path normalizes to /, all params " +
      "tracking => no query part") {
    assert(canon("HTTP://H.com/CaseSensitive/Path") ===
      Seq("http://h.com/CaseSensitive/Path"))
    assert(canon("http://h.com?utm_campaign=x&fbclid=1") ===
      Seq("http://h.com/"))
    assert(canon("http://h.com") === Seq("http://h.com/"))
  }

  test("tracking filter matches param NAMES only — ?refresh=1 is kept, " +
      "?ref=1 and bare ?ref are dropped") {
    assert(canon("http://h.com/x?refresh=1") ===
      Seq("http://h.com/x?refresh=1"))
    assert(canon("http://h.com/x?ref") === Seq("http://h.com/x"))
    assert(canon("http://h.com/x?ref=1&q=2") === Seq("http://h.com/x?q=2"))
  }

  test("domainReport counts re-crawl twins and cap overshoot per host") {
    val urls = Seq(
      "http://a.com/p?utm_source=1", "http://WWW.A.com:80/p/#x",
      "http://a.com/q", "https://b.com/only")
      .toDF("url")
    val got = Urls.domainReport(urls, "url", cap = 2).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a.com") === ((3L, 2L, 1L, 1L))) // 2 spellings of /p collapse
    assert(got("b.com") === ((1L, 1L, 0L, 0L)))
  }

  test("linkGraph: relative links drop, targets canonicalize before " +
      "host/dedup counting") {
    val links = Seq(
      ("a.com", "HTTP://WWW.B.com:80/x?utm_s=1"),
      ("a.com", "http://b.com/x"),          // same canonical as above
      ("a.com", "http://b.com/y"),
      ("a.com", "/relative"),               // dropped
      ("a.com", "mailto:x@y.z"),            // dropped
      ("c.com", "https://b.com/z"))
      .toDF("src_host", "url")
    val got = Urls.linkGraph(links, "src_host", "url").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      ("a.com", "b.com") -> ((3L, 2L)),
      ("c.com", "b.com") -> ((1L, 1L))))
  }

  test("outlinks harvests double-quoted hrefs in order, skipping empties") {
    val out = Seq("""<a href="/a">x</a><a href="">e</a><A HREF="/b">y</A>""")
      .toDF("h").select(graft.functions.Html.outlinks(col("h")).as("u"))
      .collect()(0).getSeq[String](0)
    assert(out === Seq("/a", "/b"))
  }

  test("canonicalize plan is pure expressions — no UDF") {
    val df = Seq("http://h.com/x").toDF("u")
      .select(Urls.canonicalize(col("u")))
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("scalaudf"))
  }
}
