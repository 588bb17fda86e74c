package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebOpsSpec extends SparkSpec {
  import spark.implicits._

  private def hostOf(url: String): String =
    Seq(url).toDF("u").select(WebOps.host(col("u"))).collect().head.getString(0)

  private def domainOf(url: String): String =
    Seq(url).toDF("u").select(WebOps.registrableDomain(col("u")))
      .collect().head.getString(0)

  test("host strips scheme, userinfo, port, path, query and fragment; lower-cases") {
    assert(hostOf("https://WWW.Example.ORG/a/b?q=1#f") == "www.example.org")
    assert(hostOf("http://user:pw@news.site.co.uk:8080/x") == "news.site.co.uk")
    assert(hostOf("ftp://a@b@host.io/") == "host.io") // after the LAST @
    assert(hostOf("https://host.io:443") == "host.io")
    assert(hostOf("not a url at all") == "")
    assert(hostOf("relative/path/only") == "")
  }

  test("host keeps bracketed IPv6 literals whole; unclosed brackets route to empty") {
    assert(hostOf("https://[::1]:8080/x") == "[::1]")
    assert(hostOf("https://[2001:DB8::1]/p") == "[2001:db8::1]")
    assert(hostOf("https://u:p@[2001:db8::1]:8443/a?b#c") == "[2001:db8::1]")
    assert(hostOf("https://[::1") == "") // malformed authority, not '['
    assert(hostOf("https://:80/x") == "") // empty host, not ''+port
  }

  test("registrableDomain is the last two labels (single-label hosts pass through)") {
    assert(domainOf("https://www.news.example.org/p") == "example.org")
    assert(domainOf("https://example.org/p") == "example.org")
    assert(domainOf("http://localhost:8080/x") == "localhost")
  }

  test("blocklistFilter drops exactly the blocked registrable domains, case-insensitively") {
    val docs = Seq(
      (1L, "https://www.spam.bad.com/x"),
      (2L, "https://ok.good.io/y"),
      (3L, "https://Sub.BAD.com:9/z"),
      (4L, "https://alsofine.net/w")).toDF("id", "url")
    val blocked = Seq("Bad.COM").toDF("domain")
    val kept = WebOps.blocklistFilter(docs, col("url"), blocked)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
    // no stray helper columns escape the operator
    assert(WebOps.blocklistFilter(docs, col("url"), blocked).columns.toSeq ==
      Seq("id", "url"))
  }

  test("domainStats aggregates count and char volume per registrable domain") {
    val docs = Seq(
      (1L, "https://a.x.org/1", 10L),
      (2L, "https://b.x.org/2", 20L),
      (3L, "https://c.y.net/3", 5L)).toDF("id", "url", "n_chars")
    val got = WebOps.domainStats(docs, col("url"), col("n_chars"))
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("x.org", 2L, 30L), ("y.net", 1L, 5L)))
  }
}
