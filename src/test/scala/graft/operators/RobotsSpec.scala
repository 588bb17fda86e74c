package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# managed by ops
      |User-agent: alpha
      |User-agent: beta
      |Disallow: /shared
      |Crawl-delay: 5
      |User-agent: graftbot
      |Disallow: /private
      |Allow: /private/ok
      |User-agent: *
      |Disallow: /tmp
      |Sitemap: https://a.org/sitemap.xml""".stripMargin

  private lazy val rules = Robots.parseRules(
    Seq(("a.org", body)).toDF("h", "t"), col("h"), col("t"))
    .withColumnRenamed("id", "host")

  test("parseRules: consecutive UA lines share a group, UA after a rule opens one") {
    val got = rules.select("agent", "directive", "path").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("alpha", "disallow", "/shared"), ("beta", "disallow", "/shared"),
      ("graftbot", "disallow", "/private"), ("graftbot", "allow", "/private/ok"),
      ("*", "disallow", "/tmp")))
  }

  private def decide(url: String, agent: String): Boolean =
    Robots.isAllowed(Seq(url).toDF("u"), col("u"), agent, rules)
      .select("allowed").collect().head.getBoolean(0)

  test("longest prefix wins and Allow beats Disallow on the tiebreak") {
    assert(!decide("https://a.org/private/x", "graftbot"))
    assert(decide("https://a.org/private/ok/page", "graftbot"))
    assert(decide("https://a.org/open", "graftbot"))
  }

  test("an exact-agent section shadows *, it is not unioned") {
    // graftbot has its own section, so the * Disallow /tmp does NOT apply
    assert(decide("https://a.org/tmp/file", "graftbot"))
    // an agent with no section falls back to * and is blocked there
    assert(!decide("https://a.org/tmp/file", "otherbot"))
    assert(decide("https://a.org/elsewhere", "otherbot"))
  }

  test("hosts without rules admit everything; agent match is case-insensitive") {
    assert(decide("https://unknown.net/anything", "graftbot"))
    assert(!decide("https://a.org/private/x", "GraftBot"))
  }

  test("empty-path Disallow disallows nothing (the allow-all idiom)") {
    val r2 = Robots.parseRules(
      Seq(("b.io", "User-agent: *\nDisallow:")).toDF("h", "t"), col("h"), col("t"))
      .withColumnRenamed("id", "host")
    val ok = Robots.isAllowed(Seq("https://b.io/x").toDF("u"), col("u"), "bot", r2)
      .select("allowed").collect().head.getBoolean(0)
    assert(ok)
  }

  test("CRLF robots.txt parses identically to LF (no trailing-CR fail-open)") {
    val crlf = body.replace("\n", "\r\n")
    val r2 = Robots.parseRules(
      Seq(("a.org", crlf)).toDF("h", "t"), col("h"), col("t"))
      .withColumnRenamed("id", "host")
    val got = r2.select("agent", "directive", "path").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("alpha", "disallow", "/shared"), ("beta", "disallow", "/shared"),
      ("graftbot", "disallow", "/private"), ("graftbot", "allow", "/private/ok"),
      ("*", "disallow", "/tmp")))
    // and the decision is enforced, not failed-open
    val blocked = Robots.isAllowed(
      Seq("https://a.org/private/x").toDF("u"), col("u"), "graftbot", r2)
      .select("allowed").collect().head.getBoolean(0)
    assert(!blocked)
  }

  test("RFC 9309 wildcards: * spans characters, trailing $ anchors the end") {
    val wb = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /a/*/z\n" +
      "Allow: /a/ok/z\nDisallow: /lit$eral"
    val r2 = Robots.parseRules(
      Seq(("w.io", wb)).toDF("h", "t"), col("h"), col("t"))
      .withColumnRenamed("id", "host")
    def d(url: String): Boolean =
      Robots.isAllowed(Seq(url).toDF("u"), col("u"), "bot", r2)
        .select("allowed").collect().head.getBoolean(0)
    assert(!d("https://w.io/docs/file.pdf"))     // /*.pdf$ matches the end
    assert(d("https://w.io/docs/file.pdf?x=1"))  // $ anchor: query breaks it
    assert(d("https://w.io/pdf/page"))           // .pdf never occurs
    assert(!d("https://w.io/a/mid/z"))           // * spans a segment
    assert(d("https://w.io/a/ok/z"))             // longer Allow beats the * rule
    assert(!d("https://w.io/lit$eral/x"))        // mid-pattern $ is literal
    assert(d("https://w.io/lit"))                // ...and not an anchor there
  }

  test("isAllowed preserves cardinality on byte-identical duplicate rows") {
    val urls = Seq("https://a.org/private/x", "https://a.org/private/x",
      "https://a.org/open").toDF("u")
    val out = Robots.isAllowed(urls, col("u"), "graftbot", rules)
      .select("u", "allowed").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).sorted
    assert(out.toSeq == Seq(
      ("https://a.org/open", true),
      ("https://a.org/private/x", false),
      ("https://a.org/private/x", false)))
  }

  test("sitemapLocs extracts loc urls in order, trimming inner whitespace") {
    val xml = "<urlset><url><loc>https://a.org/1</loc></url>" +
      "<url><LOC> https://a.org/2 </LOC></url></urlset>"
    val got = Seq(xml).toDF("x")
      .select(Robots.sitemapLocs(col("x"))).collect().head.getSeq[String](0)
    assert(got == Seq("https://a.org/1", "https://a.org/2"))
  }
}
