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

  test("sitemapLocs extracts loc urls in order, trimming inner whitespace") {
    val xml = "<urlset><url><loc>https://a.org/1</loc></url>" +
      "<url><LOC> https://a.org/2 </LOC></url></urlset>"
    val got = Seq(xml).toDF("x")
      .select(Robots.sitemapLocs(col("x"))).collect().head.getSeq[String](0)
    assert(got == Seq("https://a.org/1", "https://a.org/2"))
  }
}
