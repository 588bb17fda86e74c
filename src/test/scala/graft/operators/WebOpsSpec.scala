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

  private def canonOf(url: String): String = {
    val r = Seq(url).toDF("u").select(WebOps.canonicalizeUrl(col("u"))).collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("canonicalizeUrl: golden forms for every rule") {
    // scheme/host case, www, userinfo, default port, fragment, root path
    assert(canonOf("HTTPS://u:p@WWW.Example.ORG:443/#frag") == "https://example.org")
    // non-default port survives
    assert(canonOf("https://example.org:8443/p/1") == "https://example.org:8443/p/1")
    // http default port drops; https:80 is NOT default and survives
    assert(canonOf("http://example.org:80/x") == "http://example.org/x")
    assert(canonOf("https://example.org:80/x") == "https://example.org:80/x")
    // tracking params: leading (query mark repaired), middle, and only-param
    assert(canonOf("https://a.io/p?utm_source=x&id=3") == "https://a.io/p?id=3")
    assert(canonOf("https://a.io/p?id=3&utm_campaign=y&b=2") == "https://a.io/p?id=3&b=2")
    assert(canonOf("https://a.io/p?utm_medium=z") == "https://a.io/p")
    assert(canonOf("https://a.io/p?gclid=abc&fbclid=d&ref=rss") == "https://a.io/p")
    // non-tracking query and path are byte-preserved (no case folding there)
    assert(canonOf("https://a.io/P/Q?Id=3") == "https://a.io/P/Q?Id=3")
    // a literal '&' in the PATH is legal and must survive untouched, even
    // when the query is stripped to nothing around it
    assert(canonOf("https://a.io/a&b?utm_source=x") == "https://a.io/a&b")
    assert(canonOf("https://a.io/a&b") == "https://a.io/a&b")
    // root path with a surviving query keeps its '/'
    assert(canonOf("https://a.io/?id=3&utm_source=x") == "https://a.io/?id=3")
    // root path is the host itself; deeper trailing slashes are preserved
    assert(canonOf("https://a.io/") == "https://a.io")
    assert(canonOf("https://a.io/p/") == "https://a.io/p/")
    // unparseable routes to null, never a half-canonical string
    assert(canonOf("not a url") == null)
    assert(canonOf("relative/only") == null)
  }

  test("canonicalizeUrl is idempotent on its own output") {
    val urls = Seq(
      "HTTPS://u:p@WWW.Example.ORG:443/a/b?utm_source=x&id=1#f",
      "http://News.Site.io:80/?utm_medium=z",
      "https://a.io:8443/p/?id=2&utm_campaign=c")
    for (u <- urls) {
      val once = canonOf(u)
      assert(canonOf(once) == once, s"not idempotent on $u -> $once")
    }
  }

  test("dedupByCanonicalUrl: min-id survivor per canonical form, nulls survive") {
    val docs = Seq(
      (5L, "https://www.a.io/p?utm_source=x"),
      (2L, "HTTPS://A.IO:443/p"),
      (7L, "https://a.io/p"),
      (3L, "https://b.io/q"),
      (9L, "garbage")).toDF("id", "url")
    val got = WebOps.dedupByCanonicalUrl(docs, col("url"), col("id"))
      .select("id", "canonical_url", "url_survivor").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getBoolean(2))).toMap
    // ids 5, 2, 7 all canonicalize to https://a.io/p — min id 2 survives
    assert(got(2L) == (Some("https://a.io/p"), true))
    assert(got(5L) == (Some("https://a.io/p"), false))
    assert(got(7L) == (Some("https://a.io/p"), false))
    assert(got(3L) == (Some("https://b.io/q"), true))
    assert(got(9L) == (None, true)) // unparseable: own survivor, caller's call
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

  test("politenessRounds: no round exceeds perRound per domain; priority then id order") {
    val urls = Seq(
      (1L, "https://a.org/1", 5L), (2L, "https://a.org/2", 9L),
      (3L, "https://a.org/3", 9L), (4L, "https://a.org/4", 1L),
      (5L, "https://www.a.org/5", 7L), // www. folds into a.org
      (6L, "https://b.net/1", 3L)).toDF("id", "url", "prio")
    val got = WebOps.politenessRounds(urls, col("url"), col("prio"), col("id"), perRound = 2)
      .select("id", "domain", "fetch_round").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // a.org by (prio desc, id): 2(9), 3(9) -> round 0; 5(7), 1(5) -> round 1; 4(1) -> round 2
    assert(got(2L) == ("a.org", 0L) && got(3L) == ("a.org", 0L))
    assert(got(5L) == ("a.org", 1L) && got(1L) == ("a.org", 1L))
    assert(got(4L) == ("a.org", 2L))
    assert(got(6L) == ("b.net", 0L))
    // invariant over a bigger frontier: every (domain, round) holds <= perRound urls
    val big = (1L to 2000L).map(i => (i, s"https://d${i % 13}.org/p$i", i % 11)).toDF("id", "url", "prio")
    val worst = WebOps.politenessRounds(big, col("url"), col("prio"), col("id"), perRound = 3)
      .groupBy("domain", "fetch_round").count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(worst <= 3L)
  }

  test("extractLinks handles both quote styles, any case, and skips fragment-only") {
    val html =
      """<a href="https://a.org/x">1</a> text
        |<A HREF='http://b.net:8080/y?q=1'>2</A>
        |<a class="z" href = "https://c.io/p#frag">3</a>
        |<a href="#top">skip</a><a href="">skip</a>""".stripMargin
    val got = Seq((1L, html)).toDF("id", "h")
    val edges = WebOps.linkEdges(got, col("id"), col("h")).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    // note: #frag is cut by the non-#-class capture, not by URL parsing
    assert(edges.toSeq == Seq(
      (0L, "https://a.org/x", "a.org"),
      (1L, "http://b.net:8080/y?q=1", "b.net"),
      (2L, "https://c.io/p", "c.io")))
  }

  test("httpBodyText strips the HTTP head column-level, identical to WarcSource.httpBody") {
    val withHead = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<a href=\"https://x.org/\">x</a>"
    val bare = "no head here"
    val got = Seq(withHead, bare).map(_.getBytes("UTF-8")).toDF("p")
      .select(WebOps.httpBodyText(col("p"))).collect().map(_.getString(0))
    assert(got(0) == "<a href=\"https://x.org/\">x</a>")
    assert(got(1) == bare)
    // parity with the byte-level parser helper
    assert(got(0) == new String(
      graft.sources.WarcSource.httpBody(withHead.getBytes("UTF-8")), "UTF-8"))
  }

  test("linkAnchors pairs each href with its text; incomplete anchors drop") {
    val html =
      """<a href="https://a.org/x">Alpha Site</a>
        |<A class=q HREF='http://b.net/y'>beta</A>
        |<a href="https://c.io/z"><img src="i.png"></a>
        |<a href="#f">frag</a>""".stripMargin
    val got = WebOps.linkAnchors(Seq((9L, html)).toDF("id", "h"), col("id"), col("h"))
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    // the img-wrapped anchor has '<' inside its text -> pattern excludes it
    // (anchor TEXT corpus wants text); frag-only drops with no capture
    assert(got.toSeq == Seq((0L, "https://a.org/x", "Alpha Site"),
      (1L, "http://b.net/y", "beta")))
  }

  test("recrawlPriority: unchanged URLs score 0, changed ones score change-count x staleness") {
    val hist = Seq(
      ("u1", 100L, "h1"), ("u1", 200L, "h1"), ("u1", 300L, "h1"), // never changed
      ("u2", 100L, "a"), ("u2", 400L, "b"),                       // one change
      ("u3", 100L, "x"), ("u3", 200L, "y"), ("u3", 300L, "z"))    // two changes
      .toDF("url", "ts", "hash")
    val got = WebOps.recrawlPriority(hist, col("url"), col("ts"), col("hash"), asOfTs = 1000L)
      .orderBy(col("url")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("u1", 3L, 1L, 300L, 0L),       // (1-1) * anything = 0
      ("u2", 2L, 2L, 400L, 600L),     // (2-1) * (1000-400)
      ("u3", 3L, 3L, 300L, 1400L)))   // (3-1) * (1000-300)
  }

  test("allocateBudget: shares are integral, sum exactly to the budget, largest remainder wins ties by name") {
    val w = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("d", "wt")
    val got = WebOps.allocateBudget(w, col("d"), col("wt"), totalBudget = 10L)
      .orderBy(col("domain")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    // 10/3: floors 3,3,3; remainders equal; name tiebreak gives 'a' the extra
    assert(got.toSeq == Seq(("a", 4L), ("b", 3L), ("c", 3L)))
    // zero-weight domain gets zero; sums stay exact
    val w2 = Seq(("a", 0L), ("b", 5L), ("c", 2L)).toDF("d", "wt")
    val got2 = WebOps.allocateBudget(w2, col("d"), col("wt"), totalBudget = 7L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got2("a") == 0L && got2.values.sum == 7L)
    assert(got2("b") == 5L && got2("c") == 2L)
    // all-zero weights allocate nothing (no division by the zero total)
    val w3 = Seq(("a", 0L)).toDF("d", "wt")
    assert(WebOps.allocateBudget(w3, col("d"), col("wt"), 5L).count() == 0)
    // budget 0: everyone gets 0
    val z = WebOps.allocateBudget(w, col("d"), col("wt"), 0L)
      .collect().map(_.getLong(2)).sum
    assert(z == 0L)
  }

  test("linkEdges order is document order and per-doc positions restart") {
    val docs = Seq(
      (1L, """<a href="https://one.org/a">x</a><a href="https://two.org/b">y</a>"""),
      (2L, """<a href="https://three.org/c">z</a>""")).toDF("id", "h")
    val got = WebOps.linkEdges(docs, col("id"), col("h"))
      .orderBy(col("id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(got.toSeq == Seq((1L, 0L, "one.org"), (1L, 1L, "two.org"), (2L, 0L, "three.org")))
  }
}
