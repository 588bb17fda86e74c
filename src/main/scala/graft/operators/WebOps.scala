package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain operators for web-crawl-style corpora: host extraction,
  * registrable-domain derivation, and blocklist filtering — the provenance
  * layer every Common-Crawl-derived training set runs before anything else
  * (per-domain quotas, spam-domain removal, license tracking).
  *
  * Everything here is a narrow codegen'd projection (three RE2-safe regexes,
  * one split/slice) plus, for the blocklist, one broadcast anti join — so
  * the operators are scan-speed and the blocklist never forces a shuffle of
  * the corpus. The regexes avoid backtracking-dependent constructs so the
  * DuckDB oracle can apply the byte-identical patterns.
  */
object WebOps {

  /** scheme://authority — authority runs to the first `/`, `?` or `#`. */
  val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  /** Strips a `user:pass@` prefix from an authority (keep the last `@`-part). */
  val NoUserinfoRe = "([^@]*)$"
  /** Strips a `:port` suffix from a host. A bracketed IPv6 authority
    * (`[::1]:8443`) keeps its bracketed literal whole — the colons inside
    * the brackets are address, not port. An unclosed `[` matches neither
    * alternative and routes to empty like any other unparseable URL.
    */
  val NoPortRe = "^(\\[[^\\]]*\\]|[^:\\[][^:]*)"

  /** Lower-cased host of a URL: the authority minus userinfo and port.
    * Empty string when the value does not parse as an absolute URL —
    * callers filter or route those rows rather than failing the scan.
    */
  def host(url: Column): Column = {
    val auth = regexp_extract(url, AuthorityRe, 1)
    lower(regexp_extract(regexp_extract(auth, NoUserinfoRe, 1), NoPortRe, 1))
  }

  /** Registrable-domain approximation: the last two dot-labels of the host
    * (`www.news.example.org` → `example.org`). A full public-suffix-list
    * lookup is a broadcast join against the PSL table if one is supplied;
    * the 2-label rule is the offline-safe default and what per-domain
    * quota/blocklist policies key on in practice.
    */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    when(size(labels) >= 2, array_join(slice(labels, -2, 2), ".")).otherwise(h)
  }

  /** Drops every row whose registrable domain appears in `blocked` (one
    * string column named `domain`). The blocklist is dimension-sized by
    * definition (it is a policy artifact, not data), so it broadcasts and
    * the corpus never shuffles.
    */
  def blocklistFilter(df: DataFrame, urlCol: Column, blocked: DataFrame): DataFrame = {
    val b = blocked.select(lower(col("domain")).as("__blocked_domain")).distinct()
    df.withColumn("__dom", registrableDomain(urlCol))
      .join(broadcast(b), col("__dom") === col("__blocked_domain"), "left_anti")
      .drop("__dom")
  }

  /** Per-domain corpus profile: document count and char-volume share —
    * the first report a crawl-derived dataset publishes, and the input to
    * domain-quota sampling ([[Sampling.perGroup]] keyed on the domain).
    * One partial-aggregated groupBy on the domain; nothing else.
    */
  def domainStats(df: DataFrame, urlCol: Column, sizeCol: Column): DataFrame =
    df.groupBy(registrableDomain(urlCol).as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(sizeCol.cast("bigint")).as("total_chars"))
}
