package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass a web-crawl corpus
  * applies BEFORE URL-level dedup: the same page arrives as
  * `HTTPS://WWW.Site.COM:443/a?utm_source=feed&id=7#top` and
  * `https://site.com/a?id=7`, and naive string dedup keeps both.
  * Reference behavior covered: datanika's dedup family extended with
  * the URL-keyed variant (C4 / CommonCrawl pipelines dedup by
  * canonical URL before content dedup).
  *
  * Rules (the conservative, information-preserving subset):
  * scheme+host lowercase; leading `www.` stripped; default ports
  * (http:80, https:443) dropped; empty path → `/`; fragment dropped;
  * tracking params (`utm_*`, `ref`, `fbclid`, `gclid`) removed,
  * other params kept in order.
  *
  * Everything is built from codegen'd string/regexp expressions and
  * one higher-order filter over the split query — a pure per-row
  * scan-level projection (zero shuffles), and every step is
  * restatable in ANSI-ish SQL so the oracle can verify the WHOLE
  * pipeline cross-engine.
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)"
  private val PortRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*?:([0-9]+)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host with any leading `www.` stripped. */
  def domain(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostRe, 1)), "^www\\.", "")

  /** Tracking-parameter predicate (true = drop). NOTE: not LIKE
    * 'utm_%' — SQL `_` is a single-char wildcard, which would also
    * drop legitimate params like `utmost=`; compare the literal
    * 4-char prefix instead.
    */
  private def isTracking(p: Column): Column =
    (substring(p, 1, 4) === "utm_") || p.like("ref=%") ||
      p.like("fbclid=%") || p.like("gclid=%") || (p === "")

  /** Every dot-boundary suffix of a host, most-specific first:
    * `a.b.example.com` → `[a.b.example.com, b.example.com,
    * example.com, com]`. Bounded by the label count (hosts have ≤ a
    * handful), so the generated array is metadata-sized per row.
    */
  def domainSuffixes(domain: Column): Column = {
    val labels = split(domain, "\\.")
    transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels) - i), "."))
  }

  /** Domain-blocklist predicate (true = blocked) — step 0 of every
    * crawl pipeline (C4 drops pages on a "bad domains" list before
    * any content filter). An entry blocks the domain itself AND all
    * subdomains (`ads.example.com` blocks `tracker.ads.example.com`),
    * but ONLY at dot boundaries (`notads.example.com` is clean) —
    * hence suffix-set membership, not substring/endsWith matching.
    *
    * The blocklist folds into the plan as a literal array, so the
    * check is a pure codegen'd scan predicate: zero shuffles, zero
    * joins, pushdown-eligible. Right shape for config-sized lists
    * (≤ ~10⁴ entries); for multi-million-entry feeds use
    * `filterBlocked`, which trades the per-row linear scan for a
    * broadcast hash probe at domain granularity.
    */
  def blockedBy(domain: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "empty blocklist")
    exists(domainSuffixes(domain), s => s.isin(blocklist: _*))
  }

  /** The large-list variant of `blockedBy`: same dot-boundary
    * semantics, for blocklists too big to fold into a literal (the
    * multi-million-entry adult/malware feeds). Returns `df` minus
    * blocked rows.
    *
    * Shape: resolve matching at DOMAIN granularity, not row
    * granularity — distinct domains (one exchange of short strings;
    * cardinality « rows at 100 TB, where a domain repeats across
    * many pages) → explode suffixes → map-side left_semi against
    * the BROADCAST list → the concrete blocked-domain set, which is
    * ≤ the corpus' distinct domains ∩ list and broadcasts back for
    * a map-side left_anti. No row of `df` ever shuffles, and no
    * nested-loop join appears (spec-pinned).
    */
  def filterBlocked(df: org.apache.spark.sql.DataFrame, domainCol: String,
      blocklist: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    require(blocklist.columns.length == 1,
      s"blocklist must be a single domain column, got ${blocklist.columns.mkString(",")}")
    val blCol = blocklist.columns.head
    val blocked = df.select(col(domainCol).as("_dom")).distinct()
      .select(col("_dom"), explode(domainSuffixes(col("_dom"))).as("_sfx"))
      .join(broadcast(blocklist.select(col(blCol).as("_sfx"))),
        Seq("_sfx"), "left_semi")
      .select("_dom").distinct()
    // a NULL domain row is dropped, matching the predicate path:
    // df.filter(!blockedBy(domain, list)) evaluates NULL → filtered
    df.filter(col(domainCol).isNotNull)
      .join(broadcast(blocked), df(domainCol) === blocked("_dom"), "left_anti")
  }

  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val host = domain(url)
    val port = regexp_extract(url, PortRe, 1)
    val rawPath = regexp_extract(url, PathRe, 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val kept = filter(split(regexp_extract(url, QueryRe, 1), "&"),
      p => !isTracking(p))
    val portPart = when(port === "" ||
      (sch === "https" && port === "443") ||
      (sch === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    concat(sch, lit("://"), host, portPart, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }
}
