package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt honoring — crawl step -1, before even the domain
  * blocklist: a compliant crawler applies the `User-agent: *` group's
  * rules under RFC 9309 matching. The implemented surface:
  *
  *  - `Disallow:` AND `Allow:` rules, with the RFC 9309 / Google
  *    election: the rule with the LONGEST pattern (octets of the raw
  *    value) wins; on a length tie Allow beats Disallow; no matching
  *    rule means allowed. (`Disallow: /` + `Allow: /public` therefore
  *    blocks everything except `/public...` — the shape real crawls
  *    hit daily.)
  *  - `*` in a pattern matches any character sequence; a TRAILING
  *    `$` anchors the match at the path's end (interior `$` is
  *    literal, per the RFC's grammar). Patterns without `$` are
  *    prefix-anchored as before.
  *  - group selection honors a CONFIGURED crawler name (RFC 9309
  *    §2.2.1 most-specific election): if any group on the domain
  *    names the crawler's product token (case-insensitive exact
  *    match), the crawler obeys the union of THOSE groups and
  *    ignores `*` groups entirely; only a domain with no matching
  *    named group falls back to its `User-agent: *` groups. With no
  *    configured name (the default) only `*` groups apply, as
  *    before. CONSECUTIVE `User-agent` lines share the rule group
  *    that follows them (the RFC 9309 group grammar: `User-agent: a`
  *    + `User-agent: *` + rules binds the rules to BOTH agents),
  *    with comment/blank lines insignificant inside a UA run and any
  *    rule line ending it;
  *  - an EMPTY `Disallow:`/`Allow:` value carries no rule; field
  *    names match case-insensitively, values are trimmed, `#`
  *    comment lines and blank lines are ignored.
  *
  * Parse shape: robots bodies live in a DOMAINS-sized table (orders
  * of magnitude smaller than the page corpus), so the
  * explode-lines → running-count group id → group-agent window pass
  * shuffles only that small table. Enforcement against the CORPUS
  * never shuffles a corpus row: the per-domain rule set collapses to
  * ONE array row per domain (domains-sized groupBy), broadcast-joins
  * to the URLs 1:1, and the longest-match election runs INSIDE a
  * projection as a higher-order filter+fold over that array — no
  * per-URL groupBy, no corpus exchange. The DuckDB oracle restates
  * the identical parse and election (join + window argmax — the
  * oracle needn't be shuffle-free, only equivalent).
  */
object Robots {

  /** Rules of the group(s) the crawler must obey: (domain, rule,
    * allow). With `agent = None`, the `User-agent: *` groups; with
    * `agent = Some(name)`, the RFC 9309 most-specific election —
    * per DOMAIN, groups naming `name` (case-insensitive) if any
    * exist, else the `*` groups. Domains with no applicable rules
    * (or no robots.txt row at all) simply produce no rows — absent
    * means allowed.
    */
  def rules(robots: DataFrame, domainCol: String, bodyCol: String,
      agent: Option[String] = None): DataFrame = {
    val lines = robots
      .select(col(domainCol).as("domain"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("idx", "raw")))
      .withColumn("line", trim(col("raw")))
      // comments/blanks are insignificant everywhere (incl. inside a
      // UA run) — drop them before group structure is derived
      .filter(col("line") =!= "" && !col("line").startsWith("#"))
    val classified = lines
      .withColumn("is_ua", lower(col("line")).startsWith("user-agent:"))
      .withColumn("is_dis", lower(col("line")).startsWith("disallow:"))
      .withColumn("is_al", lower(col("line")).startsWith("allow:"))
      .withColumn("agent", trim(expr("substring(line, 12)")))
      .withColumn("rule",
        when(col("is_dis"), trim(expr("substring(line, 10)")))
          .when(col("is_al"), trim(expr("substring(line, 7)"))))
    // group id increments at the START of each UA run (a UA line
    // whose previous retained line is not UA) — consecutive UA lines
    // then share one group, per the RFC grammar; any other line
    // (rules, unknown fields like Crawl-delay) ends the run
    val byIdx = Window.partitionBy("domain").orderBy("idx")
    val prevUa = lag(col("is_ua"), 1, false).over(byIdx)
    val g = sum(when(col("is_ua") && !prevUa, 1).otherwise(0)).over(byIdx)
    val withGroup = classified.withColumn("g", g)
    // the group applies to '*' if ANY of its UA lines names '*', and
    // to the configured crawler if any names its product token
    val byGroup = Window.partitionBy("domain", "g")
    val starGroup = max(when(col("is_ua") && col("agent") === "*", 1)
      .otherwise(0)).over(byGroup)
    val flagged = withGroup.withColumn("star", starGroup)
    val applicable = agent match {
      case None => flagged.filter(col("star") === 1)
      case Some(name) =>
        val nameLc = name.toLowerCase(java.util.Locale.ROOT)
        val named = max(when(col("is_ua") &&
          lower(col("agent")) === nameLc, 1).otherwise(0)).over(byGroup)
        // most-specific election is PER DOMAIN: any named group on
        // the domain suppresses every '*' group there — the windows
        // stay on the domains-sized table, never the corpus
        val f2 = flagged.withColumn("named", named)
        val domNamed = max(col("named")).over(Window.partitionBy("domain"))
        f2.withColumn("dom_named", domNamed)
          .filter(when(col("dom_named") === 1, col("named") === 1)
            .otherwise(col("star") === 1))
      }
    applicable
      .filter((col("is_dis") || col("is_al")) && col("rule") =!= "")
      .select(col("domain"), col("rule"), col("is_al").as("allow"))
  }

  /** URL path for matching (empty path → "/"). */
  def path(url: Column): Column = {
    val raw = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    when(raw === "", lit("/")).otherwise(raw)
  }

  /** RFC 9309 pattern → anchored regex: strip a trailing `$` (end
    * anchor), escape regex metacharacters in the remainder (interior
    * `$` becomes literal), widen `*` to `.*`, prefix-anchor with
    * `^`. The DuckDB oracle restates this exact chain.
    */
  def patternToRegex(rule: Column): Column = {
    val anchored = rule.endsWith("$")
    val core = when(anchored, rule.substr(lit(1), length(rule) - 1))
      .otherwise(rule)
    val escaped = regexp_replace(core,
      "([\\\\.\\[\\]{}()+\\-?^$|])", "\\\\$1")
    concat(lit("^"), regexp_replace(escaped, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Corpus minus robots-disallowed URLs under the longest-match
    * election. `ruleRows` is the [[rules]] output; it collapses to
    * one broadcast array row per domain, and the election runs in a
    * projection — zero corpus shuffles.
    */
  def filterAllowed(urls: DataFrame, urlCol: String,
      ruleRows: DataFrame): DataFrame =
    urls
      .withColumn("__dom", Urls.domain(col(urlCol)))
      .withColumn("__path", path(col(urlCol)))
      .transform(filterAllowedPaths(_, "__dom", "__path", ruleRows))
      .drop("__dom", "__path")

  /** The same election over ALREADY-SPLIT (domain, path) columns —
    * the frontier shape (q140), where URLs were resolved upstream.
    */
  def filterAllowedPaths(df: DataFrame, domCol: String, pathCol: String,
      ruleRows: DataFrame): DataFrame = {
    val perDomain = ruleRows
      .select(col("domain").as("__rbdom"),
        struct(patternToRegex(col("rule")).as("re"),
          length(col("rule")).as("prio"), col("allow")).as("r"))
      .groupBy("__rbdom").agg(collect_list(col("r")).as("__rs"))
    // matched rules via HOF filter (regexp per array element inside
    // codegen'd projection), then the longest-match fold: start from
    // the virtual "no rule matched" verdict (prio -1, allow) and take
    // a rule when strictly longer, or equal-length-and-Allow (the
    // RFC tie-break). Fold order over the array is irrelevant: the
    // (max prio, Allow-on-tie) verdict is order-independent.
    val matched = filter(coalesce(col("__rs"),
        array().cast("array<struct<re:string,prio:int,allow:boolean>>")),
      r => regexp_like(col(pathCol), r.getField("re")))
    val verdict = aggregate(matched,
      named_struct(lit("prio"), lit(-1), lit("allow"), lit(true)),
      (acc, r) => when(
        r.getField("prio") > acc.getField("prio") ||
          (r.getField("prio") === acc.getField("prio") &&
            r.getField("allow")),
        named_struct(lit("prio"), r.getField("prio"),
          lit("allow"), r.getField("allow"))).otherwise(acc))
    df.join(broadcast(perDomain), col(domCol) === col("__rbdom"), "left")
      .filter(verdict.getField("allow"))
      .drop("__rbdom", "__rs")
  }

  /** DuckDB text of [[patternToRegex]] over a column named `rule`.
    * Deliberately margin-pipe-free: callers interpolate this into
    * stripMargin'd oracle strings, and a leading `|` here would be
    * eaten by the OUTER stripMargin.
    */
  val PatternToRegexSql: String =
    """'^' || regexp_replace(regexp_replace(
    CASE WHEN rule LIKE '%$' THEN substr(rule, 1, length(rule) - 1)
         ELSE rule END,
    '([\\\.\[\]\{\}\(\)\+\-\?\^\$\|])', '\\\0', 'g'),
  '\*', '.*', 'g') || CASE WHEN rule LIKE '%$' THEN '$' ELSE '' END"""
}
