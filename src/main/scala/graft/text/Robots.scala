package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt honoring — crawl step -1, before even the domain
  * blocklist: a compliant crawler drops URLs matching the
  * `User-agent: *` group's `Disallow` prefixes. The implemented
  * subset (documented contract, same as C4-class pipelines):
  *
  *  - only the `User-agent: *` group applies (a per-crawler UA match
  *    is a config knob away — the parse already keys groups);
  *  - a group starts at each `User-agent:` line (the
  *    multiple-consecutive-UA-lines-share-a-group nicety of the full
  *    RFC 9309 grammar is out of scope);
  *  - `Disallow: <prefix>` blocks any path with that literal prefix;
  *    an EMPTY `Disallow:` disallows nothing (per the original
  *    spec); `Allow:` precedence and `*`/`$` wildcards are out of
  *    scope;
  *  - field names match case-insensitively, values are trimmed,
  *    `#` comment lines and blank lines are ignored.
  *
  * Parse shape: robots bodies live in a DOMAINS-sized table (orders
  * of magnitude smaller than the page corpus), so the
  * explode-lines → running-count group id → group-agent window pass
  * shuffles only that small table. Enforcement against the CORPUS is
  * one broadcast LEFT ANTI join on (domain, path-prefix) — no corpus
  * row ever shuffles. Every construct (posexplode = UNNEST WITH
  * ORDINALITY, running SUM window, starts_with join) is portable,
  * so the DuckDB oracle restates the identical pipeline.
  */
object Robots {

  /** `Disallow` rules of the `User-agent: *` group: (domain, rule).
    * Domains with no rules (or no robots.txt row at all) simply
    * produce no rows — absent means allowed.
    */
  def rules(robots: DataFrame, domainCol: String, bodyCol: String): DataFrame = {
    val lines = robots
      .select(col(domainCol).as("domain"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("idx", "raw")))
      .withColumn("line", trim(col("raw")))
    val classified = lines
      .withColumn("is_ua", lower(col("line")).startsWith("user-agent:"))
      .withColumn("is_dis", lower(col("line")).startsWith("disallow:"))
      .withColumn("agent", trim(expr("substring(line, 12)")))
      .withColumn("rule", trim(expr("substring(line, 10)")))
    // group id = running count of User-agent lines; the group's
    // agent is the (single) UA line's value within that group
    val g = sum(when(col("is_ua"), 1).otherwise(0))
      .over(Window.partitionBy("domain").orderBy("idx"))
    val withGroup = classified.withColumn("g", g)
    val agentOfGroup = max(when(col("is_ua"), col("agent")))
      .over(Window.partitionBy("domain", "g"))
    withGroup.withColumn("group_agent", agentOfGroup)
      .filter(col("is_dis") && col("group_agent") === "*" && col("rule") =!= "")
      .select("domain", "rule")
  }

  /** URL path for prefix matching (empty path → "/"). */
  def path(url: Column): Column = {
    val raw = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    when(raw === "", lit("/")).otherwise(raw)
  }

  /** Corpus minus robots-disallowed URLs: one broadcast anti join,
    * zero corpus shuffles. `disallow` is the `rules` output.
    */
  def filterAllowed(urls: DataFrame, urlCol: String,
      disallow: DataFrame): DataFrame = {
    val u = urls
      .withColumn("__dom", Urls.domain(col(urlCol)))
      .withColumn("__path", path(col(urlCol)))
    u.join(broadcast(disallow),
        u("__dom") === disallow("domain") &&
          u("__path").startsWith(disallow("rule")),
        "left_anti")
      .drop("__dom", "__path")
  }
}
