package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical URL-path rollup (web analytics' "traffic by
  * section" tree, and the crawl-side view of where a site's pages
  * concentrate): every URL contributes one count to EACH prefix of
  * its path — /a/b/c counts under /a, /a/b, and /a/b/c — so one
  * aggregation yields the whole drill-down tree with per-level
  * subtotals.
  *
  * Scale shape: the explode is bounded by `maxDepth` (a URL path is
  * a handful of segments; deeper tails truncate), then ONE
  * partial-aggregatable count on (depth, prefix) — prefix strings
  * shuffle, but the distinct-prefix space is site-structure-sized,
  * not corpus-sized. Query strings and fragments never enter the
  * path; empty paths ("/" or none) contribute nothing.
  */
object PathRollup {

  /** Path segments of a URL column, lowercased, query/fragment
    * stripped.
    */
  private[graft] def segments(url: Column): Column =
    filter(split(regexp_extract(lower(url),
      "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/"), s => s =!= "")

  /** @return (depth, prefix, n_urls) — one row per tree node. */
  def rollup(df: DataFrame, urlCol: String, maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val s = col("s")
    // guard: Spark's sequence(1, 0) would step BACKWARD, so rootless
    // URLs are filtered before the prefix expansion
    df.select(segments(col(urlCol)).as("s"))
      .filter(size(s) >= 1)
      .select(explode(transform(
        sequence(lit(1), least(size(s), lit(maxDepth))),
        i => struct(i.as("depth"),
          concat(lit("/"), array_join(slice(s, lit(1), i), "/"))
            .as("prefix"))))
        .as("p"))
      .select(col("p.depth"), col("p.prefix"))
      .groupBy("depth", "prefix")
      .agg(count(lit(1)).as("n_urls"))
  }
}
