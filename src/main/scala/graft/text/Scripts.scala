package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode SCRIPT census — the orthography-level sibling of lang-id
  * (q29): script ≠ language (Serbian writes in two scripts, code is
  * Latin regardless of its comments' language), and crawl pipelines
  * gate on script share before any language model runs (a "Latin
  * 0.98" doc claiming lang=zh is mislabeled; mixed-script docs are
  * the mojibake/spam signal q133 repairs or q212 drops).
  *
  * Counting: per doc, chars-in-class via the
  * length(x) − length(regexp_replace(x, class, '')) identity — four
  * codegen'd projections, no tokenization, no explode. The class
  * sets are Unicode Script properties; Spark (Java regex) spells
  * them \p{IsLatin}, DuckDB (RE2) \p{Latin} — same property, both
  * sides state the same semantics in their own syntax (the oracle
  * restates semantics, not text).
  *
  * Exactness: all counts are integers; shares are single divisions
  * rounded 9 dp over the per-group integer sums.
  */
object Scripts {

  /** (name, Java regex class, RE2 regex class) — shared taxonomy. */
  val Classes: Seq[(String, String, String)] = Seq(
    ("latin", "\\p{IsLatin}", "\\p{Latin}"),
    ("han", "\\p{IsHan}", "\\p{Han}"),
    ("cyrillic", "\\p{IsCyrillic}", "\\p{Cyrillic}"),
    ("digit", "[0-9]", "[0-9]"))

  private def classCount(text: Column, javaClass: String): Column =
    length(text) - length(regexp_replace(text, javaClass, ""))

  /** Per-stratum script share census over `textCol`. Returns one row
    * per stratum: n_docs, n_chars, share_<class>... */
  def census(df: DataFrame, stratumCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    val aggs = count(lit(1)).as("n_docs") +:
      sum(length(t)).as("n_chars") +:
      Classes.map { case (name, jc, _) =>
        sum(classCount(t, jc)).as(s"n_$name")
      }
    val base = df.groupBy(col(stratumCol)).agg(aggs.head, aggs.tail: _*)
    base.select(col(stratumCol) +: col("n_docs") +: col("n_chars") +:
      Classes.map { case (name, _, _) =>
        when(col("n_chars") > 0,
          round(col(s"n_$name").cast("double") /
            col("n_chars").cast("double"), 9)).as(s"share_$name")
      }: _*)
  }

  /** DuckDB restatement over `rel(g, text)`; ends in
    * `script_out(g, n_docs, n_chars, share_latin, share_han,
    * share_cyrillic, share_digit)`. */
  def censusSql(rel: String): String = {
    val sums = Classes.map { case (name, _, re2) =>
      s"CAST(sum(length(text) - length(regexp_replace(text," +
        s" '$re2', '', 'g'))) AS BIGINT) AS n_$name"
    }.mkString(",\n    ")
    val shares = Classes.map { case (name, _, _) =>
      s"""CASE WHEN n_chars > 0 THEN round(CAST(n_$name AS DOUBLE)
         |      / CAST(n_chars AS DOUBLE), 9) END AS share_$name"""
        .stripMargin
    }.mkString(",\n    ")
    s"""script_sums AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
       |    $sums
       |  FROM $rel GROUP BY g
       |), script_out AS (
       |  SELECT g, n_docs, n_chars,
       |    $shares
       |  FROM script_sums
       |)""".stripMargin
  }
}
