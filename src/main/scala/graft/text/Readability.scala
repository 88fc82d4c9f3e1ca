package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flesch readability scoring — the classic "how hard is this prose"
  * corpus-quality signal next to [[TextAnalysis.qualityScore]]'s
  * composite (C4-style pipelines filter on exactly these surface
  * statistics: FineWeb-Edu's readability prior, textstat's default
  * metrics). Flesch (1948) reading ease and the Kincaid (1975) grade
  * reformulation:
  *
  *   ease  = 206.835 − 1.015·(W/S) − 84.6·(SY/W)
  *   grade = 0.39·(W/S) + 11.8·(SY/W) − 15.59
  *
  * Counting is regex-only and RE2-portable (the [[HtmlExtract]]
  * discipline, so a SQL oracle runs the IDENTICAL patterns):
  * words = alphanumeric runs, sentences = [.!?]+ runs floored at 1,
  * syllables = vowel-group runs ([aeiouy]+) — the standard
  * dictionary-free proxy (consonant-only tokens contribute 0;
  * documented, not hidden). All three are exact integers; the scores
  * are fixed double chains over them, engine-stable to the printed
  * digits. Zero-word documents report null scores.
  *
  * 100 TB shape: a pure per-row codegen'd projection — no shuffle,
  * no state, no UDF. Filters on the output push down like any
  * column predicate.
  */
object Readability {

  def wordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)))
      .cast("long")

  /** [.!?]+ runs, floored at 1 — unpunctuated text is one sentence. */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0)))
      .cast("long"), lit(1L))

  def syllableCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("long")

  /** @return (idCol, n_words, n_sentences, n_syllables, reading_ease,
    *         fk_grade) per row.
    */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val w = wordCount(t)
    val s = sentenceCount(t)
    val sy = syllableCount(t)
    val wps = col("n_words").cast("double") / col("n_sentences")
      .cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words")
      .cast("double")
    df.select(col(idCol), w.as("n_words"), s.as("n_sentences"),
        sy.as("n_syllables"))
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        when(col("n_words") > 0, round(
          lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6))
          .as("reading_ease"),
        when(col("n_words") > 0, round(
          lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6))
          .as("fk_grade"))
  }

  /** The identical counts/chains as SQL snippets over `textExpr`. */
  def wordsSql(textExpr: String): String =
    s"len(regexp_extract_all(lower($textExpr), '[a-z0-9]+'))"
  def sentencesSql(textExpr: String): String =
    s"greatest(len(regexp_extract_all($textExpr, '[.!?]+')), 1)"
  def syllablesSql(textExpr: String): String =
    s"len(regexp_extract_all(lower($textExpr), '[aeiouy]+'))"
}
