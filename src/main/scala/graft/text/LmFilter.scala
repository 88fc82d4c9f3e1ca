package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Language-model quality filtering, the counting-proxy variant —
  * CCNet/C4 score pages with a reference LM (KenLM perplexity) and
  * drop the worst tail; the engine-portable, integer-exact proxy for
  * that signal is the UNSEEN-n-gram ratio: the fraction of a
  * document's distinct word n-grams never observed in a trusted
  * reference corpus. Gibberish, boilerplate soup, and
  * wrong-language text all score high; fluent in-domain text scores
  * low. (A true LM score is a model artifact — out of scope with
  * zero egress — but the JOIN SHAPE below is exactly what scoring
  * against a corpus-derived table costs.)
  *
  * Scale shape — and the reason this is NOT q129's contamination
  * probe: a benchmark gram set is metadata-sized and broadcasts,
  * but a REFERENCE-CORPUS vocabulary is corpus-sized. So this is
  * the canonical big-big join: both sides reduce to 8-byte gram
  * HASHES (`TextHashes.wordShingleHashes`, codegen'd, distinct per
  * doc — gram text never shuffles), the reference side dedups to
  * one row per gram (partial-aggregated), and the join keys on the
  * hash. A Zipf-head gram is ONE row on the reference side joining
  * many doc rows — no row explosion, and AQE's skew split covers
  * the stragglers.
  */
object LmFilter {

  /** Per-document unseen-gram ratio against a reference corpus.
    *
    * @return (idCol, n_grams, n_unseen, unseen_ratio) — gram counts
    *         are DISTINCT grams per document (the expression dedups)
    */
  def unseenGramRatio(
      docs: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2): DataFrame = {
    import graft.functions.TextHashes.wordShingleHashes
    val refGrams = reference
      .select(explode(wordShingleHashes(col(textCol), n)).as("gram"))
      .distinct() // corpus-sized: stays distributed, never broadcast
      .withColumn("_seen", lit(1))
    docs
      .select(col(idCol), explode(wordShingleHashes(col(textCol), n)).as("gram"))
      .join(refGrams, Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("_seen").isNull, 1)).as("n_unseen"))
      .withColumn("unseen_ratio",
        F.round(col("n_unseen").cast("double") / col("n_grams"), 9))
  }
}
