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

  /** Per-document average bigram log-probability against a
    * reference corpus — one step closer to CCNet's KenLM perplexity
    * than [[unseenGramRatio]]'s binary seen/unseen: an add-one
    * smoothed bigram LM trained on the reference,
    *
    *   P(b|a) = (c_ab + 1) / (c_a + V)
    *
    * scored per bigram OCCURRENCE and averaged per document (avg
    * log-prob is negated perplexity's log; fluent in-domain text
    * scores high/close to 0, gibberish deeply negative).
    *
    * Determinism: counts are exact integers; each term is the fixed
    * chain round(ln((c_ab+1)/(c_a+V)), 6) — µ-quantized before the
    * decimal-exact per-doc total (the chi-square/entropy
    * discipline) — and the average is one closing double division.
    *
    * Scale shape: the LM "model" is two corpus-derived count tables
    * (unigrams, bigrams — vocabulary-sized, partial-aggregated);
    * scoring is two keyed hash joins on the gram string + one
    * per-doc groupBy. V is a 1-row broadcast. Documents with < 2
    * tokens have no bigrams and drop out (score undefined, stated
    * not imputed).
    */
  def bigramLogprob(
      docs: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "\\s+"), t => length(t) > 0)
    def bigrams(c: org.apache.spark.sql.Column) = {
      val t = toks(c)
      when(size(t) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(t) - 1),
          i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
    }
    // barrier: `uni` feeds BOTH the vocabulary scalar and the c_a
    // join — without the cut the reference tokenize+count runs twice
    val uni = graft.plans.Plans.barrier(
      reference.select(explode(toks(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c_a")))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = reference.select(explode(bigrams(col(textCol))).as("ab"))
      .groupBy("ab").agg(count(lit(1)).as("c_ab"))
    val term = F.round(log(
      (coalesce(col("c_ab"), lit(0L)) + lit(1)).cast("double") /
        (coalesce(col("c_a"), lit(0L)) + col("v")).cast("double")), 6)
      .cast("decimal(28,6)")
    docs.select(col(idCol), explode(bigrams(col(textCol))).as("ab"))
      .withColumn("a", split(col("ab"), " ").getItem(0))
      .join(bi, Seq("ab"), "left")
      .join(uni.withColumnRenamed("w", "a"), Seq("a"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("c_ab").isNull, 1)).as("n_unseen"),
        sum(term).as("s"))
      .select(col(idCol), col("n_bigrams"), col("n_unseen"),
        F.round(col("s").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("avg_logprob"))
  }
}
